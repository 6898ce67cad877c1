"""Great-circle distance (haversine) — JVM Column + SQL twins.

The reference leans on PostGIS geometry distance operators for proximity
work (e.g. the get_country candidate ordering); the engine's kNN uses an
exact planar-µdeg metric for index pruning, and THIS module supplies the
true spherical distance for user-facing measures. Same IEEE-754
operations in the same order on both engines (the cross-engine
determinism contract established by functions/cells_alt.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.8  # IUGG mean radius


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (JVM-side, codegen-friendly)."""
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dp = F.radians(lat2 - lat1)
    dl = F.radians(lon2 - lon1)
    a = F.sin(dp / 2) * F.sin(dp / 2) + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) * F.sin(dl / 2)
    # near-antipodal rounding can push a infinitesimally above 1, making
    # asin(sqrt(a)) NaN (and ANSI casts on it throw) — clamp
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB fragment computing the identical distance (same op order)."""
    p1 = f"radians({lat1})"
    p2 = f"radians({lat2})"
    dp = f"radians({lat2} - {lat1})"
    dl = f"radians({lon2} - {lon1})"
    a = (
        f"(sin({dp} / 2) * sin({dp} / 2) + "
        f"cos({p1}) * cos({p2}) * sin({dl} / 2) * sin({dl} / 2))"
    )
    return f"(2.0 * {EARTH_RADIUS_M!r} * asin(sqrt(least({a}, 1.0))))"
