"""Polygon measures: area, centroid, perimeter (ST_Area / ST_Centroid /
ST_Length analogs — the PostGIS measures the reference's analytics layer
has for free; e.g. area-ranked priority in its organize-areas pass,
sql/functionsProcess_31_organizeAreas_2DGrid.sql).

Semantics match the engine's polygon model (even-odd parity over an
UNORIENTED ring list — sources/synth.py rings are all CCW, holes
included): each ring's contribution sign is (-1)^depth where depth =
how many OTHER rings of the same feature enclose it. That reproduces
outer-minus-hole for simple holes and handles island-in-a-lake nesting.
Containment of a ring is decided by the parity test on one of its
vertices with the shared points_in_rings kernel (rings of one feature
never cross — repair_rings guarantees that upstream), with a vertex
nudge toward the ring's interior to avoid the on-edge convention
(points_in_rings pins on-edge = not contained).

Planar measures are in the ring's native degree coordinates (deg² /
deg). `spherical=True`: AREA integrates the sphere's cos(lat) metric
factor exactly for edges straight in lon/lat space (Green's theorem,
closed-form per edge — the right model for this engine, whose PIP and
covers treat edges as planar in lon/lat; it is NOT the great-circle
geodesic-excess formula, which would disagree exactly where the edge
models disagree). PERIMETER scales each edge's lon component by
cos(mean edge lat) — an approximation good to O(Δlat²) per edge,
documented as such.

Scale shape: the polygon DIMENSION is small (admin-0 ≈ 10³ features) —
these run driver-side over PolygonPack or per-feature on executors via
the measures_df wrapper (applyInPandas over ring rows, one group per
feature — the same per-feature parallelism the distributed prep path
uses). The 100-TB fact side never touches this code.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .geometry import points_in_rings

EARTH_R_M = 6_371_008.8  # mean Earth radius, meters (IUGG)


def _ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace over degree coords (deg²), sign = orientation."""
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return float(0.5 * np.sum(x * y2 - x2 * y))


def _ring_signed_area_sph(ring: np.ndarray) -> float:
    """Signed spherical-metric area in deg²-equivalents, EXACT for the
    engine's polygon model (edges straight in lon/lat space): Green's
    theorem with Q = x·cos(c·y) gives ∮ x cos(cy) dy = ∫∫ cos(lat) dA,
    and each straight edge integrates in closed form
    (∫ u cos(cu) du = u sin(cu)/c + cos(cu)/c²). CCW positive."""
    c = np.pi / 180.0
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    dx, dy = x2 - x1, y2 - y1
    nz = dy != 0
    safe_dy = np.where(nz, dy, 1.0)
    slope = np.where(nz, dx / safe_dy, 0.0)
    s1, s2 = np.sin(c * y1), np.sin(c * y2)
    co1, co2 = np.cos(c * y1), np.cos(c * y2)
    a = x1 - y1 * slope  # x(u) = a + slope·u along the edge
    per_edge = a * (s2 - s1) / c + slope * ((y2 * s2 - y1 * s1) / c + (co2 - co1) / c**2)
    return float(np.sum(np.where(nz, per_edge, 0.0)))


def _ring_depth(rings: list[np.ndarray]) -> np.ndarray:
    """depth[i] = #{j != i : ring j encloses ring i} (even-odd parity on
    a representative interior-nudged vertex)."""
    depth = np.zeros(len(rings), dtype=np.int64)
    for i, r in enumerate(rings):
        # nudge the test vertex toward the ring's own centroid so it
        # cannot sit ON another ring's edge at shared borders
        v = r[0]
        c = r.mean(axis=0)
        p = v + 1e-9 * (c - v)
        for j, other in enumerate(rings):
            if j != i and points_in_rings(np.array([p[0]]), np.array([p[1]]), [other])[0]:
                depth[i] += 1
    return depth


def polygon_area(rings: list[np.ndarray], spherical: bool = False) -> float:
    """Even-odd area: Σ |ring shoelace| × (-1)^depth. deg² (planar) or
    m² (spherical local-metric approximation)."""
    depth = _ring_depth(rings)
    total = 0.0
    for r, d in zip(rings, depth):
        a = abs(_ring_signed_area_sph(r) if spherical else _ring_signed_area(r))
        total += a if d % 2 == 0 else -a
    if spherical:
        k = np.pi / 180.0 * EARTH_R_M
        total *= k * k
    return total


def polygon_perimeter(rings: list[np.ndarray], spherical: bool = False) -> float:
    """Sum of ring lengths — every ring counts (holes have boundary too,
    matching ST_Perimeter). Degrees (planar) or meters (spherical
    local-metric: per-edge cos(mean lat) on the lon component)."""
    total = 0.0
    for r in rings:
        x, y = r[:, 0], r[:, 1]
        dx = np.roll(x, -1) - x
        dy = np.roll(y, -1) - y
        if spherical:
            dx = dx * np.cos(np.radians(0.5 * (y + np.roll(y, -1))))
        total += float(np.sum(np.sqrt(dx * dx + dy * dy)))
    if spherical:
        total *= np.pi / 180.0 * EARTH_R_M
    return total


def polygon_centroid(rings: list[np.ndarray]) -> tuple[float, float]:
    """Area-weighted centroid (planar, even-odd: hole mass subtracted).
    Degenerate (zero-area) features fall back to the vertex mean.

    Antimeridian-aware: when the feature's longitude extent exceeds 180°
    (a split multipolygon straddling ±180, like Wrapland), the naive
    planar mean would land on the WRONG side of the planet (two parts at
    +179 and -179 average to 0). The weighted sums are then taken in the
    [0, 360) frame and mapped back to [-180, 180). Ring DEPTHS stay in
    the ORIGINAL frame: split halves grown by a seam epsilon overlap by
    that epsilon after the shift, and a shifted-frame parity test would
    misread one half as the other's hole (zero total mass, exploding
    centroid) — in the original frame the halves are disjoint. A band
    whose VERTEX lons are only ±180 (polar cap) shifts into a ~0-width
    frame and reports lon ±180; its centroid lon is genuinely undefined,
    so any value is as canonical."""
    depth = _ring_depth(rings)
    wrap = False
    lons = np.concatenate([r[:, 0] for r in rings])
    shifted_lons = np.where(lons < 0, lons + 360.0, lons)
    if lons.max() - lons.min() > 180.0 > shifted_lons.max() - shifted_lons.min():
        wrap = True
        rings = [
            np.column_stack([np.where(r[:, 0] < 0, r[:, 0] + 360.0, r[:, 0]), r[:, 1]])
            for r in rings
        ]
    A = 0.0
    cx = 0.0
    cy = 0.0
    for r, d in zip(rings, depth):
        x, y = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x, -1), np.roll(y, -1)
        cross = x * y2 - x2 * y
        a = 0.5 * float(np.sum(cross))
        sgn = 1.0 if d % 2 == 0 else -1.0
        # ring centroid formula carries the ring's own orientation in
        # `a`; normalizing by |a| then applying the parity sign keeps
        # outer-positive / hole-negative regardless of ring winding
        if a != 0.0:
            rcx = float(np.sum((x + x2) * cross)) / (6.0 * a)
            rcy = float(np.sum((y + y2) * cross)) / (6.0 * a)
            A += sgn * abs(a)
            cx += sgn * abs(a) * rcx
            cy += sgn * abs(a) * rcy
    if A == 0.0:
        allv = np.concatenate(rings)
        cx, cy = float(allv[:, 0].mean()), float(allv[:, 1].mean())
    else:
        cx, cy = cx / A, cy / A
    if wrap and cx >= 180.0:
        cx -= 360.0
    return cx, cy


def measures_df(spark, ring_rows, spherical: bool = False):
    """Per-feature measures on executors: ring_rows is the distributed
    prep's layout (sources/polygons._RING_ROWS_SCHEMA: country_id,
    priority, name, part, ring, lons, lats) — one applyInPandas group
    per feature, so a large dimension (admin-2 worldwide) computes
    without a driver collect.
    → (country_id, area, perimeter, centroid_lon, centroid_lat)."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("country_id", T.LongType()),
            T.StructField("area", T.DoubleType()),
            T.StructField("perimeter", T.DoubleType()),
            T.StructField("centroid_lon", T.DoubleType()),
            T.StructField("centroid_lat", T.DoubleType()),
        ]
    )

    def per_feature(key, pdf):
        rings = [
            np.column_stack([np.asarray(r.lons, dtype=np.float64), np.asarray(r.lats, dtype=np.float64)])
            for r in pdf.itertuples()
        ]
        cx, cy = polygon_centroid(rings)
        return pd.DataFrame(
            {
                "country_id": [key[0]],
                "area": [polygon_area(rings, spherical=spherical)],
                "perimeter": [polygon_perimeter(rings, spherical=spherical)],
                "centroid_lon": [cx],
                "centroid_lat": [cy],
            }
        )

    return ring_rows.groupBy("country_id").applyInPandas(per_feature, schema=schema)
