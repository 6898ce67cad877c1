"""ST_DWithin-style proximity join: all (point, site) pairs within a
great-circle radius — cell-prefiltered equi-join + exact haversine
refine.

Reference analog: the reference's proximity work rides PostGIS geometry
operators and the 2D grid's "closest zone" ordering
(sql/functionsProcess_31_organizeAreas_2DGrid.sql); the engine's general
form is the distance-within join — e.g. "pages geolocated within 150 km
of a datacenter/POI site list".

Scale design (the same shape as the country assign):
- the SITE side is a dimension (10²–10⁵ rows). Each site's radius disk
  is covered by geocell cells at a level matched to the radius
  (cell edge ≳ radius ⇒ the disk's bbox spans ≤ 3×3 cells); the cover
  is computed DISTRIBUTEDLY (mapInPandas over sites — no driver
  collect) and exploded to (cell, site) rows, a small table.
- the FACT side (10^12 pages) is map-only: encode the point's cell
  (JVM, whole-stage codegen), broadcast-hash-join against the cover on
  the cell id — an EQUI join, no range predicate, no cartesian, no
  fact-side shuffle — then the exact haversine ≤ radius refine runs
  JVM-side on the surviving pairs.
- longitude wrap is handled in the cover (x mod 2^level), latitude by
  clamping; skew is per-site bounded (a site's cover is ≤ 9 cells
  + the pole caps' widened lon spans).

The prefilter is a provable superset: the disk of radius r around a
site lies inside its lat/lon bbox (meridian arcs are great circles;
parallel arcs are ≥-length small circles), and the cover is every cell
intersecting that bbox — so the refine equals the exact answer.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import MAX_LEVEL, cell_col, encode_xy
from ..functions.geodesy import EARTH_RADIUS_M, haversine_m

M_PER_DEG = math.pi * EARTH_RADIUS_M / 180.0


def level_for_radius(radius_m: float) -> int:
    """Finest level whose cell EDGE (in latitude degrees) ≥ the radius,
    so a disk's bbox spans at most 2 cells per axis (3 with the grown
    margin). Clamped to [0, MAX_LEVEL]."""
    dlat = radius_m / M_PER_DEG
    lvl = int(math.floor(math.log2(180.0 / dlat))) if dlat < 180.0 else 0
    return max(0, min(lvl, MAX_LEVEL))


def site_cover(sites: DataFrame, radius_m: float, level: int | None = None) -> tuple[DataFrame, int]:
    """(cell, site_id, site_lat, site_lon) cover rows, one per cell
    intersecting each site's disk bbox. Executor-side (mapInPandas) —
    the site dimension never funnels through the driver."""
    lvl = level_for_radius(radius_m) if level is None else level
    n = 1 << lvl
    dlat = radius_m / M_PER_DEG

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_cell, out_id, out_lat, out_lon = [], [], [], []
            for sid, slat, slon in zip(pdf["site_id"], pdf["lat"], pdf["lon"]):
                lat_lo = max(slat - dlat, -90.0)
                lat_hi = min(slat + dlat, 90.0)
                # exact longitude reach at the worst (poleward) parallel
                # of the band: haversine a = sin²(Δφ/2)+cosφ₁cosφ₂sin²(Δλ/2)
                # ≥ cos²φw·sin²(Δλ/2), so dist ≤ r forces
                # sin(Δλ/2) ≤ sin(r/2R)/cosφw. (The linear Δλ≈Δφ/cosφw
                # UNDER-estimates and would miss bbox-edge pairs.)
                worst = max(abs(lat_lo), abs(lat_hi))
                s = math.sin(radius_m / (2.0 * EARTH_RADIUS_M)) / max(
                    math.cos(math.radians(worst)), 1e-12
                )
                dlon = 360.0 if s >= 1.0 else math.degrees(2.0 * math.asin(s))
                y_lo = int(np.clip(math.floor((lat_lo + 90.0) / 180.0 * n), 0, n - 1))
                y_hi = int(np.clip(math.floor((lat_hi + 90.0) / 180.0 * n), 0, n - 1))
                if dlon >= 180.0:
                    xs = np.arange(n, dtype=np.int64)
                else:
                    x_lo = math.floor((slon - dlon + 180.0) / 360.0 * n)
                    x_hi = math.floor((slon + dlon + 180.0) / 360.0 * n)
                    xs = np.arange(x_lo, x_hi + 1, dtype=np.int64) % n  # lon wrap
                    xs = np.unique(xs)
                ys = np.arange(y_lo, y_hi + 1, dtype=np.int64)
                gx, gy = np.meshgrid(xs, ys)
                cells = encode_xy(gx.ravel(), gy.ravel(), lvl)
                out_cell.append(cells)
                out_id.append(np.full(cells.shape, sid, dtype=np.int64))
                out_lat.append(np.full(cells.shape, slat))
                out_lon.append(np.full(cells.shape, slon))
            if not out_cell:
                yield pd.DataFrame({"cell": [], "site_id": [], "site_lat": [], "site_lon": []})
                continue
            yield pd.DataFrame(
                {
                    "cell": np.concatenate(out_cell),
                    "site_id": np.concatenate(out_id),
                    "site_lat": np.concatenate(out_lat),
                    "site_lon": np.concatenate(out_lon),
                }
            )

    cover = sites.select(
        F.col("site_id").cast("long"), F.col("lat").cast("double"), F.col("lon").cast("double")
    ).mapInPandas(gen, "cell long, site_id long, site_lat double, site_lon double")
    return cover, lvl


def dwithin_join(
    points: DataFrame,
    sites: DataFrame,
    radius_m: float,
    level: int | None = None,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """(id, site_id, dist_m) for every point within radius_m meters of a
    site (great-circle). A point near two sites yields two rows.
    dist_m is the exact haversine distance floored to integer meters
    (cross-engine-hashable); the ≤-radius test uses the UNfloored value.
    """
    cover, lvl = site_cover(sites, radius_m, level)
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
        cell_col(F.col(lat_col), F.col(lon_col), lvl).alias("cell"),
    )
    d = haversine_m(F.col("lat"), F.col("lon"), F.col("site_lat"), F.col("site_lon"))
    return (
        pts.join(F.broadcast(cover), "cell", "inner")
        .where(d <= F.lit(float(radius_m)))
        .select("id", "site_id", F.floor(d).cast("long").alias("dist_m"))
    )
