"""Web-mercator slippy-map tile math (z/x/y), JVM-side Column expressions.

The reference delegates tiling to GeoServer over the wms.notes_wms point
table (sql/wms/prepareDatabase.sql:32-60, sld/OpenNotes.sld). Here the
rollup is materialized by the engine itself: encode each point's tile at
the finest requested zoom with built-in functions (stays in whole-stage
codegen), aggregate once, then derive every coarser zoom from the finest
tile table by integer shifts — z-1 tile = sum of its 4 z children — so
the raw data is shuffled exactly once regardless of how many zoom levels
are requested.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_MERC_LAT = 85.05112878


def tile_x_col(lon: Column, z: int) -> Column:
    n = float(1 << z)
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    return F.least(F.greatest(x, F.lit(0)), F.lit((1 << z) - 1)).cast("long")


def tile_y_col(lat: Column, z: int) -> Column:
    n = float(1 << z)
    clamped = F.least(F.greatest(lat, F.lit(-MAX_MERC_LAT)), F.lit(MAX_MERC_LAT))
    rad = F.radians(clamped)
    y = F.floor((F.lit(1.0) - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad)) / F.lit(math.pi)) / F.lit(2.0) * F.lit(n))
    return F.least(F.greatest(y, F.lit(0)), F.lit((1 << z) - 1)).cast("long")


def tile_xy_np(lat: np.ndarray, lon: np.ndarray, z: int):
    """numpy twin of the Column math — used by brute-force test oracles."""
    n = 1 << z
    x = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    clamped = np.clip(np.asarray(lat, dtype=np.float64), -MAX_MERC_LAT, MAX_MERC_LAT)
    rad = np.radians(clamped)
    y = np.floor((1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0 * n).astype(np.int64)
    return np.clip(x, 0, n - 1), np.clip(y, 0, n - 1)
