"""Polygon dimension prep: pack + quadtree cell cover (build-time).

Reference analog: boundary import + repair + the 24-zone priority grid +
GiST index (bin/lib/functionsProcess.sh:1544-2054,
sql/functionsProcess_31_organizeAreas_2DGrid.sql,
sql/process/processPlanetNotes_25_createCountryTables.sql:117-118).
Here the polygon dimension is prepped ONCE on the driver (admin-0 scale:
a few hundred polygons) into:

1. a `PolygonPack` (flat numpy arrays) broadcast to executors for exact
   PIP refinement, and
2. a cell→candidates lookup table: every geocell at the cover level maps
   to its priority-sorted candidate list [(priority, country_id, full)].
   `full=true` cells prove containment with no exact test (the quadtree
   interior), so at join time only boundary-cell points pay for Python.

The candidates table is tiny (≈10⁴–10⁶ rows × few entries) → broadcast
hash join; the 100 TB fact side never shuffles for assignment.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.cells import encode
from ..functions.geometry import PolygonPack, cover_polygon

DEFAULT_COVER_LEVEL = 9


@dataclass
class PolygonIndex:
    pack: PolygonPack
    level: int
    # parallel arrays: one row per (cell, polygon) cover entry
    cells: np.ndarray
    country_ids: np.ndarray
    priorities: np.ndarray
    fulls: np.ndarray

    @property
    def n_cover_rows(self) -> int:
        return len(self.cells)


def prep_polygons(polys: list[dict], level: int = DEFAULT_COVER_LEVEL) -> PolygonIndex:
    pack = PolygonPack.build(polys)
    cells, cids, prios, fulls = [], [], [], []
    for i, p in enumerate(polys):
        full, partial = cover_polygon(p["rings"], level)
        for arr, is_full in ((full, True), (partial, False)):
            cells.append(arr)
            cids.append(np.full(len(arr), p["country_id"], dtype=np.int64))
            prios.append(np.full(len(arr), p.get("priority", 0), dtype=np.int64))
            fulls.append(np.full(len(arr), is_full, dtype=bool))
    return PolygonIndex(
        pack=pack,
        level=level,
        cells=np.concatenate(cells) if cells else np.zeros(0, dtype=np.int64),
        country_ids=np.concatenate(cids) if cids else np.zeros(0, dtype=np.int64),
        priorities=np.concatenate(prios) if prios else np.zeros(0, dtype=np.int64),
        fulls=np.concatenate(fulls) if fulls else np.zeros(0, dtype=bool),
    )


_CAND_SCHEMA = T.StructType(
    [
        T.StructField("cell", T.LongType(), False),
        T.StructField("priority", T.LongType(), False),
        T.StructField("country_id", T.LongType(), False),
        T.StructField("full", T.BooleanType(), False),
    ]
)


def cover_df(spark: SparkSession, index: PolygonIndex) -> DataFrame:
    """Flat (cell, priority, country_id, full) cover table."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "cell": index.cells,
            "priority": index.priorities,
            "country_id": index.country_ids,
            "full": index.fulls,
        }
    )
    return spark.createDataFrame(pdf, schema=_CAND_SCHEMA)


# The candidate table is a build-time artifact (the reference preps its
# countries table + priority grid once, not per query) — memoize the
# driver-side row materialization per (session, index) so repeated
# queries in one session don't re-serialize 46k nested rows each time.
_CANDIDATES_CACHE: dict[tuple, DataFrame] = {}


def candidates_df(spark: SparkSession, index: PolygonIndex) -> DataFrame:
    """cell → priority-sorted candidate array (what gets broadcast).

    Aggregated DRIVER-SIDE with numpy (the cover is driver-resident
    already): the Spark plan then contains zero exchanges — a
    LocalTableScan straight into BroadcastExchange. A groupBy here would
    put a (tiny but pointless) shuffle into every assignment job.
    """
    import hashlib

    import numpy as np

    # content-keyed: id()-based keys can silently alias a *different*
    # polygon set after garbage collection reuses an address
    content = hashlib.md5(
        index.cells.tobytes()
        + index.country_ids.tobytes()
        + index.priorities.tobytes()
        + index.fulls.tobytes()
    ).hexdigest()
    key = (spark.sparkContext.applicationId, content, index.level)
    cached = _CANDIDATES_CACHE.get(key)
    if cached is not None:
        return cached

    order = np.lexsort((index.country_ids, index.priorities, index.cells))
    cells = index.cells[order]
    prios = index.priorities[order]
    cids = index.country_ids[order]
    fulls = index.fulls[order]
    if len(cells) == 0:
        starts = ends = np.zeros(0, dtype=np.int64)
    else:
        bounds = np.flatnonzero(np.diff(cells)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(cells)]))
    rows = [
        (
            int(cells[s]),
            [
                (int(prios[i]), int(cids[i]), bool(fulls[i]))
                for i in range(s, e)
            ],
        )
        for s, e in zip(starts, ends)
    ]
    schema = T.StructType(
        [
            T.StructField("cell", T.LongType(), False),
            T.StructField(
                "cands",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("priority", T.LongType(), False),
                            T.StructField("country_id", T.LongType(), False),
                            T.StructField("full", T.BooleanType(), False),
                        ]
                    )
                ),
                False,
            ),
        ]
    )
    df = spark.createDataFrame(rows, schema=schema)
    _CANDIDATES_CACHE[key] = df
    return df


def hot_cells(index: PolygonIndex, lat: np.ndarray, lon: np.ndarray, top_n: int = 16) -> np.ndarray:
    """Detect hot cells from a data sample — replaces the reference's
    hand-tuned USA-first/Germany-first priority columns
    (sql/functionsProcess_31_organizeAreas_2DGrid.sql:26-42) with measured
    skew. Used to pick explicit salting keys for the non-broadcast join
    path (operators/spatial_join.py::assign_countries_partitioned)."""
    c = encode(lat, lon, index.level)
    vals, counts = np.unique(c, return_counts=True)
    return vals[np.argsort(-counts)[:top_n]]
