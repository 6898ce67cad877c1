"""Raster-tile aggregation: web-mercator z/x/y rollups of page counts.

Reference analog: the WMS render layer — wms.notes_wms point table +
GeoServer tiling + year-bucket SLD rules (sql/wms/prepareDatabase.sql:32-60,
sld/OpenNotes.sld:15-203). The engine materializes the rollup itself.

Scale design: the raw points are aggregated ONCE at the finest requested
zoom (single shuffle, map-side partial aggregation shrinks it); every
coarser zoom is derived from the finest tile table by integer shifts
(tile z−1 = sum of its 4 z children) — the multi-zoom pyramid never
touches the fact table again. At 100 TB the z-level pyramid is built
from a table of ≤ 4^z rows, which is negligible.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.mercator import tile_x_col, tile_y_col


def tile_counts(
    points: DataFrame,
    max_zoom: int,
    min_zoom: int = 0,
    lat_col: str = "lat",
    lon_col: str = "lon",
    extra_dims: tuple[str, ...] = (),
    strategy: str = "pyramid",
) -> DataFrame:
    """(z, x, y, [extra_dims...], cnt) for every zoom in [min_zoom, max_zoom].

    extra_dims: optional grouping dimensions carried through every zoom —
    the analog of the reference's year_created_at/year_closed_at buckets
    (sql/wms/prepareDatabase.sql:33-40).

    strategy:
      "pyramid"  — aggregate once at max_zoom, derive parents by integer
        shifts over the tiny tile table. Minimum shuffle volume; one
        (cheap) stage per zoom level.
      "exploded" — compute the finest tile JVM-side, explode each row to
        all requested zooms, aggregate once. ONE stage total; map-side
        partial aggregation caps the shuffle at (distinct tiles per
        partition × zooms), so it stays scale-sane. Preferred when stage
        scheduling latency dominates (interactive/small jobs).
    Both produce identical results (asserted in tests).
    """
    pts = points.where(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
    if strategy == "exploded":
        zooms = list(range(min_zoom, max_zoom + 1))
        fx = tile_x_col(F.col(lon_col), max_zoom)
        fy = tile_y_col(F.col(lat_col), max_zoom)
        exploded = pts.select(
            F.explode(F.array(*[F.lit(z) for z in zooms])).alias("z"),
            fx.alias("_x"),
            fy.alias("_y"),
            *[F.col(c) for c in extra_dims],
        ).select(
            "z",
            F.expr(f"shiftright(_x, {max_zoom} - z)").alias("x"),
            F.expr(f"shiftright(_y, {max_zoom} - z)").alias("y"),
            *extra_dims,
        )
        return exploded.groupBy("z", "x", "y", *extra_dims).agg(F.count("*").alias("cnt"))
    finest = (
        pts.select(
            F.lit(max_zoom).alias("z"),
            tile_x_col(F.col(lon_col), max_zoom).alias("x"),
            tile_y_col(F.col(lat_col), max_zoom).alias("y"),
            *[F.col(c) for c in extra_dims],
        )
        .groupBy("z", "x", "y", *extra_dims)
        .agg(F.count("*").alias("cnt"))
    )
    levels = [finest]
    cur = finest
    for z in range(max_zoom - 1, min_zoom - 1, -1):
        cur = (
            cur.select(
                F.lit(z).alias("z"),
                F.shiftright("x", 1).alias("x"),
                F.shiftright("y", 1).alias("y"),
                *[F.col(c) for c in extra_dims],
                "cnt",
            )
            .groupBy("z", "x", "y", *extra_dims)
            .agg(F.sum("cnt").alias("cnt"))
        )
        levels.append(cur)
    return reduce(DataFrame.unionByName, levels)


def check_pyramid(tiles: DataFrame) -> DataFrame:
    """Invariant check: each tile at z = sum of its 4 children at z+1.
    Returns violations (empty ⇒ consistent). Used by tests and as a
    quality gate before publishing a tile snapshot."""
    child = tiles.select(
        (F.col("z") - 1).alias("z"),
        F.shiftright("x", 1).alias("x"),
        F.shiftright("y", 1).alias("y"),
        "cnt",
    ).groupBy("z", "x", "y").agg(F.sum("cnt").alias("child_sum"))
    parent = tiles.select("z", "x", "y", "cnt")
    return (
        parent.join(child, ["z", "x", "y"], "inner")
        .where(F.col("cnt") != F.col("child_sum"))
    )


def merge_tile_counts(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental tile maintenance: published counts + a new batch's
    delta counts → updated counts (additive merge, map-side combinable).

    Reference analog: the WMS layer is kept in sync by row triggers on
    every insert/update (sql/wms/prepareDatabase.sql:104-121); set-based
    Spark replaces per-row trigger firing with one delta aggregation and
    an additive merge — at 100 TB the delta is the 15-minute batch, not
    the corpus, and the merge shuffles only tile rows (≤4^z), never
    facts. Counts of zero are dropped so retractions (negative deltas)
    can also compact the table.
    """
    dims = [c for c in existing.columns if c != "cnt"]
    return (
        existing.unionByName(delta)
        .groupBy(*dims)
        .agg(F.sum("cnt").alias("cnt"))
        .where(F.col("cnt") != 0)
    )
