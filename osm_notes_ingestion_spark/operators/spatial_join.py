"""The core operator: point-in-polygon spatial join (country assignment).

Reference semantics (sql/functionsProcess_21_createFunctionToGetCountry.sql):
per-point loop over zone-priority-ordered candidate polygons, first
ST_Contains match wins, −1 if nothing matches (:32,223). The reference
needs 3 hours for 4.8M points on a 16-thread Postgres host
(README.md:140-142, ≈445 points/s).

Spark-first re-expression — designed so the FACT SIDE NEVER SHUFFLES:

1. encode each point's geocell JVM-side (functions/cells.cell_col);
2. broadcast-hash-join against the prepped cell→candidates table
   (sources/polygons.candidates_df) — map-side only;
3. resolve per row IN THE JVM where possible: the candidate list is
   priority-sorted, so the first `full` candidate wins unless a
   higher-priority `partial` (boundary-cell) candidate precedes it;
4. only rows with contending partial candidates enter the Arrow-batched
   exact even-odd PIP refinement UDF (a small fraction at level ≥ 8 —
   the analog of the reference's 95% fast-path hit rate,
   functionsProcess_21...sql:41-58);
5. winner = first contained candidate in (priority, country_id) order;
   −1 when no candidate contains the point.

At 100 TB this is a single map-only stage over the pages scan: no
shuffle, no skew sensitivity (hot cells cost nothing extra — broadcast
joins don't repartition by key). An explicit salted shuffle variant
(`assign_countries_partitioned`) exists for the hypothetical case where
the polygon dimension outgrows broadcast (e.g. admin-2 worldwide).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.cells import cell_col
from ..functions.geometry import PolygonPack
from ..sources.polygons import PolygonIndex, candidates_df, cover_df

NO_MATCH = -1  # reference: get_country returns -1 (…sql:32,223)


def _make_refine_udf(spark: SparkSession, pack: PolygonPack):
    """Vectorized exact-PIP refinement.

    Inputs per row: lon, lat, candidate ids (priority-sorted, only the
    contenders that could beat the best full-cell match), and the
    fallback winner. Returns the final country id. Inside: one winding
    test per (distinct polygon in batch), vectorized over all points
    that list it — never per-row Python.
    """
    bc = spark.sparkContext.broadcast(pack)

    @F.pandas_udf(T.LongType())
    def refine(lon: pd.Series, lat: pd.Series, cand_ids: pd.Series, fallback: pd.Series) -> pd.Series:
        pk: PolygonPack = bc.value
        idx_of = pk.index_of_id()
        n = len(lon)
        lons = lon.to_numpy(dtype=np.float64)
        lats = lat.to_numpy(dtype=np.float64)
        # flatten ragged candidate lists
        lens = np.fromiter((len(c) for c in cand_ids), dtype=np.int64, count=n)
        if lens.sum() == 0:
            return fallback.astype("int64")
        row_idx = np.repeat(np.arange(n), lens)
        flat_ids = np.concatenate([np.asarray(c, dtype=np.int64) for c in cand_ids if len(c)])
        pos_in_row = np.concatenate([np.arange(l) for l in lens if l])
        contained = np.zeros(len(flat_ids), dtype=bool)
        for cid in np.unique(flat_ids):
            m = flat_ids == cid
            pi = idx_of[int(cid)]
            contained[m] = pk.contains(pi, lons[row_idx[m]], lats[row_idx[m]])
        # winner: smallest position-in-row (lists are (priority,id)-sorted)
        # among contained candidates; else fallback
        best_pos = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        best_id = fallback.to_numpy(dtype=np.int64).copy()
        order = np.lexsort((pos_in_row, row_idx))
        r, p, i, c = row_idx[order], pos_in_row[order], flat_ids[order], contained[order]
        sel = c & (p < best_pos[r])
        # first contained per row (scan in sorted order; numpy: use
        # np.minimum.at for positions then map back)
        np.minimum.at(best_pos, r[sel], p[sel])
        hit = best_pos[r] == p
        take = sel & hit
        best_id[r[take]] = i[take]
        return pd.Series(best_id)

    return refine


def assign_countries(
    spark: SparkSession,
    points: DataFrame,
    index: PolygonIndex,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """points → (id, [keep_cols...], cell, country_id, n_candidates, refined).

    Rows with null lat/lon get country_id = NULL (page had no coordinates);
    rows matching no polygon get NO_MATCH (−1).
    """
    cands = candidates_df(spark, index)
    pts = points.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep_cols],
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
    ).withColumn(
        "cell",
        F.when(F.col("lat").isNotNull(), cell_col(F.col("lat"), F.col("lon"), index.level)),
    )

    joined = pts.join(F.broadcast(cands), "cell", "left")

    # JVM-side resolution over the priority-sorted candidate array:
    # best full candidate = first with full=true; contenders = partial
    # candidates strictly before it in sort order.
    full_only = F.filter(F.col("cands"), lambda c: c["full"])
    best_full = F.when(F.size(full_only) > 0, F.element_at(full_only, 1))
    fallback = F.coalesce(best_full["country_id"], F.lit(NO_MATCH))
    contenders = F.when(
        F.col("cands").isNotNull(),
        F.filter(
            F.col("cands"),
            lambda c: (~c["full"])
            & (
                F.coalesce(
                    (c["priority"] < best_full["priority"])
                    | ((c["priority"] == best_full["priority"]) & (c["country_id"] < best_full["country_id"])),
                    F.lit(True),
                )
            ),
        ),
    ).otherwise(F.array().cast("array<struct<priority:long,country_id:long,full:boolean>>"))

    resolved = (
        joined.withColumn("_fallback", fallback)
        .withColumn("_contender_ids", F.transform(contenders, lambda c: c["country_id"]))
        .withColumn("n_candidates", F.coalesce(F.size("cands"), F.lit(0)))
        .withColumn("refined", F.col("lat").isNotNull() & (F.size("_contender_ids") > 0))
    )

    # Split-refine: only rows with contending partial candidates (~4% at
    # cover level 9) enter the Arrow-batched exact-PIP branch; everyone
    # else resolves fully JVM-side. A `when(needs, refine(...))` cannot
    # short-circuit — Spark evaluates a pandas UDF over the whole batch —
    # so the split is physical: filter → refine → union. Both branches are
    # map-only (filter over the same broadcast join; union is narrow), so
    # the fact side still never shuffles. The upstream lineage runs once
    # per branch; at scale the assign input is a materialized narrow
    # table, so the extra pass is a cheap pruned scan while the Arrow
    # volume drops by the refine fraction (~25x).
    refine = _make_refine_udf(spark, index.pack)
    fast = resolved.where(~F.col("refined")).withColumn(
        "country_id",
        F.when(F.col("lat").isNull(), F.lit(None).cast("long")).otherwise(F.col("_fallback")),
    )
    slow = resolved.where(F.col("refined")).withColumn(
        "country_id",
        refine(F.col("lon"), F.col("lat"), F.col("_contender_ids"), F.col("_fallback")),
    )
    assigned = fast.unionByName(slow)

    return assigned.select("id", *keep_cols, "lat", "lon", "cell", "country_id", "n_candidates", "refined")


def assignment_metrics(assigned: DataFrame) -> DataFrame:
    """The `tries` table analog (sql/process/processPlanetNotes_25_createCountryTables.sql:125-130):
    per-country candidate/refinement statistics, as an explicit aggregation."""
    return assigned.groupBy("country_id").agg(
        F.count("*").alias("n_points"),
        F.avg("n_candidates").alias("avg_candidates"),
        F.max("n_candidates").alias("max_candidates"),
        F.sum(F.col("refined").cast("long")).alias("n_refined"),
    )


def assign_countries_partitioned(
    spark: SparkSession,
    points: DataFrame,
    index: PolygonIndex,
    salt_buckets: int = 8,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Shuffle-based variant for a polygon dimension too large to broadcast.

    Points repartition by cell; hot cells (skew — the reference's
    USA/Germany problem, sql/functionsProcess_31_organizeAreas_2DGrid.sql:26-42)
    are handled two ways: AQE skew-join splitting PLUS an explicit salt —
    the cover side is exploded ×salt_buckets so each (cell, salt) pair
    co-locates with a slice of the hot cell's points. Winner selection is
    a (priority, country_id) min-struct aggregation — partial-aggregatable,
    so map-side combine shrinks the shuffle.
    """
    cov = cover_df(spark, index).withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    pts = (
        points.select(
            F.col(id_col).alias("id"), F.col(lat_col).alias("lat"), F.col(lon_col).alias("lon")
        )
        .where(F.col("lat").isNotNull())
        .withColumn("cell", cell_col(F.col("lat"), F.col("lon"), index.level))
        .withColumn("salt", (F.pmod(F.hash("id"), F.lit(salt_buckets))).cast("int"))
    )
    cand = pts.join(cov, ["cell", "salt"], "inner")

    # same non-short-circuit hazard as the broadcast path: a
    # when(full, ...).otherwise(refine(...)) ships EVERY candidate row
    # through Arrow — split physically instead, so only partial-cell
    # candidates pay for Python
    refine = _make_refine_udf(spark, index.pack)
    full_rows = cand.where(F.col("full"))
    partial_rows = cand.where(~F.col("full")).where(
        refine(F.col("lon"), F.col("lat"), F.array(F.col("country_id")), F.lit(NO_MATCH))
        != F.lit(NO_MATCH)
    )
    checked = full_rows.unionByName(partial_rows)

    winners = checked.groupBy("id").agg(
        F.min(F.struct("priority", "country_id")).alias("w")
    ).select("id", F.col("w.country_id").alias("country_id"))

    return (
        pts.select("id", "lat", "lon", "cell")
        .join(winners, "id", "left")
        .withColumn("country_id", F.coalesce("country_id", F.lit(NO_MATCH)))
    )
