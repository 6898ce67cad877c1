"""kNN: k nearest pages to each query point, via cell-ring expansion.

Generalizes the reference's "check neighboring candidates in priority
order" search pattern (get_country's zone triage,
sql/functionsProcess_21_createFunctionToGetCountry.sql:60-201) into a
k-nearest-neighbor operator. No reference counterpart exists (SURVEY §2.8),
so semantics are pinned by a brute-force oracle:

    metric: squared planar distance in integer microdegrees with
    longitude wrap — d² = dlat² + min(|dlon|, 360e6−|dlon|)²
    ties broken by ascending id (deterministic)

Scale design: queries (small) are exploded to their k-ring geocells and
broadcast; the fact table joins on its (JVM-computed) cell — map-side
pruning, one shuffle for the per-query top-k (partial top-k per
partition would apply via AQE). The ring radius doubles (driver loop)
until the k-th best distance is PROVABLY inside the ring: any point
outside Chebyshev ring r is > r·(180°/n)·1e6 µdeg away. With a
density-informed initial radius this converges in 1–2 iterations.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cells import cell_col, encode, k_ring

# ------- shared metric/bound pieces: ONE definition for both knn shapes
# (the list path and the DataFrame path are separately gate-checked, but
# their semantics must come from the same expressions)


def _wrap_d2():
    """Squared planar µdeg distance with longitude wrap (pinned metric)."""
    dlon = F.abs(F.col("plon") - F.col("qlon"))
    dlon = F.least(dlon, F.lit(360_000_000) - dlon)
    return (F.col("plat") - F.col("qlat")) * (F.col("plat") - F.col("qlat")) + dlon * dlon


def _pts_index(points, id_col, lat_col, lon_col, level):
    return points.where(F.col(lat_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.round(F.col(lat_col) * 1e6).cast("long").alias("plat"),
        F.round(F.col(lon_col) * 1e6).cast("long").alias("plon"),
        cell_col(F.col(lat_col), F.col(lon_col), level).alias("cell"),
    )


def _bound_e6(radius: float, cell_h_e6: float) -> float:
    """Provable completeness bound: any point outside Chebyshev ring r is
    farther than (r·cell_h − 1) µdeg (−1 absorbs e6 rounding)."""
    return max(radius * cell_h_e6 - 1.0, 0.0) ** 2


def _rank_w():
    return Window.partitionBy("query_id").orderBy("d2", "id")


def knn(
    spark: SparkSession,
    points: DataFrame,
    queries: list[tuple[int, float, float]],  # (query_id, lat, lon)
    k: int = 5,
    level: int = 6,
    initial_radius: int = 1,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_driver_queries: int | None = 4096,
) -> DataFrame:
    """→ (query_id, rank, id, d2) — the k nearest points per query.

    Driver-list shape for dashboard-sized query sets: ring cells are
    enumerated driver-side (numpy k_ring) and the loop costs ONE Spark
    job per radius doubling — lighter than `knn_df`'s data-driven
    machinery, which is the right tool from ~10³ queries up. Metric,
    ranking and bound are shared helpers, so the two cannot diverge.

    DRIVER-MEMORY CONTRACT: each iteration collects the ≤ k·|queries|
    top-k rows to the driver and the returned DataFrame is driver-local
    (parallelized from those rows), NOT a distributed plan over `points`.
    max_driver_queries enforces the contract explicitly — above it the
    k·|queries| materialization belongs on executors, so callers are
    directed to knn_df (same semantics, per-query radius as data).
    Pass max_driver_queries=None to opt out and accept the driver
    memory cost knowingly (pre-r4 callers with large lists got the slow
    path silently; the default now raises instead — a deliberate
    behavior change, recorded here in lieu of release notes)."""
    if max_driver_queries is not None and len(queries) > max_driver_queries:
        raise ValueError(
            f"knn(): {len(queries)} queries exceeds max_driver_queries="
            f"{max_driver_queries}; this path collects k*|queries| rows to "
            "the driver per radius iteration — use knn_df for large query "
            "sets (distributed, per-query radius carried as data)"
        )
    pts = _pts_index(points, id_col, lat_col, lon_col, level).cache()
    n = 1 << level
    cell_h_e6 = 180.0 / n * 1e6

    radius = initial_radius
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qlats = np.array([q[1] for q in queries], dtype=np.float64)
    qlons = np.array([q[2] for q in queries], dtype=np.float64)
    qcells = encode(qlats, qlons, level)

    while True:
        rows = []
        for qid, qlat, qlon, qc in zip(qids, qlats, qlons, qcells):
            for c in k_ring(int(qc), radius).tolist():
                rows.append((int(qid), int(round(qlat * 1e6)), int(round(qlon * 1e6)), c))
        qdf = spark.createDataFrame(rows, "query_id long, qlat long, qlon long, cell long")

        topk = (
            pts.join(F.broadcast(qdf), "cell", "inner")
            .withColumn("d2", _wrap_d2())
            .withColumn("rank", F.row_number().over(_rank_w()))
            .where(F.col("rank") <= k)
            .select("query_id", F.col("rank").cast("long").alias("rank"), "id", "d2")
        )
        # the result is ≤ k·|queries| rows (dashboard-sized by contract):
        # collect ONCE, check convergence driver-side, and hand back a
        # local DataFrame — one Spark job per radius doubling, instead of
        # a stats job plus a second full join when the caller executes
        # the returned plan
        rows_out = topk.collect()
        stats: dict[int, tuple[int, int]] = {}
        for r in rows_out:
            cnt, maxd2 = stats.get(r.query_id, (0, -1))
            stats[r.query_id] = (cnt + 1, max(maxd2, r.d2))
        bound = _bound_e6(radius, cell_h_e6)
        ok = all(
            qid in stats and stats[qid][0] >= k and stats[qid][1] < bound for qid in qids.tolist()
        )
        if ok or radius >= n:  # whole world covered → exact by exhaustion
            # the result is local — nothing reachable from it uses the
            # cached index, so holding it would leak for the session
            pts.unpersist(blocking=False)
            return spark.createDataFrame(rows_out, topk.schema)
        radius *= 2


def knn_df(
    spark: SparkSession,
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    level: int = 6,
    initial_radius: int = 1,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    query_id_col: str = "query_id",
    qlat_col: str = "qlat",
    qlon_col: str = "qlon",
) -> DataFrame:
    """kNN for a DATAFRAME of query points (millions-scale query sets).

    Unlike `knn` (driver-side Python list, fine for dashboard-sized query
    sets), the ring expansion here is data: each query row carries its own
    `radius`; candidate cells come from an exploded
    sequence(−radius..radius)² with JVM cell arithmetic (lon wrap via
    pmod, lat clamp by filter) — no per-query driver work. Per-query
    convergence is data too: a query freezes once its k-th best distance
    is provably inside its ring (same bound as `knn`), and only
    unconverged queries re-expand with doubled radius. The driver loop
    runs ≤ log2(2^level)+1 times and touches only one scalar (the
    remaining-query count) per iteration.

    Output: (query_id, rank, id, d2) — identical semantics/oracle as knn.

    Cache contract: the returned DataFrame is PERSISTED and fully
    materialized; every intermediate cache this function created (point
    index, per-iteration query sets and top-k partials) has already been
    released before return, so repeated invocations (bench trials, gate
    re-runs) do not accumulate session-lifetime cached data. Call
    `.unpersist()` on the result when finished with it.
    """
    pts = _pts_index(points, id_col, lat_col, lon_col, level).cache()
    n = 1 << level
    nmax = n - 1
    cell_h_e6 = 180.0 / n * 1e6

    qx = F.least(
        F.greatest(F.floor((F.col(qlon_col) + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))), F.lit(0)),
        F.lit(nmax),
    )
    qy = F.least(
        F.greatest(F.floor((F.col(qlat_col) + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))), F.lit(0)),
        F.lit(nmax),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.round(F.col(qlat_col) * 1e6).cast("long").alias("qlat"),
        F.round(F.col(qlon_col) * 1e6).cast("long").alias("qlon"),
        qx.cast("long").alias("qx"),
        qy.cast("long").alias("qy"),
        F.lit(initial_radius).cast("long").alias("radius"),
    ).cache()

    results: list[DataFrame] = []
    topk_caches: list[DataFrame] = []  # released after the final union materializes
    max_radius = initial_radius  # all per-row radii are ≤ this (they double together)
    while True:
        cand_cells = (
            q.withColumn("dx", F.explode(F.sequence(-F.col("radius"), F.col("radius"))))
            .withColumn("dy", F.explode(F.sequence(-F.col("radius"), F.col("radius"))))
            .withColumn("y", F.col("qy") + F.col("dy"))
            .where((F.col("y") >= 0) & (F.col("y") <= nmax))  # lat clamps
            .withColumn("x", F.pmod(F.col("qx") + F.col("dx"), F.lit(n)))  # lon wraps
            .select(
                "query_id",
                "qlat",
                "qlon",
                (
                    F.lit(level << 58).cast("long")
                    + F.col("y") * F.lit(1 << 29).cast("long")
                    + F.col("x")
                ).alias("cell"),
            )
        )
        if 2 * max_radius + 1 >= n:
            # pmod can alias two dx offsets to one x only once the ring
            # spans the full longitude circle — skip the dedup shuffle
            # until then
            cand_cells = cand_cells.distinct()
        topk = (
            pts.join(F.broadcast(cand_cells), "cell", "inner")
            .withColumn("d2", _wrap_d2())
            .withColumn("rank", F.row_number().over(_rank_w()))
            .where(F.col("rank") <= k)
            .select("query_id", F.col("rank").cast("long").alias("rank"), "id", "d2")
            .cache()  # ≤ k rows/query: convergence stats AND the final
            # union both read it — without the cache the expensive
            # join+window would run twice per iteration
        )
        topk_caches.append(topk)
        stats = topk.groupBy("query_id").agg(
            F.count("*").alias("_nn"), F.max("d2").alias("_maxd2")
        )
        bound = F.pow(
            F.greatest(F.col("radius") * F.lit(cell_h_e6) - F.lit(1.0), F.lit(0.0)), F.lit(2.0)
        )
        conv = q.join(stats, "query_id", "left").withColumn(
            "_ok",
            F.coalesce(
                ((F.col("_nn") >= k) & (F.col("_maxd2") < bound)) | (F.col("radius") >= n),
                F.col("radius") >= n,
            ),
        )
        done_ids = conv.where(F.col("_ok")).select("query_id")
        results.append(topk.join(F.broadcast(done_ids), "query_id", "inner"))
        prev_q = q
        q = (
            conv.where(~F.col("_ok"))
            .select("query_id", "qlat", "qlon", "qx", "qy", (F.col("radius") * 2).alias("radius"))
            .cache()
        )
        remaining = q.count()  # driver-side scalar — the loop's only collect
        # the count() above materialized the new q AND (via stats) this
        # iteration's cached topk — the superseded q is no longer needed
        # (eviction of a topk partition would just recompute through it)
        prev_q.unpersist(blocking=False)
        max_radius *= 2
        if remaining == 0:
            break

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    # materialize the bounded result (≤ k rows/query) while the loop
    # caches are still hot, then release EVERYTHING we cached — the
    # persisted `out` no longer needs the intermediates (an evicted
    # partition spills to disk rather than recomputing the joins)
    out = out.persist()
    out.count()
    pts.unpersist(blocking=False)
    q.unpersist(blocking=False)  # the final (empty) query set is still cached
    for t in topk_caches:
        t.unpersist(blocking=False)
    return out


def knn_brute_force(
    points: DataFrame,
    queries: list[tuple[int, float, float]],
    k: int = 5,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Oracle twin: exhaustive cross join. Same metric, same tie-break."""
    spark = points.sparkSession
    qdf = spark.createDataFrame(
        [(q[0], int(round(q[1] * 1e6)), int(round(q[2] * 1e6))) for q in queries],
        "query_id long, qlat long, qlon long",
    )
    pts = points.where(F.col(lat_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.round(F.col(lat_col) * 1e6).cast("long").alias("plat"),
        F.round(F.col(lon_col) * 1e6).cast("long").alias("plon"),
    )
    return (
        pts.crossJoin(F.broadcast(qdf))
        .withColumn("d2", _wrap_d2())
        .withColumn("rank", F.row_number().over(_rank_w()))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "id", "d2")
    )
