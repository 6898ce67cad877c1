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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cells import cell_col


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
) -> DataFrame:
    """→ (query_id, rank, id, d2) — the k nearest points per query.

    Driver-list convenience wrapper over `knn_df` (ONE implementation of
    the metric, ranking, and convergence bound — keeping a second copy in
    sync by hand is how the two would silently diverge)."""
    qdf = spark.createDataFrame(
        [(int(q[0]), float(q[1]), float(q[2])) for q in queries],
        "query_id long, qlat double, qlon double",
    )
    return knn_df(
        spark,
        points,
        qdf,
        k=k,
        level=level,
        initial_radius=initial_radius,
        id_col=id_col,
        lat_col=lat_col,
        lon_col=lon_col,
    )


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
    """
    pts = points.where(F.col(lat_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.round(F.col(lat_col) * 1e6).cast("long").alias("plat"),
        F.round(F.col(lon_col) * 1e6).cast("long").alias("plon"),
        cell_col(F.col(lat_col), F.col(lon_col), level).alias("cell"),
    ).cache()
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

    dlon = F.abs(F.col("plon") - F.col("qlon"))
    dlon = F.least(dlon, F.lit(360_000_000) - dlon)
    d2 = (F.col("plat") - F.col("qlat")) * (F.col("plat") - F.col("qlat")) + dlon * dlon
    w = Window.partitionBy("query_id").orderBy("d2", "id")

    results: list[DataFrame] = []
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
            .distinct()  # wrap may alias cells once 2r+1 >= n
        )
        topk = (
            pts.join(F.broadcast(cand_cells), "cell", "inner")
            .withColumn("d2", d2)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", F.col("rank").cast("long").alias("rank"), "id", "d2")
            .cache()  # ≤ k rows/query: convergence stats AND the final
            # union both read it — without the cache the expensive
            # join+window would run twice per iteration
        )
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
        if remaining == 0:
            break

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
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
    dlon = F.abs(F.col("plon") - F.col("qlon"))
    dlon = F.least(dlon, F.lit(360_000_000) - dlon)
    d2 = (F.col("plat") - F.col("qlat")) * (F.col("plat") - F.col("qlat")) + dlon * dlon
    w = Window.partitionBy("query_id").orderBy("d2", "id")
    return (
        pts.crossJoin(F.broadcast(qdf))
        .withColumn("d2", d2)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "id", "d2")
    )
