"""Embedding similarity: exact cosine top-k + near-duplicate detection.

All vector math stays JVM-side: `F.aggregate`/`F.zip_with` fold the
array<double> columns inside whole-stage codegen — no Python, no UDF.

Scale design:
- brute-force top-k: queries (small) broadcast against the corpus —
  map-side scoring, single shuffle for the per-query top-k window. This
  is the exactness baseline.
- bucketed variant (`cosine_topk_bucketed`): corpus pre-bucketed by a
  sign-random-projection sketch (SimHash over dimensions, md5-seeded
  hyperplanes ≈ LSH for cosine); queries probe only matching/adjacent
  buckets. Falls back to exact when the bucket under-fills. At 10^12
  rows the bucket column is the partition/sort key so probing prunes
  files (Iceberg min-max on bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm2(a):
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a, b):
    return _dot(a, b) / F.sqrt(_norm2(a) * _norm2(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """→ (query_id, rank, vec_id, cos6): exact top-k by cosine.

    cos6 = cosine rounded to 6 dp (cross-engine-stable); rank ordered by
    (cos6 DESC, vec_id) — fully deterministic.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).cast("array<double>").alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos6")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos6"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos6")
    )


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id_a, id_b): pairs with cosine > threshold, id_a < id_b.

    Exact all-pairs here (the oracle-checked baseline); the scale path is
    sign-sketch bucketing first (see srp_bucket) so only same-bucket
    pairs are scored.
    """
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).cast("array<double>").alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .where(cosine(F.col("va"), F.col("vb")) > threshold)
        .select("id_a", "id_b")
    )


def srp_bits_for(n_rows: int, target_bucket_rows: int = 1024, min_bits: int = 8, max_bits: int = 48) -> int:
    """Number of SRP hyperplanes so buckets hold ~target_bucket_rows:
    bits ≈ log2(n / target_bucket_rows), clamped to [min_bits, max_bits].
    Same-bucket candidate work is then Θ(n · target_bucket_rows) instead
    of the Θ(n²/2^bits) a fixed bits degrades to as n grows."""
    import math

    if n_rows <= 0:
        return min_bits
    return max(min_bits, min(max_bits, math.ceil(math.log2(max(1.0, n_rows / target_bucket_rows)))))


def embedding_near_dups_bucketed(
    corpus: DataFrame,
    threshold: float = 0.999,
    bits: int | None = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id_a, id_b): near-dup pairs via SRP bucketing — the SCALE path.

    Corpus is bucketed once by the sign-random-projection sketch; only
    SAME-BUCKET pairs are cosine-scored (equi-join on srp_bucket — no
    cartesian anywhere). At scale srp_bucket is the partition/sort
    key, so the self-join co-locates and Iceberg min-max prunes files.
    Near-identical vectors (cos > 0.999) project to the same signs unless
    one sits within rounding of a hyperplane, so recall ≈ 1 at these
    thresholds (measured in tests); precision is exactly 1 — every
    emitted pair is cosine-verified.

    SIZING (`bits` must grow with corpus size): the same-bucket self-join
    scores Θ(n²/2^bits) candidate pairs, so a FIXED bits does NOT stay
    sub-quadratic as n grows — the default bits=8 (256 buckets) is sized
    for test/gate corpora. At scale choose
    bits ≈ log2(n / target_bucket_rows) (`srp_bits_for` computes this),
    so each bucket holds ~target_bucket_rows vectors and candidate work
    is Θ(n · target_bucket_rows). Pass `bits=None` to derive it from a
    corpus count (one extra count job over the id column).
    """
    if bits is None:
        bits = srp_bits_for(corpus.select(id_col).count())
    c = srp_bucket(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")),
        vec_col="v",
        bits=bits,
    )
    a = c.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "srp_bucket")
    b = c.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "srp_bucket")
    return (
        a.join(b, "srp_bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cosine(F.col("va"), F.col("vb")) > threshold)
        .select("id_a", "id_b")
    )


def srp_bucket(df: DataFrame, vec_col: str = "embedding", bits: int = 8) -> DataFrame:
    """Sign-random-projection bucket id (LSH for cosine), md5-seeded.

    Hyperplane h_b has component w[b][i] = ±1 chosen by bit of
    md5(b:i) — deterministic, no stored model. Bucket = sign pattern.
    """
    v = F.col(vec_col).cast("array<double>")
    terms = []
    for b in range(bits):
        # w[i] = +1 if md5 bit set else −1; fold Σ w[i]*v[i]
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, i: F.when(
                    F.conv(
                        F.substring(F.md5(F.encode(F.concat(F.lit(f"{b}:"), i.cast("string")), "UTF-8")), 1, 1),
                        16,
                        10,
                    ).cast("int")
                    % 2
                    == 1,
                    x,
                ).otherwise(-x),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        terms.append(F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    bucket = terms[0]
    for t in terms[1:]:
        bucket = bucket + t
    return df.withColumn("srp_bucket", bucket.cast("long"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the clustered scale path.

    Centroids = the first `nlist` corpus vectors by id (deterministic
    sampled-centroid bootstrap; a k-means refinement would slot in here
    without changing the query path). Each corpus vector is assigned to
    its nearest centroid by (cos6 DESC, centroid_id) — ONE broadcast
    cross-score + partial-aggregatable max-struct argmax, no window sort.
    A query probes its `nprobe` nearest centroids and scores only those
    lists: at 10^12 rows `cent_id` is the partition/sort key, so a probe
    reads nprobe/nlist of the corpus (Iceberg min-max file pruning), and
    the candidate join is an equi join on cent_id.

    Deterministic end to end (round-6 cosine, id tie-breaks) — the SQL
    oracle mirrors the algorithm exactly. Output schema = cosine_topk.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))
    # centroid bootstrap: the first nlist corpus vectors BY ID ORDER (not
    # `id < nlist`, which silently under-fills on sparse/offset id spaces)
    cents = (
        c.orderBy("vec_id")
        .limit(nlist)
        .select(F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"))
    )
    # corpus → nearest centroid: argmax via max(struct) — map-side combinable
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            F.struct(
                F.round(cosine(F.col("v"), F.col("cv")), 6).alias("cos6"),
                (-F.col("cent_id")).alias("neg_cent"),
            ).alias("m"),
        )
        .groupBy("vec_id")
        .agg(F.max("m").alias("m"))
        .select("vec_id", (-F.col("m.neg_cent")).alias("cent_id"))
        .join(c, "vec_id")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).cast("array<double>").alias("qv")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos6"), "cent_id")
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "cent_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("ccos6"))
        .withColumn("prank", F.row_number().over(wq))
        .where(F.col("prank") <= nprobe)
        .select("query_id", "qv", "cent_id")
    )
    cand = assigned.join(F.broadcast(probes), "cent_id").select(
        "query_id", "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos6")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos6"), "vec_id")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos6")
    )


def cosine_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    hamming_radius: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Approximate top-k: probe only SRP buckets within `hamming_radius`
    of the query's bucket, then exact cosine on the candidates.

    The scale path: corpus is bucketed once (srp_bucket as partition/sort
    key → Iceberg min-max file pruning); a probe touches ~Σ C(bits,i)
    of 2^bits buckets. Approximate — recall measured in tests; raise
    hamming_radius (or fall back to cosine_topk) when recall matters more
    than cost. Output schema matches cosine_topk.
    """
    c = srp_bucket(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")),
        vec_col="v",
        bits=bits,
    )
    q = srp_bucket(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).cast("array<double>").alias("qv"),
        ),
        vec_col="qv",
        bits=bits,
    ).withColumnRenamed("srp_bucket", "qbucket")

    # Per-QUERY hamming-ball expansion: the driver holds only the
    # Σ C(bits, r≤hamming_radius) XOR masks (137 rows at bits=16, r=2 —
    # size is polynomial in bits, NOT 2^bits), and each query's probe
    # buckets are computed JVM-side as qbucket ^ mask. Enumerating the
    # full (qbucket → probe) table per bucket-universe — the previous
    # form — was 2^bits × Σ C(bits,r) driver rows, impossible at the
    # corpus-scaled bits≳20 this scale path targets.
    spark = corpus.sparkSession
    import functools
    import itertools

    masks = sorted(
        {
            functools.reduce(lambda a, f: a ^ (1 << f), flips, 0)
            for r in range(hamming_radius + 1)
            for flips in itertools.combinations(range(bits), r)
        }
    )
    mask_df = spark.createDataFrame([(m,) for m in masks], "mask long")

    cand = (
        q.crossJoin(F.broadcast(mask_df))
        .withColumn("srp_bucket", F.col("qbucket").bitwiseXOR(F.col("mask")))
        .join(c, "srp_bucket")
        .select("query_id", "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos6"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos6"), "vec_id")
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos6")
    )
