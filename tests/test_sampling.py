"""Content-stable sampling: determinism, layout-independence, exactness.

The samplers' whole value is the contract Spark's native sample lacks:
the selected set is a pure function of (row content, seed). Tests pin
that directly — same set under repartitioning, supersets across
fractions, and stratified_take ≡ "the n smallest unit hashes per
stratum" computed independently.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_notes_ingestion_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    stratified_take,
)


@pytest.fixture(scope="module")
def docs(spark):
    # 3 languages with skewed sizes (the hot-stratum case), stable keys
    return (
        spark.range(0, 3000)
        .select(
            F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
            F.when(F.col("id") % 10 < 7, "en")
            .when(F.col("id") % 10 < 9, "de")
            .otherwise("fr")
            .alias("lang"),
            (F.col("id") % 5).alias("bucket"),
        )
        .cache()
    )


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_hash_sample_layout_independent(docs):
    a = _ids(hash_sample(docs.repartition(1), "doc_id", 0.3, seed=7))
    b = _ids(hash_sample(docs.repartition(13, "lang"), "doc_id", 0.3, seed=7))
    assert a == b
    # plausible rate (binomial 3000·0.3 → ±~5σ)
    assert 750 <= len(a) <= 1050


def test_hash_sample_nested_supersets(docs):
    s10 = _ids(hash_sample(docs, "doc_id", 0.10, seed=3))
    s30 = _ids(hash_sample(docs, "doc_id", 0.30, seed=3))
    assert s10 < s30  # strict: a 10% release is inside the 30% one
    # different seed → different draw
    assert s10 != _ids(hash_sample(docs, "doc_id", 0.10, seed=4))


def test_hash_sample_idempotent(docs):
    once = hash_sample(docs, "doc_id", 0.25, seed=1)
    twice = hash_sample(once, "doc_id", 0.25, seed=1)
    assert _ids(once) == _ids(twice)


def test_hash_sample_bounds(docs):
    assert len(_ids(hash_sample(docs, "doc_id", 0.0))) == 0
    assert len(_ids(hash_sample(docs, "doc_id", 1.0))) == 3000
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)


def test_stratified_sample_rates_and_membership(docs):
    out = stratified_sample(
        docs, ["lang"], {"en": 0.1, "fr": 1.0}, key_col="doc_id", seed=11
    ).groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in out}
    assert set(got) <= {"en", "fr"}  # de absent from the dict → dropped
    assert got["fr"] == 300  # fraction 1.0 keeps the whole stratum
    assert 120 <= got["en"] <= 300  # 2100·0.1 ± 5σ


def test_stratified_sample_tuple_strata(docs):
    # de ids end in 7/8 → buckets {2,3}; ("de", 2) is a real stratum
    out = stratified_sample(
        docs,
        ["lang", "bucket"],
        {("en", 0): 1.0, ("de", 2): 1.0},
        key_col="doc_id",
        seed=2,
    )
    rows = out.select("lang", "bucket").distinct().collect()
    assert {(r.lang, r.bucket) for r in rows} == {("en", 0), ("de", 2)}


def _brute_take(docs, n, seed):
    """Independent reference: n smallest unit hashes per stratum."""
    pdf = docs.select(
        "doc_id",
        "lang",
        (F.xxhash64("doc_id", F.lit(seed)) / F.lit(float(2**64)) + F.lit(0.5)).alias("u"),
    ).toPandas()
    want = set()
    for _, grp in pdf.groupby("lang"):
        want |= set(grp.sort_values(["u", "doc_id"]).head(n)["doc_id"])
    return want


def test_stratified_take_exact_counts_and_membership(docs, spark):
    out = stratified_take(docs, ["lang"], n=50, key_col="doc_id", seed=9)
    counts = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 50, "de": 50, "fr": 50}
    assert _ids(out) == _brute_take(docs, 50, seed=9)


def test_stratified_take_small_stratum_keeps_all(docs):
    # n larger than the smallest stratum (fr = 300) → min(n, size)
    out = stratified_take(docs, ["lang"], n=400, key_col="doc_id", seed=5)
    counts = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 400, "de": 400, "fr": 300}


def test_stratified_take_fallback_is_exact(docs):
    # starve the prefilter so the undershoot fallback must engage,
    # and pin that the result is STILL the exact n-smallest-hash set
    out = stratified_take(
        docs, ["lang"], n=50, key_col="doc_id", seed=9, oversample=0.02
    )
    assert _ids(out) == _brute_take(docs, 50, seed=9)


def test_stratified_take_layout_independent(docs):
    a = _ids(stratified_take(docs.repartition(1), ["lang"], 25, "doc_id", seed=13))
    b = _ids(
        stratified_take(docs.repartition(17, "bucket"), ["lang"], 25, "doc_id", seed=13)
    )
    assert a == b


def test_stratified_sample_map_only_plan(docs):
    # the fraction-dict path must stay one filter over the scan — no
    # join, no exchange
    plan = (
        stratified_sample(docs, ["lang"], {"en": 0.5}, key_col="doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
