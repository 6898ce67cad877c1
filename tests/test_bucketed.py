"""Bucketed layout: the join-on-bucket-key plan must carry ZERO
exchanges (the 100-TB repeated-join story), and results must equal the
plain shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_notes_ingestion_spark.sources.bucketed import join_bucketed, save_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    facts = ev.select("event_id", "user_id", "event_type", "value")
    dims = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("first_ts"))
    )
    save_bucketed(facts, "b_facts", "user_id", n_buckets=8)
    save_bucketed(dims, "b_dims", "user_id", n_buckets=8)
    yield "b_facts", "b_dims"
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = join_bucketed(spark, lt, rt, "user_id", merge_hint=True)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        join_bucketed(spark, lt, rt, "user_id", merge_hint=True)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("n_events").alias("s"))
    )
    ev = spark.read.parquet(f"{SF}/events.parquet")
    facts = ev.select("event_id", "user_id", "event_type", "value")
    dims = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    want = (
        facts.join(dims, "user_id")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("n_events").alias("s"))
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_bucket_spec_mismatch_rejected(spark, bucketed_tables):
    lt, _ = bucketed_tables
    ev = spark.read.parquet(f"{SF}/events.parquet")
    save_bucketed(ev.select("event_id", "user_id"), "b_other", "user_id", n_buckets=4)
    try:
        with pytest.raises(ValueError, match="bucket specs"):
            join_bucketed(spark, lt, "b_other", "user_id")
        # joining on a non-bucket key is also rejected
        with pytest.raises(ValueError, match="bucket specs"):
            join_bucketed(spark, lt, lt, "event_id")
    finally:
        spark.sql("DROP TABLE IF EXISTS b_other")


def test_bucket_pruning_scans_single_bucket(spark, bucketed_tables):
    # autoBucketedScan drops the bucketed read when no join/agg needs
    # the distribution, which also drops bucket PRUNING — pin it off so
    # the equality-filter scan keeps the layout and reads 1/8 files
    lt, _ = bucketed_tables
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        some_uid = spark.table(lt).select("user_id").first()[0]
        scan = spark.table(lt).where(F.col("user_id") == some_uid)
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set(key, old)
