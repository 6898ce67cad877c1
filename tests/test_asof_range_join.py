"""as-of and range join semantics, incl. the null-value / null-key edges
that the union+window implementation must get right."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from osm_notes_ingestion_spark.operators.merge import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def test_asof_null_right_value_is_returned_not_skipped(spark):
    """A right row whose VALUE is legitimately NULL is still the latest
    row — the join must return its NULL, not an older row's value
    (DuckDB ASOF semantics)."""
    left = spark.createDataFrame([(1, _ts(3))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(1), 5), (1, _ts(2), None)], "k long, ts timestamp, v long"
    )
    got = asof_join(left, right, on="k", left_ts="ts", right_ts="ts").collect()
    assert len(got) == 1 and got[0].asof_v is None


def test_asof_null_key_never_matches(spark):
    left = spark.createDataFrame([(None, _ts(5)), (1, _ts(5))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(None, _ts(1), 9), (1, _ts(1), 7)], "k long, ts timestamp, v long"
    )
    got = {r.k: r.asof_v for r in asof_join(left, right, "k", "ts", "ts").collect()}
    assert got[1] == 7
    assert got[None] is None  # NULL = NULL must not match


def test_asof_multiple_cols_come_from_same_row(spark):
    left = spark.createDataFrame([(1, _ts(9))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(1), 10, None), (1, _ts(2), None, 20)],
        "k long, ts timestamp, a long, b long",
    )
    got = asof_join(left, right, "k", "ts", "ts", right_cols=["a", "b"]).collect()[0]
    # latest row is (a=None, b=20) — both fields from THAT row
    assert got.asof_a is None and got.asof_b == 20


def test_range_join_shared_column_names_are_disambiguated(spark):
    facts = spark.createDataFrame([(1, _ts(5))], "event_id long, ts timestamp")
    intervals = spark.createDataFrame(
        [(100, _ts(0), _ts(0), _ts(10))],
        "interval_id long, ts timestamp, w_start timestamp, w_end timestamp",
    )  # note: intervals ALSO has a 'ts' column
    got = range_join(facts, intervals, "ts", "w_start", "w_end", grain_seconds=4).collect()
    assert len(got) == 1 and got[0].event_id == 1 and got[0].interval_id == 100


def test_range_join_boundary_semantics(spark):
    """start inclusive, end exclusive."""
    facts = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(10)), (3, _ts(9))], "event_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(100, _ts(0), _ts(10))], "interval_id long, s timestamp, e timestamp"
    )
    got = sorted(
        r.event_id
        for r in range_join(facts, intervals, "ts", "s", "e", grain_seconds=3).collect()
    )
    assert got == [1, 3]


def test_asof_duplicate_right_ts_tie_break_is_deterministic(spark):
    """PINNED: among right rows sharing (key, ts), the lexicographically
    GREATEST value tuple wins — repeated runs (and different physical row
    orders) must agree."""
    left = spark.createDataFrame([(1, _ts(5))], "k long, ts timestamp")
    rows = [(1, _ts(2), 7, "b"), (1, _ts(2), 7, "a"), (1, _ts(2), 3, "z")]
    for perm in (rows, rows[::-1], [rows[1], rows[2], rows[0]]):
        right = spark.createDataFrame(perm, "k long, ts timestamp, v long, tag string").repartition(3)
        got = asof_join(left, right, "k", "ts", "ts", right_cols=["v", "tag"]).collect()[0]
        # greatest (v, tag) tuple = (7, 'b') regardless of input order
        assert (got.asof_v, got.asof_tag) == (7, "b")
