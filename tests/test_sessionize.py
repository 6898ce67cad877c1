"""Gap-based sessionization vs an exact DuckDB oracle.

No registry slot (the driver gate is pinned at its 50-row cap), so the
oracle runs here: the identical gap/cumsum semantics expressed as SQL
window functions over the same parquet, values compared exactly.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from osm_notes_ingestion_spark.operators.merge import session_stats, sessionize

SF = "/root/testdata/sf0.001"
GAP = 3600  # 1 h


def _oracle(gap_s: int) -> pd.DataFrame:
    return duckdb.sql(
        f"""
WITH e AS (
  SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM '{SF}/events.parquet'
),
b AS (
  SELECT user_id, ep,
         CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w > {gap_s}
              THEN ep END AS boundary
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep)
),
s AS (
  SELECT user_id, ep,
         max(boundary) OVER (PARTITION BY user_id ORDER BY ep
                             ROWS UNBOUNDED PRECEDING) AS session_start
  FROM b
)
SELECT user_id, session_start, count(*) AS n_events,
       max(ep) - min(ep) AS duration_s
FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""
    ).df()


def test_session_stats_matches_duckdb(spark):
    got = (
        session_stats(spark.read.parquet(f"{SF}/events.parquet"), GAP)
        .orderBy("user_id", "session_start")
        .toPandas()
    )
    want = _oracle(GAP)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"n_events": "int64", "duration_s": "int64"}),
        want.reset_index(drop=True).astype({"n_events": "int64", "duration_s": "int64"}),
        check_dtype=False,
    )


def test_sessionize_invariants(spark):
    s = sessionize(spark.read.parquet(f"{SF}/events.parquet"), GAP).cache()
    ep = F.col("ts").cast("timestamp").cast("long")
    # session_start ≤ every member ts; first member defines the id
    assert s.where(F.col("session_start") > ep).count() == 0
    # within a session, consecutive gaps never exceed GAP
    from pyspark.sql.window import Window

    w = Window.partitionBy("session_id").orderBy("ts")
    bad = (
        s.withColumn("prev", F.lag(ep).over(w))
        .where(F.col("prev").isNotNull() & (ep - F.col("prev") > GAP))
        .count()
    )
    assert bad == 0
    # across consecutive sessions of one user, the gap DOES exceed GAP
    wu = Window.partitionBy("user_id").orderBy("session_start")
    starts = s.groupBy("user_id", "session_start").agg(F.max(ep).alias("last_ep"))
    crossing = (
        starts.withColumn("prev_last", F.lag("last_ep").over(wu))
        .where(F.col("prev_last").isNotNull())
        .where(F.col("session_start") - F.col("prev_last") <= GAP)
        .count()
    )
    assert crossing == 0
    s.unpersist()


def test_sessionize_single_shuffle(spark):
    # both window expressions share one (partitionBy, orderBy) spec — the
    # lag and the running max chain as two Window operators but reuse ONE
    # exchange and ONE sort: the whole operator costs a single shuffle
    s = sessionize(spark.read.parquet(f"{SF}/events.parquet"), GAP)
    plan = s._jdf.queryExecution().executedPlan().toString()
    n_exchange = sum(
        1 for line in plan.splitlines() if "Exchange" in line and "Reused" not in line
    )
    n_sort = sum(1 for line in plan.splitlines() if line.lstrip(" +-*:").startswith("Sort "))
    assert n_exchange == 1, plan
    assert n_sort == 1, plan


def test_builtin_session_window_agrees(spark):
    # independent formulation: Spark's native session_window aggregation
    # must produce the identical (key, start, n_events) partition —
    # two different engines' formulations + the DuckDB oracle above
    # triangulate the gap semantics.
    # Caveat pinned by this deterministic dataset: session_window gaps
    # on exact (sub-second) timestamps while sessionize() gaps on floor
    # seconds; a gap in (3600.0, 3601.0) would split here and merge
    # there. No such boundary exists in the fixture (this test proves
    # it), and both conventions are self-consistent.
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sw = (
        ev.groupBy("user_id", F.session_window(F.col("ts"), f"{GAP} seconds"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").cast("timestamp").cast("long").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
        .toPandas()
    )
    ours = (
        session_stats(ev, GAP)
        .select("user_id", "session_start", "n_events")
        .orderBy("user_id", "session_start")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        sw.reset_index(drop=True), ours.reset_index(drop=True), check_dtype=False
    )
