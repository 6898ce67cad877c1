"""Streaming sessionization: the batch session_stats rollup as a
native Structured Streaming `session_window` aggregation.

The batch twin (operators/merge.py::sessionize / session_stats) closes
sessions with a window-function fold over the full history; a live
pipeline cannot re-sort history per batch. Spark's session_window is
the built-in stateful answer: the state store keeps one merging window
per (key, open session), events extend it while they arrive within the
gap, and the watermark both bounds state and decides when a session is
final. No applyInPandasWithState needed — this is the case where the
built-in operator genuinely expresses the semantics (contrast
streaming/stateful.py, whose trigger state machine does need the
custom fold).

Gap-tie convention: batch sessionize starts a NEW session only when
the inter-event gap is STRICTLY greater than gap_s; session_window
merges an event that lands exactly on the session end (start + gap)
into the session — the same convention (pinned empirically in
tests/test_streaming_sessions.py::test_gap_tie_convention), so the two
twins agree on every integer-second input.

Late data: events older than the watermark are dropped by the state
store. The batch twin has no watermark (it re-sorts everything), so
settled ≡ batch holds when the stream's files arrive in bounded
disorder relative to the watermark delay — the same contract the
incremental runner's guarded watermark enforces for the relational
path (streaming/incremental.py).

100-TB notes: state is one compact (start, end, count, min, max) tuple
per OPEN session per key — closed sessions leave the store at
watermark advance; the shuffle is the same hash-by-key exchange the
batch fold pays, but over each micro-batch instead of the corpus.
A skewed key costs its in-flight sessions only, never its history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_session_stats(
    spark: SparkSession,
    source_dir: str,
    schema,
    gap_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """readStream over event parquet files → per-session rollup.

    Output schema matches the batch session_stats contract:
    (key, session_start, n_events, duration_s) — session_start is the
    epoch second of the session's first event, duration the first→last
    span (NOT including the trailing gap that session_window's window
    end carries; we subtract it by aggregating min/max event time
    directly). Caller attaches sink + trigger; with
    outputMode("append") rows emit exactly once, when the watermark
    passes the session's close.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    # watermarks demand TIMESTAMP (ltz); parquet sources often carry
    # TIMESTAMP_NTZ — cast up front (stable: the session is pinned UTC,
    # same ntz→ltz convention as the batch fold's epoch cast)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    ep = F.col(ts_col).cast("long")
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), f"{gap_s} seconds"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(ep).alias("_first"),
            F.max(ep).alias("_last"),
        )
        .select(
            F.col(key_col),
            F.col("_first").alias("session_start"),
            "n_events",
            (F.col("_last") - F.col("_first")).alias("duration_s"),
        )
    )
