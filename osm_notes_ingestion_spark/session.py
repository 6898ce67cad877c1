"""SparkSession factory tuned for this engine.

Local-mode settings mirror what a 1000-executor cluster deployment would
set cluster-wide: AQE on (runtime re-plan + skew-join splitting),
Arrow enabled (all our Python UDFs are Arrow-batched), UTC session time,
shuffle partitions sized to the parallelism level rather than the 200
default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "osm_notes_ingestion_spark",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    parallelism=None → local[*]. Shuffle partitions track parallelism so
    local benches don't drown in tiny tasks; on a real cluster this is
    replaced by AQE coalescing from an intentionally-high initial value.
    """
    cpus = parallelism or os.cpu_count() or 8
    builder = (
        SparkSession.builder.master(f"local[{parallelism or '*'}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
