"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check at sf0.001.
queries()      — name → callable(spark, sf_dir) -> DataFrame, one per
                 implemented operator from SURVEY.md §2.
oracle_sql()   — name → equivalent DuckDB SQL over the registered views
                 (omitted only for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osm_notes_ingestion_spark.plans.registry import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages → extract → country assignment → per-country counts
    at sf0.001 (the engine's core spatial-join path end to end)."""
    fn, _ = REGISTRY["assign_counts"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
