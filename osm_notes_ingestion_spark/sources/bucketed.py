"""Bucketed table layout: co-located joins without per-query shuffles.

Reference analog: Postgres clusters notes physically by its 2D-grid
zone ordering (sql/functionsProcess_31_organizeAreas_2DGrid.sql seeds a
scan order; get_country then probes locally). The Spark-native
equivalent is BUCKETING: write the fact table hash-bucketed by the join
key so every subsequent join/aggregation on that key reads pre-shuffled
data — the exchange disappears from the plan.

At 100 TB this is the difference between re-shuffling the fact table on
every downstream join (joins on `cell` / `country_id` / `doc_id` recur
constantly in this engine) and shuffling it ONCE at write time. The
same layout is what Iceberg expresses as a bucket partition transform
(`bucket(N, key)`); this module uses the Spark session catalog's
managed-table form, which works against the local warehouse dir in
tests and against a real metastore in deployment.

Caveats encoded here:
- both sides of an exchange-free join must agree on bucket count AND
  key (asserted by join_bucketed);
- spark.sql.sources.bucketing.enabled must be on (Spark default), and
  AQE leaves bucketed scans' output partitioning intact;
- bucket pruning: an equality filter on the bucket key scans 1/N of
  the files — the same effect the cell-prefix layout gives Iceberg
  min-max skipping (ARCHITECTURE.md §layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Write df as a managed table hash-bucketed (and optionally
    sorted) by key. One shuffle now; zero for every later join on key."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def join_bucketed(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
    merge_hint: bool = False,
) -> DataFrame:
    """Join two bucketed tables on their bucket key. Verifies the bucket
    specs agree (count + columns) so the join is exchange-free by
    construction, not by luck; the plan assertion lives in
    tests/test_bucketed.py.

    merge_hint forces SortMergeJoin: at real scale both sides are huge
    and the planner picks SMJ (reading bucket partitioning, zero
    exchanges) on its own, but on dim-sized test data it prefers a
    broadcast — which REINTRODUCES an exchange and ignores the bucket
    layout. The hint makes the scale plan inspectable at any size."""
    on_keys = [on] if isinstance(on, str) else list(on)

    def _spec(t: str) -> tuple[int, tuple[str, ...]]:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {t}").collect()
        info = {r["col_name"]: r["data_type"] for r in rows}
        n = int(info.get("Num Buckets", "0"))
        cols = tuple(
            c.strip().strip("`") for c in info.get("Bucket Columns", "").strip("[]").split(",") if c.strip()
        )
        return n, cols

    ln, lcols = _spec(left_table)
    rn, rcols = _spec(right_table)
    if ln == 0 or ln != rn or lcols != rcols or tuple(on_keys) != lcols:
        raise ValueError(
            f"bucket specs must match the join key: {left_table}={ln}/{lcols}, "
            f"{right_table}={rn}/{rcols}, on={on_keys}"
        )
    left = spark.table(left_table)
    right = spark.table(right_table)
    if merge_hint:
        left, right = left.hint("merge"), right.hint("merge")
    return left.join(right, on_keys, how)
