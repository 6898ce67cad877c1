"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": sec, "unit": "sec", "queries": {...}, "sf": ...,
 "pages_per_sec": ..., "cpus": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_FANOUT (default 6 → 6× pages for the flagship assign).
Every query is fully materialized through the noop sink (no collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from osm_notes_ingestion_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FANOUT = int(os.environ.get("SPARK_GRAFT_FANOUT", "6"))

BENCH_QUERIES = [
    "assign_country",
    "tiles_z4",
    "knn",
    "status_fold",
    "dedup_minhash_lsh",
    "embed_topk",
    "pricing_summary",
    "window_rank",
]


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def flagship_assign(spark, sf_dir: str, fanout: int) -> tuple[float, int]:
    """The headline: pages → fused extract+assign kernel, fanout× pages.
    (The declarative twin is timed separately as `assign_country`;
    equivalence is asserted in tests/test_fused.py.)"""
    from osm_notes_ingestion_spark.operators.fused import fused_extract_assign
    from osm_notes_ingestion_spark.sources.polygons import prep_polygons
    from osm_notes_ingestion_spark.sources.synth import pages_df, world_polygons

    pages = pages_df(spark, sf_dir, fanout=fanout)
    n_pages = pages.count()
    index = prep_polygons(world_polygons(), level=9)
    # untimed warm pass: pack broadcast + codegen + worker imports
    materialize(fused_extract_assign(spark, pages.limit(2000), index))
    t0 = time.perf_counter()
    materialize(
        fused_extract_assign(spark, pages, index).select("id", "lat", "lon", "country_id")
    )
    return time.perf_counter() - t0, n_pages


def main() -> None:
    from osm_notes_ingestion_spark.plans.registry import REGISTRY

    spark = get_spark(CPUS, "bench")
    # warm both the JVM (codegen/classloading) and the Python UDF workers
    # (fork + Arrow init) so timings measure steady-state throughput
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as pd  # noqa: F401

    def _warm(it):
        for pdf in it:
            yield pdf

    spark.range(CPUS * 4).repartition(CPUS).mapInPandas(_warm, "id long").count()

    timings: dict[str, float] = {}
    t_total0 = time.perf_counter()
    flagship_sec, n_pages = flagship_assign(spark, SF_DIR, FANOUT)
    timings["flagship_assign"] = round(flagship_sec, 3)

    for name in BENCH_QUERIES:
        fn, _sql = REGISTRY[name]
        t0 = time.perf_counter()
        materialize(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(time.perf_counter() - t_total0, 3)
    print(
        json.dumps(
            {
                "metric": "spatial_join_tiling_headline",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "pages_per_sec": round(n_pages / flagship_sec, 1),
                "n_pages": n_pages,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
