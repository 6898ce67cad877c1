"""Two-parallelism scaling evidence (north rule: efficiency ≥ 0.8 from N
to 4N). Runs the identical flagship job (pages → extract → assign →
tiles) at local[8] and local[32] in FRESH processes (fresh JVM each, no
shared state), takes the best of `trials` runs per level to damp shared-
machine noise, and writes BENCH/BASELINE.md.

Efficiency = (T_N / T_4N) / 4  — perfect scaling gives 1.0.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from osm_notes_ingestion_spark.session import get_spark
from osm_notes_ingestion_spark.sources.synth import pages_df, world_polygons
from osm_notes_ingestion_spark.sources.polygons import prep_polygons
from osm_notes_ingestion_spark.operators.fused import fused_extract_assign
from osm_notes_ingestion_spark.operators.tiles import tile_counts
from pyspark.sql import functions as F

cpus = {cpus}
spark = get_spark(cpus, f"scaling-{{cpus}}")
spark.range(1_000_000).selectExpr("sum(id)").collect()
def _warm(it):
    for pdf in it: yield pdf
spark.range(cpus * 4).repartition(cpus).mapInPandas(_warm, "id long").count()

pages = pages_df(spark, {sf_dir!r}, fanout={fanout})
n_pages = pages.count()
index = prep_polygons(world_polygons(), level=9)

# one untimed warm pass (pack broadcast, codegen, worker module imports)
fused_extract_assign(spark, pages.limit(cpus * 2000), index).write.format("noop").mode("overwrite").save()

t0 = time.perf_counter()
assigned = fused_extract_assign(spark, pages, index).select("id", "lat", "lon", "country_id")
tiles = tile_counts(assigned.where(F.col("lat").isNotNull()), max_zoom=8, min_zoom=4)
assigned.write.format("noop").mode("overwrite").save()
tiles.write.format("noop").mode("overwrite").save()
elapsed = time.perf_counter() - t0
print(json.dumps({{"cpus": cpus, "sec": elapsed, "n_pages": n_pages}}))
"""


def run_once(cpus: int, sf_dir: str, fanout: int) -> dict:
    """Pin the process tree to `cpus` cores: local[N] spawns N JVM task
    threads PLUS N Python workers, so an unpinned local[8] quietly uses
    ~16 cores — taskset makes 'N-core cluster' emulation honest."""
    code = RUN_TEMPLATE.format(repo=REPO, cpus=cpus, sf_dir=sf_dir, fanout=fanout)
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="48g")
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1800, check=True, env=env,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fanout = int(os.environ.get("SPARK_GRAFT_SCALING_FANOUT", "96"))
    trials = int(os.environ.get("SPARK_GRAFT_SCALING_TRIALS", "3"))

    results = {}
    for cpus in (8, 32):
        runs = []
        for t in range(trials):
            r = run_once(cpus, sf_dir, fanout)
            runs.append(r)
            print(f"local[{cpus}] trial {t}: {r['sec']:.2f}s ({r['n_pages']} pages)", flush=True)
        best = min(runs, key=lambda r: r["sec"])
        results[cpus] = {
            "best_sec": best["sec"],
            "all_sec": [round(r["sec"], 2) for r in runs],
            "n_pages": best["n_pages"],
            "pages_per_sec": best["n_pages"] / best["sec"],
        }

    t8, t32 = results[8]["best_sec"], results[32]["best_sec"]
    eff = (t8 / t32) / 4.0
    report = {
        "job": "pages → fused extract+assign kernel → tile pyramid z4..z8 (core-pinned: taskset 0..N-1)",
        "input": f"{results[8]['n_pages']} synthetic pages derived from {sf_dir} (fanout={fanout})",
        "local8_sec": round(t8, 2),
        "local32_sec": round(t32, 2),
        "local8_pages_per_sec": round(results[8]["pages_per_sec"], 1),
        "local32_pages_per_sec": round(results[32]["pages_per_sec"], 1),
        "scaling_efficiency_n_to_4n": round(eff, 3),
        "trials_local8_sec": results[8]["all_sec"],
        "trials_local32_sec": results[32]["all_sec"],
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling-efficiency evidence

North rule: throughput scaling efficiency ≥ 0.8 from N to 4N executors.
Sandbox evidence (per driver instruction): the IDENTICAL job run at two
local parallelism levels on the same input, fresh JVM per run, best of
{trials} trials per level (shared-machine noise damping).

**Job**: {report['job']}
**Input**: {report['input']}

| parallelism | wall-clock (best) | pages/sec | all trials (s) |
|---|---|---|---|
| local[8]  (N)  | {report['local8_sec']} s | {report['local8_pages_per_sec']} | {report['trials_local8_sec']} |
| local[32] (4N) | {report['local32_sec']} s | {report['local32_pages_per_sec']} | {report['trials_local32_sec']} |

**Scaling efficiency (T_N / T_4N) / 4 = {report['scaling_efficiency_n_to_4n']}**

Reference anchor: OSM-Notes-Ingestion assigns ~4.8M notes in 3 h on a
16-thread Postgres host ≈ 445 notes/s (README.md:140-142). This engine's
local[32] rate is {report['local32_pages_per_sec']} pages/s — including
HTML extraction, which the reference's 445/s does not include.

Generated by tools/scaling_bench.py on {report['timestamp']}.
"""
        )


if __name__ == "__main__":
    main()
