"""knn_bulk sf0.1 verification with a SAMPLED oracle.

The full DuckDB brute-force oracle is O(|queries| x |points|) = 100k x
90k = 9e9 pairs at sf0.1 (observed: >28 GB of spill before being
killed) — infeasible as a twin. Spark's knn_df still runs over ALL 100k
queries; only the comparison is restricted to a deterministic 1-in-199
query sample (query_id % 199 == 0, ~503 queries), for which DuckDB
brute-forces exact 3-NN. Rows+values must match exactly.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as entry
from osm_notes_ingestion_spark.session import get_spark
from osm_notes_ingestion_spark.plans import queries_spatial as qsp

SF = "/root/testdata/sf0.1"
SAMPLE = 199

spark = get_spark(32, "knn_bulk_sampled")
t0 = time.monotonic()
got = (
    qsp.q_knn_bulk(spark, SF)
    .where(f"query_id % {SAMPLE} = 0")
    .toPandas()
    .sort_values(["query_id", "rank"])
    .reset_index(drop=True)
)
spark_s = time.monotonic() - t0

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
# anchor on the QUERY CTE's tail only — a bare "FROM events\n)" also
# matches the points CTE and .replace() hits every occurrence, which
# would shrink the oracle's POINT set to the sample too
sql = qsp.SQL_KNN_BULK.replace(
    "FROM events\n), d AS",
    f"FROM events WHERE event_id % {SAMPLE} = 0\n), d AS",
)
assert sql.count(f"% {SAMPLE} = 0") == 1
exp = con.sql(sql).df().sort_values(["query_id", "rank"]).reset_index(drop=True)

ok_rows = len(got) == len(exp)
merged = got.merge(exp, on=["query_id", "rank"], suffixes=("_s", "_o"))
ok_ids = (merged.id_s == merged.id_o).all()
ok_d2 = (abs(merged.d2_s - merged.d2_o) < 1e-6).all()
n_q = got.query_id.nunique()
print(
    f"knn_bulk sampled sf0.1: rows {len(got)} vs {len(exp)} match={ok_rows}, "
    f"ids match={ok_ids}, d2 match={ok_d2}, queries={n_q}, spark={spark_s:.1f}s"
)
sys.exit(0 if (ok_rows and ok_ids and ok_d2) else 1)
