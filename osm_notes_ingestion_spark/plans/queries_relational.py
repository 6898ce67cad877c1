"""Driver-gate queries: merge/dedup/status-fold/monitoring + core
relational coverage (joins, aggregations, windows, set-ops, top-k).

Reference analogs cited per query; see operators/merge.py for semantics.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.merge import (
    count_ignored_transitions,
    dedup_new_rows,
    existence_guard,
    fold_status,
    gap_stats,
    reconcile_diff,
    session_stats,
    upsert,
    users_dimension,
)

# event_type → note-event mapping (events table has click/view/purchase/
# signup/error; the state machine needs opened/closed/reopened/hidden)
_EV_MAP = {
    "signup": "opened",
    "purchase": "closed",
    "click": "reopened",
    "error": "hidden",
    "view": "commented",
}
_EV_CASE = "CASE event_type " + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in _EV_MAP.items()) + " END"


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _mapped_events(spark, sf_dir):
    ev = _events(spark, sf_dir)
    mapping = F.create_map([F.lit(x) for kv in _EV_MAP.items() for x in kv])
    return ev.select(
        F.col("user_id").alias("note_id"),
        mapping[F.col("event_type")].alias("event"),
        F.col("ts").alias("created_at"),
        F.col("event_id").alias("seq"),
    )


# ------------------------------------------------------------- status fold


_SESSION_GAP_S = 3600


def q_status_fold(spark, sf_dir):
    """Combined gate: the trigger-fold state machine (W3), its
    ignored-transition counter, AND a per-user sessionization digest —
    folded into ONE registry entry so the driver's 50-query gate cap has
    room (VERDICT r2 #2 pattern; r3 #3 asked for the session leg). All
    three operators run in full; the joins key their outputs per user.

    The session digest pins session BOUNDS and STATS, not just a count:
    per user it sums a 48-bit md5 hash of every session's
    (session_start, n_events, duration_s) triple, so moving any session
    boundary, dropping an event, or shifting a duration changes the
    gate hash. 48 bits (12 hex chars) keeps the per-user sum clear of
    int64 overflow under Spark 4 ANSI arithmetic UP TO ~2^15 (~32k)
    sessions per user — a bound, not a guarantee: past it Spark throws
    (ANSI sum overflow) while DuckDB's HUGEINT sum only wraps at the
    final BIGINT cast, so the engines fail differently. Gate corpora are
    orders of magnitude below the bound (≤ hundreds of sessions/user);
    a production digest over unbounded keys should fold with bit_xor
    or pmod instead (overflow-free on both engines)."""
    ev = _mapped_events(spark, sf_dir)
    folded = fold_status(ev, seq_col="seq").select(
        F.col("note_id").alias("user_id"), "status", "closed_at"
    )
    ignored = count_ignored_transitions(ev, seq_col="seq").select(
        F.col("note_id").alias("user_id"), "n_ignored"
    )
    sess = (
        session_stats(_events(spark, sf_dir), _SESSION_GAP_S)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(
                F.conv(
                    F.substring(
                        F.md5(
                            F.encode(
                                F.concat_ws(
                                    ":", "session_start", "n_events", "duration_s"
                                ),
                                "UTF-8",
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long")
            ).alias("sessions_md5"),
        )
    )
    # LEFT join + 0 fill: a user with no closed/reopened/hidden events
    # has no ignored-counter row, but their fold row (pure 'open') is
    # exactly the branch this gate must keep covering — an inner join
    # would silently drop it from verification (every user does have a
    # session row — any event starts a session — but the same LEFT
    # discipline applies)
    # 0-fills keep the digest columns NON-NULL: the gate tool's exact
    # int64 comparison degrades to float64 on nullable huge ints
    # (tools/check_oracles normalize()), and sessions_md5 sums exceed
    # 2^53 — a NULL would silently cost the comparison its exactness
    return (
        folded.join(ignored, "user_id", "left")
        .withColumn("n_ignored", F.coalesce(F.col("n_ignored"), F.lit(0)))
        .join(sess, "user_id", "left")
        .withColumn("n_sessions", F.coalesce(F.col("n_sessions"), F.lit(0)))
        .withColumn("sessions_md5", F.coalesce(F.col("sessions_md5"), F.lit(0)))
    )


SQL_STATUS_FOLD = f"""WITH e AS (
  SELECT user_id, event_id, ts, {_EV_CASE} AS ev FROM events
), cr AS (
  SELECT user_id,
         max(CASE WHEN ev = 'hidden' THEN event_id END) AS lh,
         max(CASE WHEN ev = 'closed' THEN event_id END) AS lc,
         max(CASE WHEN ev = 'reopened' THEN event_id END) AS lr
  FROM e GROUP BY user_id
), ce AS (
  SELECT e.user_id, min(e.event_id) AS fce
  FROM e JOIN cr USING (user_id)
  WHERE e.ev = 'closed' AND (cr.lr IS NULL OR e.event_id > cr.lr)
  GROUP BY e.user_id
), s AS (
  SELECT cr.user_id, cr.lh, cr.lc, cr.lr, ce.fce,
    CASE
      WHEN lh IS NOT NULL THEN
        CASE WHEN lr IS NULL OR lr < lh THEN 'hidden'
             WHEN lc IS NOT NULL AND lc > lr THEN 'close'
             ELSE 'open' END
      WHEN lc IS NOT NULL AND (lr IS NULL OR lc > lr) THEN 'close'
      ELSE 'open' END AS status
  FROM cr LEFT JOIN ce ON cr.user_id = ce.user_id
)
SELECT s.user_id, s.status,
       CASE WHEN s.status = 'close' THEN ec.ts
            WHEN s.status = 'hidden' THEN eh.ts END AS closed_at
FROM s
LEFT JOIN e ec ON s.status = 'close' AND ec.user_id = s.user_id AND ec.event_id = s.fce
LEFT JOIN e eh ON s.status = 'hidden' AND eh.user_id = s.user_id AND eh.event_id = s.lh"""


def q_ignored_transitions(spark, sf_dir):
    return count_ignored_transitions(_mapped_events(spark, sf_dir), seq_col="seq").select(
        F.col("note_id").alias("user_id"), "n_ignored"
    )


SQL_IGNORED_TRANSITIONS = f"""WITH e AS (
  SELECT user_id, event_id, {_EV_CASE} AS ev FROM events
), sub AS (
  SELECT user_id, event_id, ev,
         CASE WHEN ev = 'reopened' THEN 'open' ELSE 'notopen' END AS m,
         lag(CASE WHEN ev = 'reopened' THEN 'open' ELSE 'notopen' END)
           OVER (PARTITION BY user_id ORDER BY event_id) AS pm
  FROM e WHERE ev IN ('closed', 'reopened', 'hidden')
)
SELECT user_id,
       CAST(sum(CASE WHEN ev = 'hidden' THEN 0
                WHEN pm IS NULL THEN CASE WHEN ev = 'reopened' THEN 1 ELSE 0 END
                WHEN m = pm THEN 1 ELSE 0 END) AS BIGINT) AS n_ignored
FROM sub GROUP BY user_id"""


# session digest twin: identical gap/cumsum semantics as
# operators/merge.sessionize (DuckDB epoch() ROUNDS sub-second ts, so
# floor() mirrors Spark's timestamp→long truncation), hashed per session
# with the same 12-hex-char md5 prefix Spark's conv(substring(md5..))
# computes
SQL_SESSION_DIGEST = f"""WITH se AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events
), sb AS (
  SELECT user_id, ep,
         CASE WHEN lag(ep) OVER w IS NULL OR ep - lag(ep) OVER w > {_SESSION_GAP_S}
              THEN ep END AS boundary
  FROM se WINDOW w AS (PARTITION BY user_id ORDER BY ep)
), ss AS (
  SELECT user_id, ep,
         max(boundary) OVER (PARTITION BY user_id ORDER BY ep
                             ROWS UNBOUNDED PRECEDING) AS session_start
  FROM sb
), st AS (
  SELECT user_id, session_start, count(*) AS n_events,
         max(ep) - min(ep) AS duration_s
  FROM ss GROUP BY 1, 2
)
SELECT user_id, count(*) AS n_sessions,
       CAST(sum(('0x' || substr(md5(concat_ws(':', session_start, n_events,
                                              duration_s)), 1, 12))::BIGINT)
            AS BIGINT) AS sessions_md5
FROM st GROUP BY user_id"""


# combined status_fold gate = fold + ignored counter + session digest
# LEFT-joined per user (users with no c/r/h events keep their
# pure-'open' fold row)
SQL_STATUS_FOLD_FULL = f"""SELECT sf.user_id, sf.status, sf.closed_at,
       COALESCE(it.n_ignored, 0) AS n_ignored,
       COALESCE(sd.n_sessions, 0) AS n_sessions,
       COALESCE(sd.sessions_md5, 0) AS sessions_md5
FROM ({SQL_STATUS_FOLD}) sf
LEFT JOIN ({SQL_IGNORED_TRANSITIONS}) it USING (user_id)
LEFT JOIN ({SQL_SESSION_DIGEST}) sd USING (user_id)"""


# ---------------------------------------------------------- dedup / upsert


def q_asof_join(spark, sf_dir):
    """Point-in-time (as-of) join: for each probe event (id%7=0), the
    latest event (id%5=0) of the same user at-or-before its timestamp.
    The operator is the single-shuffle union+last-ignore-nulls shape —
    no inequality-join explosion; the oracle is DuckDB's native ASOF
    LEFT JOIN (>= semantics mirrored by the _side sort tie-break)."""
    from ..operators.merge import asof_join

    ev = _events(spark, sf_dir)
    left = ev.where(F.col("event_id") % 7 == 0).select("user_id", "event_id", "ts")
    right = ev.where(F.col("event_id") % 5 == 0).select(
        "user_id", F.col("event_id").alias("r_event"), "ts"
    )
    return asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts", right_cols=["r_event"]
    ).select("user_id", "event_id", "asof_r_event")


SQL_ASOF_JOIN = """SELECT l.user_id, l.event_id, r.r_event AS asof_r_event
FROM (SELECT user_id, event_id, ts FROM events WHERE event_id % 7 = 0) l
ASOF LEFT JOIN (SELECT user_id, event_id AS r_event, ts FROM events WHERE event_id % 5 = 0) r
  ON l.user_id = r.user_id AND r.ts <= l.ts"""


def q_streaming_status_fold(spark, sf_dir):
    """True stateful streaming through the gate: the status state machine
    as applyInPandasWithState, state carried across THREE ordered
    micro-batches (one file each via maxFilesPerTrigger=1), run to
    completion with AvailableNow into a memory sink. The settled result
    (max-n_events row per note) must equal the batch closed-form fold —
    which is exactly what the shared oracle states."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import Window

    from ..streaming.stateful import streaming_status_fold

    ev = _mapped_events(spark, sf_dir)
    src = tempfile.mkdtemp(prefix="stream_status_")
    # three seq-range chunks = three ordered micro-batches (ts is monotone
    # in seq per note, so range chunks respect per-note event order)
    bounds = ev.agg(F.max("seq")).collect()[0][0] or 0
    cuts = [0, bounds // 3, 2 * bounds // 3, bounds + 1]
    for i in range(3):
        tmp = tempfile.mkdtemp(prefix="chunk_")
        ev.where((F.col("seq") >= cuts[i]) & (F.col("seq") < cuts[i + 1])).coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{i:04d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (time.time() + i, time.time() + i))  # oldest-first order
    stream = streaming_status_fold(spark, src, ev.schema)
    q = (
        stream.writeStream.format("memory")
        .queryName("streaming_status_gate")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # sink is driver-resident — reclaim the temp event chunks
    shutil.rmtree(src, ignore_errors=True)
    w = Window.partitionBy("note_id").orderBy(F.desc("n_events"))
    return (
        spark.table("streaming_status_gate")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("note_id").alias("user_id"), "status", "closed_at")
    )


def q_range_join(spark, sf_dir):
    """Interval (range) join via time-grain bucketing: 60 overlapping
    18-hour windows × events, start <= ts < end — equi-join on bucket +
    exact filter (operators/merge.range_join), NOT an inequality join.
    Oracle: the plain inequality join in DuckDB."""
    from ..operators.merge import range_join

    ev = _events(spark, sf_dir).select("event_id", "ts")
    intervals = spark.range(60).select(
        F.col("id").alias("interval_id"),
        F.expr(
            "timestamp_ntz '2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, id * 12, 0, 0)"
        ).alias("w_start"),
        F.expr(
            "timestamp_ntz '2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, id * 12 + 18, 0, 0)"
        ).alias("w_end"),
    )
    return range_join(
        ev, intervals, fact_ts="ts", start_col="w_start", end_col="w_end", grain_seconds=6 * 3600
    ).select("event_id", "interval_id")


SQL_RANGE_JOIN = """SELECT e.event_id, i.interval_id
FROM events e
JOIN (
  SELECT k AS interval_id,
         TIMESTAMP '2024-01-01 00:00:00' + to_hours(k * 12) AS w_start,
         TIMESTAMP '2024-01-01 00:00:00' + to_hours(k * 12 + 18) AS w_end
  FROM (SELECT unnest(range(60)) AS k)
) i ON e.ts >= i.w_start AND e.ts < i.w_end"""


def q_dedup_new_rows(spark, sf_dir):
    """J2: sync-vs-base anti-join (base = event_id%3≠0, sync = event_id%2=0)."""
    ev = _events(spark, sf_dir)
    base = ev.where(F.col("event_id") % 3 != 0)
    sync = ev.where(F.col("event_id") % 2 == 0)
    return dedup_new_rows(sync, base, "event_id").select("event_id", "event_type")


SQL_DEDUP_NEW_ROWS = """SELECT event_id, event_type FROM events
WHERE event_id % 2 = 0
  AND event_id NOT IN (SELECT event_id FROM events WHERE event_id % 3 != 0)"""


def q_upsert(spark, sf_dir):
    """J3: merge sync (upper-cased values) into base; sync wins on conflict."""
    ev = _events(spark, sf_dir)
    base = ev.where(F.col("event_id") % 3 != 0).select("event_id", "event_type")
    sync = (
        ev.where(F.col("event_id") % 2 == 0)
        .select("event_id", F.upper("event_type").alias("event_type"))
    )
    return upsert(base, sync, "event_id")


SQL_UPSERT = """SELECT event_id,
       CASE WHEN event_id % 2 = 0 THEN upper(event_type) ELSE event_type END AS event_type
FROM events WHERE event_id % 3 != 0 OR event_id % 2 = 0"""


def q_existence_guard(spark, sf_dir):
    """J4/J9: events kept only when their user exists in the customer dim."""
    ev = _events(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("user_id")
    )
    return existence_guard(ev, cust, ["user_id"]).groupBy("user_id").agg(
        F.count("*").alias("n_events")
    )


SQL_EXISTENCE_GUARD = """SELECT user_id, count(*) AS n_events FROM events
WHERE user_id IN (SELECT c_custkey FROM customer)
GROUP BY user_id"""


def q_users_dim(spark, sf_dir):
    """A2: dedup user dimension — MIN(name analog) per user."""
    return users_dimension(_events(spark, sf_dir), "user_id", "event_type").select(
        "user_id", F.col("event_type").alias("min_event_type")
    )


SQL_USERS_DIM = """SELECT user_id, min(event_type) AS min_event_type
FROM events WHERE user_id IS NOT NULL GROUP BY user_id"""


# ------------------------------------------------------ monitoring / gaps


def q_gap_stats(spark, sf_dir):
    """J5+A4: orders with no lineitems — count, pct, sorted-id json.
    Pins BOTH listing modes: the reference-faithful full json_agg AND
    the bounded scale default (smallest 100 ids via TakeOrdered), as
    gap_ids / gap_ids_capped columns of the same row."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("note_id")
    )
    items = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("note_id")
    )
    # ONE shared anti-join for both listings (persisted via the module
    # single-slot so gate re-runs don't accumulate cached copies)
    from ..operators.merge import gap_frame

    while _GAPS_CACHE_SLOT:
        _GAPS_CACHE_SLOT.pop().unpersist(blocking=False)
    gaps = gap_frame(orders, items).persist()
    _GAPS_CACHE_SLOT.append(gaps)
    full = gap_stats(orders, items, gaps=gaps)
    capped = gap_stats(orders, items, max_ids=100, gaps=gaps).select(
        F.col("gap_ids").alias("gap_ids_capped")
    )
    return full.crossJoin(capped)


_GAPS_CACHE_SLOT: list = []


SQL_GAP_STATS = """WITH g AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
), t AS (SELECT count(DISTINCT o_orderkey) AS total FROM orders)
SELECT (SELECT count(*) FROM g) AS n_gaps,
       round((SELECT count(*) FROM g) * 100.0 / t.total, 2) AS gap_pct,
       coalesce('[' || (SELECT string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) FROM g) || ']', '[]') AS gap_ids,
       coalesce('[' || (SELECT string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
                        FROM (SELECT o_orderkey FROM g ORDER BY o_orderkey LIMIT 100)) || ']', '[]') AS gap_ids_capped
FROM t"""


def q_reconcile(spark, sf_dir):
    """O5 monitor diff: two lineages of lineitem keys, EXCEPT both ways.

    Both side rows are ALWAYS emitted (n=0 when a direction is empty) —
    the oracle's two fixed SELECT count(*) arms do the same, and a
    monitor that silently omits the clean direction reads ambiguously."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = li.where(F.col("l_orderkey") % 5 != 1).select("l_orderkey", "l_linenumber")
    b = li.where(F.col("l_orderkey") % 5 != 2).select("l_orderkey", "l_linenumber")
    counts = reconcile_diff(a, b).groupBy("side").agg(F.count("*").alias("n"))
    sides = spark.createDataFrame([("only_a",), ("only_b",)], "side string")
    return sides.join(counts, "side", "left").select(
        "side", F.coalesce("n", F.lit(0)).alias("n")
    )


SQL_RECONCILE = """WITH a AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey % 5 != 1),
b AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey % 5 != 2)
SELECT 'only_a' AS side, count(*) AS n FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
UNION ALL
SELECT 'only_b' AS side, count(*) AS n FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM a)"""


def q_watermark(spark, sf_dir):
    """A3: MAX over three streams' MAXes (union-of-max watermark calc)."""
    ev = _events(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        ev.agg(F.max("ts").alias("m"))
        .unionByName(orders.agg(F.max("o_orderdate").alias("m")))
        .unionByName(li.agg(F.max("l_shipdate").alias("m")))
        .agg(F.max("m").alias("watermark"))
    )


SQL_WATERMARK = """SELECT max(m) AS watermark FROM (
  SELECT max(ts) AS m FROM events
  UNION ALL SELECT max(o_orderdate) FROM orders
  UNION ALL SELECT max(l_shipdate) FROM lineitem)"""


# ------------------------------------------------- core relational coverage


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style aggregation (A-family coverage; DECIMAL sums for
    cross-engine exactness)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity")).alias("_sq"),
            F.sum(d("l_extendedprice")).alias("_sbp"),
            F.sum((d("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d("l_discount"))).cast("decimal(28,4)")).alias("_sdp"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sbp").cast("double").alias("sum_base_price"),
            F.col("_sdp").cast("double").alias("sum_disc_price"),
            "count_order",
        )
    )


SQL_PRICING = """SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus"""


def q_top_revenue(spark, sf_dir):
    """Q3-style join + top-k (J-family + O-family)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    rev = (d("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - d("l_discount"))).cast(
        "decimal(28,4)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .where(F.col("c_mktsegment") == "BUILDING")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


SQL_TOP_REVENUE = """SELECT l_orderkey, o_orderdate,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10"""


def q_window_rank(spark, sf_dir):
    """§2.5 window coverage: per-supplier ordering + running aggregate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn(
            "running_qty",
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double"),
        )
        .where(F.col("rn") <= 3)
        .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "running_qty")
    )


SQL_WINDOW_RANK = """SELECT l_suppkey, rn, l_orderkey, l_linenumber, running_qty FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber,
    row_number() OVER w AS rn,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
  FROM lineitem
  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
) WHERE rn <= 3"""


QUERIES: dict[str, tuple] = {
    "status_fold": (q_status_fold, SQL_STATUS_FOLD_FULL),
    "dedup_new_rows": (q_dedup_new_rows, SQL_DEDUP_NEW_ROWS),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "streaming_status_fold": (q_streaming_status_fold, SQL_STATUS_FOLD),
    "range_join": (q_range_join, SQL_RANGE_JOIN),
    "upsert": (q_upsert, SQL_UPSERT),
    "existence_guard": (q_existence_guard, SQL_EXISTENCE_GUARD),
    "users_dim": (q_users_dim, SQL_USERS_DIM),
    "gap_stats": (q_gap_stats, SQL_GAP_STATS),
    "reconcile": (q_reconcile, SQL_RECONCILE),
    "watermark": (q_watermark, SQL_WATERMARK),
    "pricing_summary": (q_pricing_summary, SQL_PRICING),
    "top_revenue": (q_top_revenue, SQL_TOP_REVENUE),
    "window_rank": (q_window_rank, SQL_WINDOW_RANK),
}
