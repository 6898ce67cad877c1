"""Incremental merge semantics: dedup, upsert, status fold, watermark.

Reference analogs:
- J2 dedup anti-join: EXCEPT-based new-vs-existing
  (sql/process/processPlanetNotes_43_removeDuplicates.sql:24-30)
- J3 upsert: INSERT ... ON CONFLICT DO UPDATE
  (sql/process/processPlanetNotes_43_moveSyncToMain.sql:10-19)
- J4 existence guard: text comments must have a parent comment
  (same file :66-74)
- J5 anti-join gap detection + A4 gap stats
  (sql/process/processAPINotes_34_updateLastValues.sql:28-64)
- A2 user-dimension dedup (MIN(username) GROUP BY id_user, :31-36)
- A3 guarded watermark advance: MAX over streams, REFUSED when the
  integrity gap exceeds threshold (processAPINotes_34:92-124)
- §2.5 status fold: the update_note() trigger state machine
  (processPlanetNotes_22_createBaseTables_tables.sql:249-347)

Status-fold closed form (proof in fold_status docstring): the trigger's
sequential per-event fold collapses to window aggregates — O(1) passes,
no recursion, no per-row Python — because invalid transitions are
ignored (re-close while closed, re-open while open) and `hidden` is
always accepted from any state (the trigger's ELSE branch covers both
'close' and 'hidden', so hidden behaves like close for transition
purposes: a later 'reopened' re-opens a hidden note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_new_rows(sync: DataFrame, base: DataFrame, key: str | list[str]) -> DataFrame:
    """J2: rows in sync whose key is absent from base (left_anti)."""
    keys = [key] if isinstance(key, str) else list(key)
    return sync.join(base.select(*keys).distinct(), keys, "left_anti")


def upsert(base: DataFrame, sync: DataFrame, key: str | list[str]) -> DataFrame:
    """J3 as a batch expression: sync wins on conflict, base rows survive.

    (On an Iceberg deployment this is `MERGE INTO`; the parquet-fallback
    engine expresses the same result relationally: full outer on the key,
    per-column coalesce(sync, base).)
    """
    keys = [key] if isinstance(key, str) else list(key)
    cols = base.columns
    s = sync.select(*cols)
    joined = base.alias("b").join(s.alias("s"), keys, "full_outer")
    out_cols = [
        F.coalesce(F.col(f"s.{c}"), F.col(f"b.{c}")).alias(c) if c not in keys else F.col(c)
        for c in cols
    ]
    return joined.select(*out_cols)


def existence_guard(child: DataFrame, parent: DataFrame, keys: list[str]) -> DataFrame:
    """J4: keep child rows whose (keys) exist in parent (left_semi)."""
    return child.join(parent.select(*keys).distinct(), keys, "left_semi")


def users_dimension(comments: DataFrame, user_col: str = "user_id", name_col: str = "username") -> DataFrame:
    """A2: deduped user dimension, MIN(name) per id."""
    return (
        comments.where(F.col(user_col).isNotNull())
        .groupBy(user_col)
        .agg(F.min(name_col).alias(name_col))
    )


def fold_status(
    events: DataFrame,
    entity_col: str = "note_id",
    event_col: str = "event",
    ts_col: str = "created_at",
    seq_col: str | None = None,
) -> DataFrame:
    """→ (entity, status ∈ {open, close, hidden}, closed_at) per entity.

    Closed form of the reference trigger's sequential fold. Let H = last
    'hidden' event, C = last 'closed', R = last 'reopened' (by event
    order). Then:

      no hidden events:
          status = 'close' if C is after R (a closed is the last c/r
          event — whether that particular closed was 'valid' or ignored,
          the state at that point is close either way) else 'open'.
      hidden events exist:
          events after H: a 'closed' is IGNORED until a 'reopened'
          re-opens the note. So if no reopened after H → 'hidden';
          else status = 'open' if R after C else 'close'.

      closed_at: ts(H) if hidden (hidden-on-hidden re-stamps closed_at —
      trigger ELSE branch), NULL if open; if close, the ts of the first
      EFFECTIVE closed — i.e. the first 'closed' after the last
      'reopened' (a double-close keeps the FIRST close's timestamp, the
      ignored re-close does not re-stamp: reference fixture double_close).

    Equivalence with the sequential trigger is property-tested against a
    literal fold in tests/test_status_fold.py.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    # event position: rank within entity by (ts, seq); use a struct max
    pos = F.struct(*order)
    e = F.col(event_col)
    wq = Window.partitionBy(entity_col)
    events = events.withColumn("_lastr", F.max(F.when(e == "reopened", pos)).over(wq))
    agg = events.groupBy(entity_col).agg(
        F.max(F.when(e == "hidden", pos)).alias("_h"),
        F.max(F.when(e == "closed", pos)).alias("_c"),
        F.max(F.when(e == "reopened", pos)).alias("_r"),
        F.min(
            F.when((e == "closed") & (F.col("_lastr").isNull() | (pos > F.col("_lastr"))), pos)
        ).alias("_ce"),
    )
    h, c, r = F.col("_h"), F.col("_c"), F.col("_r")
    after = lambda a, b: b.isNull() | (a > b)  # noqa: E731  (a exists and is after b)
    status = (
        F.when(
            h.isNotNull(),
            F.when(r.isNull() | (r < h), F.lit("hidden"))
            .when(c.isNotNull() & (c > r), F.lit("close"))
            .otherwise(F.lit("open")),
        )
        .when(c.isNotNull() & after(c, r), F.lit("close"))
        .otherwise(F.lit("open"))
    )
    closed_at = (
        F.when(status == "close", F.col("_ce")[ts_col])
        .when(status == "hidden", h[ts_col])
        .otherwise(F.lit(None))
    )
    return agg.select(
        F.col(entity_col),
        status.alias("status"),
        closed_at.alias("closed_at"),
    )


def count_ignored_transitions(
    events: DataFrame,
    entity_col: str = "note_id",
    event_col: str = "event",
    ts_col: str = "created_at",
    seq_col: str | None = None,
) -> DataFrame:
    """The trigger's 'WARNING: ignoring invalid transition' log, as data.

    An event is ignored iff it repeats the current macro-state:
    'closed' while not open, 'reopened' while open. Computed with a
    window over the c/r/h subsequence: macro-state before event i is
    determined by the previous effective event; with hidden ≡ not-open
    the macro state flips exactly on: closed (open→not-open),
    reopened (not-open→open), hidden (→not-open). A closed/reopened is
    effective iff it differs from the running state; equivalently, a
    'closed' is ignored iff the previous state-changing event was
    closed/hidden, and a 'reopened' is ignored iff the previous
    state-changing event was reopened or none.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    sub = events.where(F.col(event_col).isin("closed", "reopened", "hidden"))
    # run-compress closed/reopened: an event is ignored iff it equals the
    # previous non-hidden-normalized state. Track state after each event:
    # closed→'close', hidden→'close' (macro not-open), reopened→'open'.
    macro = F.when(F.col(event_col) == "reopened", "open").otherwise("notopen")
    sub = sub.withColumn("_m", macro).withColumn("_pm", F.lag("_m").over(w))
    ignored = (
        F.when((F.col(event_col) == "hidden"), F.lit(False))  # hidden always valid
        .when(F.col("_pm").isNull(), F.col(event_col) == "reopened")  # start = open
        .otherwise(F.col("_m") == F.col("_pm"))
    )
    return (
        sub.withColumn("_ignored", ignored)
        .groupBy(entity_col)
        .agg(F.sum(F.col("_ignored").cast("long")).alias("n_ignored"))
    )


def gap_frame(notes: DataFrame, comments: DataFrame, note_key: str = "note_id") -> DataFrame:
    """The gap set itself: notes with no comments (anti-join)."""
    return notes.join(comments.select(note_key).distinct(), note_key, "left_anti")


def gap_stats(
    notes: DataFrame,
    comments: DataFrame,
    note_key: str = "note_id",
    max_ids: int | None = None,
    gaps: DataFrame | None = None,
) -> DataFrame:
    """J5+A4: notes with no comments — count, percentage, sorted id list
    (json_agg analog: to_json(sort_array(collect_list()))).

    `max_ids` is the SCALE default (recommended: a few thousand): the
    reference's json_agg materializes every gap id into one string
    (processAPINotes_34_updateLastValues.sql:55-64) — faithful, but
    unbounded if the gap is ever large. With max_ids set, the listing is
    the SMALLEST max_ids ids (deterministic TakeOrdered — bounded driver
    and row size, never a full collect_list) while n_gaps/gap_pct stay
    exact. max_ids=None keeps the reference-faithful full listing.

    `gaps`: pass a (possibly persisted) gap_frame() to share the
    anti-join across several gap_stats calls on the same inputs.
    """
    if gaps is None:
        gaps = gap_frame(notes, comments, note_key)
    total = notes.select(F.countDistinct(note_key).alias("_t"))
    counts = gaps.agg(F.countDistinct(note_key).alias("n_gaps"))
    if max_ids is None:
        listed = gaps.agg(
            F.to_json(F.sort_array(F.collect_list(note_key))).alias("gap_ids")
        )
    else:
        # bound BEFORE the aggregation: orderBy+limit plans as
        # TakeOrdered (per-partition top-k then merge), so the listing
        # never materializes the full gap set anywhere. Null keys (never
        # listed — collect_list drops them, as does the full branch)
        # are filtered BEFORE the limit so they cannot consume slots
        # (Spark sorts NULLS FIRST: a null-heavy gap set would otherwise
        # return fewer than max_ids real ids)
        listed = (
            gaps.select(note_key)
            .where(F.col(note_key).isNotNull())
            .orderBy(note_key)
            .limit(max_ids)
            .agg(F.to_json(F.sort_array(F.collect_list(note_key))).alias("gap_ids"))
        )
    return counts.crossJoin(listed).crossJoin(total).select(
        "n_gaps",
        F.round(F.col("n_gaps") * 100.0 / F.col("_t"), 2).alias("gap_pct"),
        "gap_ids",
    )


def guarded_watermark(
    current_watermark,  # timestamp or None
    candidates: list[DataFrame],
    ts_cols: list[str],
    gap_pct: float,
    max_gap_pct: float = 5.0,
):
    """A3: new watermark = MAX over the streams' MAX(ts) — but the advance
    is REFUSED (returns current) when the integrity gap exceeds the
    threshold (processAPINotes_34_updateLastValues.sql:92-124)."""
    if gap_pct > max_gap_pct:
        return current_watermark, False
    maxes = [df.agg(F.max(c).alias("m")).collect()[0].m for df, c in zip(candidates, ts_cols)]
    maxes = [m for m in maxes if m is not None]
    if current_watermark is not None:
        maxes.append(current_watermark)
    return (max(maxes) if maxes else None), True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """As-of join: for each left row, the LATEST right row with
    right_ts <= left_ts within the same `on` key (time-series
    point-in-time lookup; the generalization of the reference's
    "status as of" trigger reads).

    Scale shape: NOT a range join (no inequality-join explosion). Both
    sides union into one stream tagged by side, sorted per key by
    (ts, side) — right rows sort BEFORE left rows at equal ts so a
    same-timestamp right row is visible — then each left row picks up
    the running `last(right value, ignorenulls)` window. ONE shuffle on
    the key, no matter how skewed the timestamp distribution is.

    Tie-break convention (PINNED): among right rows sharing the same
    (key, right_ts), the row with the lexicographically GREATEST value
    tuple (field order = right_cols order, nulls first) wins — the sort
    adds `_rrow` as the final ordering term, so the winner is
    deterministic for valid inputs instead of whichever physical row the
    shuffle happened to deliver last. Consequence: right value columns
    must be orderable types (no map<> columns in right_cols).
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    reserved = {"_ts", "_side", "_rrow", "_asof"} | {f"asof_{c}" for c in rcols}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join reserved column names in input: {sorted(clash)}")
    # a NULL right_ts never satisfies r.ts <= l.ts — drop those rows up
    # front (nulls-first ordering would otherwise make them look EARLIEST
    # and leak into every pickup)
    right = right.where(F.col(right_ts).isNotNull())
    # right rows carry their values inside ONE struct (non-null even when
    # every field is null) so last(ignorenulls) picks the latest right
    # ROW — a right row whose value is legitimately NULL must yield NULL,
    # not fall through to an older row, and multiple right_cols must all
    # come from the SAME row
    rstruct_type = (
        "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in rcols) + ">"
    )
    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts)).select(
        on,
        "_ts",
        "_side",
        F.lit(None).cast(rstruct_type).alias("_rrow"),
        *[c for c in left.columns if c != on],
    )
    r_tag = right.select(
        on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in rcols]).alias("_rrow"),
    )
    from pyspark.sql import Window

    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        # "_rrow" last = deterministic tie-break among right rows sharing
        # (key, ts): greatest value-struct wins (left rows all carry NULL
        # _rrow, which sorts first and never reorders them vs right rows
        # because _side already separates the sides)
        .orderBy("_ts", "_side", "_rrow")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn("_asof", F.last("_rrow", ignorenulls=True).over(w))
    # join semantics: a NULL key never matches (the window would lump all
    # null-keyed rows into one partition) — mask the pickup for null keys
    key_ok = F.col(on).isNotNull()
    out = filled.where(F.col("_side") == 1).select(
        on,
        *[c for c in left.columns if c != on],
        *[
            F.when(key_ok, F.col(f"_asof.{c}")).alias(f"asof_{c}")
            for c in rcols
        ],
    )
    return out


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start_col: str,
    end_col: str,
    grain_seconds: int = 86400,
) -> DataFrame:
    """Interval join: fact rows × intervals with start <= ts < end —
    WITHOUT the inequality-join explosion.

    Scale shape (same idea as the polygon cell cover): each interval
    explodes to the time-grain buckets it covers (sequence over epoch
    buckets — intervals are the SMALL side, so the explode is cheap);
    facts compute their bucket JVM-side; the join is an EQUI join on
    bucket followed by the exact range filter. A fact meets an interval
    in exactly ONE bucket (its own), so no dedup is needed. Catalyst
    would otherwise plan ts-inequality joins as BroadcastNestedLoopJoin —
    O(|facts|·|intervals|) — which this shape reduces to
    O(|facts| + Σ interval_len/grain). Pick grain ≈ median interval
    length; AQE handles bucket skew.
    """
    # epoch seconds: ntz → ltz (session is pinned UTC) → long; Spark
    # refuses a direct ntz→bigint cast
    def _epoch(c):
        return F.col(c).cast("timestamp").cast("long")

    g = F.lit(grain_seconds).cast("long")
    # interval columns that clash with fact column names get an _iv_
    # prefix (except the range bounds, renamed explicitly) so the exact
    # filter below is never ambiguous
    clashes = (set(intervals.columns) & set(facts.columns)) | {start_col, end_col}
    iv_cols = [
        F.col(c).alias(f"_iv_{c}") if c in clashes else F.col(c) for c in intervals.columns
    ]
    iv = intervals.select(*iv_cols).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(_epoch(f"_iv_{start_col}") / g).cast("long"),
                F.floor(_epoch(f"_iv_{end_col}") / g).cast("long"),
            )
        ),
    )
    f = facts.withColumn("_bucket", F.floor(_epoch(fact_ts) / g).cast("long"))
    return (
        f.join(iv, "_bucket")
        .where(
            (F.col(fact_ts) >= F.col(f"_iv_{start_col}"))
            & (F.col(fact_ts) < F.col(f"_iv_{end_col}"))
        )
        .drop("_bucket")
        .withColumnsRenamed(
            {
                f"_iv_{c}": c
                for c in (start_col, end_col)
                if c not in facts.columns  # keep the prefix if it would clash
            }
        )
    )


def reconcile_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """O5 monitor: symmetric EXCEPT diff of two lineages
    (sql/monitor/notesCheckVerifier-report.sql:41-120). Returns rows with
    a 'side' column: 'only_a' / 'only_b'."""
    only_a = a.exceptAll(b).withColumn("side", F.lit("only_a"))
    only_b = b.exceptAll(a).withColumn("side", F.lit("only_b"))
    return only_a.unionByName(only_b)


def sessionize(
    events: DataFrame,
    gap_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization: rows of one key whose timestamps are
    within gap_s seconds of the previous row share a session.

    Reference analog: the reference never sessionizes (notes have
    explicit open/close lifecycles — fold_status above); a web-crawl
    fact table needs the implicit form — e.g. grouping a crawler's
    per-host fetch bursts or a user's activity bursts.

    Session id = (key, epoch seconds of the session's FIRST event) —
    deterministic, collision-free per key, and meaningful (the session
    start time) rather than an opaque monotonic id.

    Scale: ONE shuffle (hash by key for the window sort). The boundary
    flag (gap > gap_s → new session) and the running session-start
    (max-over-boundary-starts) are window functions over the same
    (partitionBy key, orderBy ts) spec: they chain as two Window
    operators (the max consumes the lag) but share ONE exchange and ONE
    sort — asserted in tests/test_sessionize.py. Skewed keys: a key's whole history must sort
    together — for a pathological single-key table, pre-split by time
    range and stitch sessions crossing the cut (the asof_join pattern);
    not needed for web corpora where keys are hosts/users.

    Late/duplicate timestamps: ties order by ts only — rows with equal
    (key, ts) always land in the same session, so intra-tie order is
    irrelevant (same convention as fold_status's stable ordering).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    # ntz → ltz (session pinned UTC) → long; Spark refuses ntz→bigint
    ep = F.col(ts_col).cast("timestamp").cast("long")
    prev = F.lag(ep).over(w)
    is_new = F.when(prev.isNull() | (ep - prev > gap_s), ep)
    # running max of boundary starts = this row's session start (every
    # boundary starts a strictly-later session, so max == latest)
    start = F.max(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return events.withColumn("session_start", start).withColumn(
        "session_id",
        F.concat_ws(":", F.col(key_col).cast("string"), F.col("session_start").cast("string")),
    )


def session_stats(
    events: DataFrame,
    gap_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup of sessionize(): (key, session_start,
    n_events, duration_s). Map-side combinable aggregation on the
    already-key-partitioned sessionized frame — AQE sees the window
    stage's hash partitioning, so no second shuffle is needed."""
    s = sessionize(events, gap_s, key_col, ts_col)
    ep = F.col(ts_col).cast("timestamp").cast("long")
    return (
        s.groupBy(key_col, "session_start")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(ep) - F.min(ep)).alias("duration_s"),
        )
    )
