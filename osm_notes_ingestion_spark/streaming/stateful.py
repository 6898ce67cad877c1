"""Custom stateful streaming operator: the status state machine as an
applyInPandasWithState fold.

The reference folds note status sequentially in a Postgres trigger
(update_note(), processPlanetNotes_22_createBaseTables_tables.sql:249-347);
the batch engine collapses it to a closed-form window fold
(operators/merge.fold_status). This module is the STREAMING twin: the
literal trigger machine runs per note key inside
`applyInPandasWithState`, with the (status, closed_at, n_events) state
carried by the state store across micro-batches — the Structured
Streaming pattern for operators that windowed aggregation can't express.

Ordering contract: batches must arrive in event order (the reference's
API poll delivers ordered slices; the file source processes files
oldest-first). Within a batch, rows sort by (created_at, seq) before the
machine runs — intra-batch disorder is tolerated, cross-batch disorder
is the upstream's contract, exactly as in the reference.

Each update emits the note's current (status, closed_at, n_events);
n_events increases monotonically, so the SETTLED result is the row with
max n_events per note — deterministic for the AvailableNow + memory-sink
gate, and exactly the batch fold's answer (oracle-checked).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "note_id long, status string, closed_at timestamp, n_events long"
STATE_SCHEMA = "status string, closed_at timestamp, n_events long"


def _machine(status: str, closed_at, events: Iterator[tuple[str, object]]):
    """The literal trigger state machine (tests/test_status_fold.py
    literal_fold, transliterated from the reference trigger)."""
    for e, ts in events:
        if e in ("opened", "commented"):
            continue
        if status == "open":
            if e == "closed":
                status, closed_at = "close", ts
            elif e == "hidden":
                status, closed_at = "hidden", ts
            # reopened while open: ignored
        else:
            if e == "reopened":
                status, closed_at = "open", None
            elif e == "hidden":
                status, closed_at = "hidden", ts  # re-stamps closed_at
            # closed while not open: ignored (keeps FIRST close's ts)
    return status, closed_at


def _fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    if state.exists:
        status, closed_at, n = state.get
    else:
        status, closed_at, n = "open", None, 0
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch):
        batch = batch.sort_values(["created_at", "seq"], kind="mergesort")
        status, closed_at = _machine(
            status, closed_at, zip(batch["event"], batch["created_at"])
        )
        n += len(batch)
    state.update((status, closed_at, n))
    yield pd.DataFrame(
        {"note_id": [key[0]], "status": [status], "closed_at": [closed_at], "n_events": [n]}
    )


def streaming_status_fold(
    spark: SparkSession,
    source_dir: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """readStream over mapped-event parquet files → stateful fold.

    Source rows: (note_id long, event string, created_at timestamp,
    seq long). Returns the streaming update DataFrame; caller attaches
    sink/trigger. maxFilesPerTrigger=1 forces one micro-batch per file so
    the state store genuinely carries state across batches.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    return stream.groupBy("note_id").applyInPandasWithState(
        _fold, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
