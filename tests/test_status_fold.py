"""Status fold: closed-form window implementation vs the literal
sequential trigger fold (update_note(),
processPlanetNotes_22_createBaseTables_tables.sql:249-347), including
the reference's golden special cases (tests/fixtures/special_cases/)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_notes_ingestion_spark.operators.merge import (
    count_ignored_transitions,
    fold_status,
)

EVENTS = ["opened", "commented", "closed", "reopened", "hidden"]


def literal_fold(events: list[str]):
    """Transliteration of the reference trigger: returns (status, closed_at_idx).

    state 'open' branch: closed→close, hidden→hidden, reopened ignored.
    ELSE branch (close or hidden): reopened→open, closed ignored,
    hidden→hidden (re-stamps closed_at).
    """
    status = "open"
    closed_at = None
    n_ignored = 0
    for i, e in enumerate(events):
        if e in ("opened", "commented"):
            continue
        if status == "open":
            if e == "closed":
                status, closed_at = "close", i
            elif e == "hidden":
                status, closed_at = "hidden", i
            elif e == "reopened":
                n_ignored += 1
        else:
            if e == "reopened":
                status, closed_at = "open", None
            elif e == "hidden":
                status, closed_at = "hidden", i
            elif e == "closed":
                n_ignored += 1
    return status, closed_at, n_ignored


def run_engine(spark, sequences: dict[int, list[str]]):
    rows = []
    t0 = dt.datetime(2020, 1, 1)
    for nid, seq in sequences.items():
        for i, e in enumerate(seq):
            rows.append((nid, e, t0 + dt.timedelta(seconds=i), i))
    df = spark.createDataFrame(rows, "note_id long, event string, created_at timestamp, seq int")
    got = fold_status(df, seq_col="seq").toPandas().set_index("note_id")
    ign = count_ignored_transitions(df, seq_col="seq").toPandas().set_index("note_id")
    return got, ign, t0


GOLDEN = {
    # reference fixture special cases (tests/fixtures/special_cases/*.xml)
    1: ["opened", "closed"],  # create_and_close → close
    2: ["opened", "commented", "closed"],  # comment_and_close → close
    3: ["opened", "closed", "reopened"],  # close_and_reopen → open
    4: ["opened", "closed", "closed"],  # double_close → close (2nd ignored)
    5: ["opened", "closed", "reopened", "reopened"],  # double_reopen → open
    6: ["opened", "closed", "reopened", "closed", "reopened", "closed"],  # cycle → close
    7: ["opened", "hidden"],  # hidden from open
    8: ["opened", "closed", "hidden"],  # hidden from close
    9: ["opened"],  # single note → open
    10: ["opened", "hidden", "reopened"],  # reopen after hidden → open
    11: ["opened", "hidden", "closed"],  # closed ignored after hidden → hidden
    12: ["opened", "reopened"],  # invalid reopen of open note → open
}


def test_golden_cases(spark):
    got, ign, t0 = run_engine(spark, GOLDEN)
    for nid, seq in GOLDEN.items():
        status, closed_idx, n_ignored = literal_fold(seq)
        assert got.loc[nid, "status"] == status, f"case {nid}: {seq}"
        exp_ts = None if closed_idx is None else t0 + dt.timedelta(seconds=closed_idx)
        got_ts = got.loc[nid, "closed_at"]
        got_ts = None if pd.isna(got_ts) else got_ts.to_pydatetime()
        assert got_ts == exp_ts, f"case {nid} closed_at: {got_ts} vs {exp_ts}"
        got_ign = int(ign.loc[nid, "n_ignored"]) if nid in ign.index else 0
        assert got_ign == n_ignored, f"case {nid} ignored: {got_ign} vs {n_ignored}"


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.lists(st.sampled_from(EVENTS), min_size=1, max_size=12), min_size=1, max_size=8)
)
def test_fold_property(spark, seqs):
    sequences = {i: ["opened"] + s for i, s in enumerate(seqs)}
    got, ign, t0 = run_engine(spark, sequences)
    for nid, seq in sequences.items():
        status, closed_idx, n_ignored = literal_fold(seq)
        assert got.loc[nid, "status"] == status, f"{seq}"
        exp_ts = None if closed_idx is None else t0 + dt.timedelta(seconds=closed_idx)
        got_ts = got.loc[nid, "closed_at"]
        got_ts = None if pd.isna(got_ts) else got_ts.to_pydatetime()
        assert got_ts == exp_ts, f"{seq} closed_at: {got_ts} vs {exp_ts}"
        got_ign = int(ign.loc[nid, "n_ignored"]) if nid in ign.index else 0
        assert got_ign == n_ignored, f"{seq}: ignored {got_ign} vs {n_ignored}"
