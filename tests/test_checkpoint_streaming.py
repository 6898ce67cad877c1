"""Checkpoint/resume equivalence, changed-polygon re-assignment, and
Structured Streaming tile counts (AvailableNow trigger ≡ batch result)."""

from __future__ import annotations

import copy

import pytest
from pyspark.sql import functions as F

from osm_notes_ingestion_spark.operators.extract import extract_pages
from osm_notes_ingestion_spark.operators.spatial_join import assign_countries
from osm_notes_ingestion_spark.operators.tiles import tile_counts
from osm_notes_ingestion_spark.sources.checkpoint import (
    SnapshotStore,
    reassign_changed_polygons,
    resume_assignments,
)
from osm_notes_ingestion_spark.sources.polygons import prep_polygons
from osm_notes_ingestion_spark.sources.synth import pages_df, world_polygons
from osm_notes_ingestion_spark.streaming.incremental import (
    IncrementalRunner,
    streaming_tile_counts,
)


@pytest.fixture(scope="module")
def ext(spark, sf_dir):
    return extract_pages(pages_df(spark, sf_dir)).cache()


@pytest.fixture(scope="module")
def index():
    return prep_polygons(world_polygons(), level=7)


def _as_map(df):
    return {r.id: r.country_id for r in df.collect()}


def test_resume_equals_full_run(spark, ext, index, tmp_path):
    full = _as_map(assign_countries(spark, ext, index).select("id", "country_id"))

    store = SnapshotStore(str(tmp_path / "snaps"))
    # checkpoint only half the rows, with one deliberately-wrong value
    partial = (
        assign_countries(spark, ext.where(F.col("id") % 2 == 0), index)
        .select("id", "country_id")
        .withColumn(
            "country_id", F.when(F.col("id") == 42, F.lit(999)).otherwise(F.col("country_id"))
        )
    )
    store.write_snapshot(partial)

    resumed = _as_map(resume_assignments(spark, ext, index, store, verify_sample_mod=2))
    assert resumed == full  # wrong row invalidated + recomputed, rest restored


def test_changed_polygon_reassign(spark, ext, index):
    old_assign = assign_countries(spark, ext, index).select("id", "country_id")

    polys2 = copy.deepcopy(world_polygons())
    # shrink Midland (id 2) to a sliver: many points leave it
    for p in polys2:
        if p["country_id"] == 2:
            from osm_notes_ingestion_spark.sources.synth import _rect

            p["rings"] = [_rect(6, 47, 8, 49)]
    new_index = prep_polygons(polys2, level=7)

    incremental = _as_map(
        reassign_changed_polygons(spark, ext, old_assign, index, new_index, [2])
    )
    full = _as_map(assign_countries(spark, ext, new_index).select("id", "country_id"))
    assert incremental == full


def test_incremental_runner_watermark(spark, index, sf_dir, tmp_path):
    pages = pages_df(spark, sf_dir).cache()
    cutoff = "2024-01-01 12:00:00"

    store = SnapshotStore(str(tmp_path / "inc"))
    runner = IncrementalRunner(spark, index, store)

    first_half = pages.where(F.col("warc_ts") <= F.lit(cutoff))
    r1 = runner.run_batch(first_half)
    assert r1.advanced and r1.n_input == first_half.count()

    r2 = runner.run_batch(pages)  # only rows after watermark are new
    assert r2.n_input == pages.count() - first_half.count()
    # final snapshot ≡ full batch assignment
    full = _as_map(
        assign_countries(spark, extract_pages(pages), index).select("id", "country_id")
    )
    assert _as_map(store.latest(spark)) == full


def test_missing_children_block_watermark_advance(spark, index, sf_dir, tmp_path):
    """The reference's integrity gate: a batch whose parents lack child
    rows (notes without comments, J5 anti-join) must NOT advance the
    watermark (processAPINotes_34_updateLastValues.sql:92-105); the next
    run re-reads the same slice. A complete child set advances it."""
    pages = pages_df(spark, sf_dir).cache()
    store = SnapshotStore(str(tmp_path / "gapgate"))
    runner = IncrementalRunner(spark, index, store, max_gap_pct=5.0)

    # children for only ~half the pages → gap ≈ 50% >> 5% → refused
    torn = pages.select("id").where(F.col("id") % 2 == 0)
    r1 = runner.run_batch(pages, children=torn)
    assert not r1.advanced and r1.gap_pct > 5.0
    assert runner.watermark is None

    # complete children (with fan-out — multiple kids per parent is fine)
    complete = pages.select("id").unionByName(pages.select("id"))
    r2 = runner.run_batch(pages, children=complete)
    assert r2.advanced and r2.gap_pct == 0.0
    assert runner.watermark is not None


def test_full_resync_trigger(spark, index, sf_dir, tmp_path):
    pages = pages_df(spark, sf_dir)
    store = SnapshotStore(str(tmp_path / "resync"))
    runner = IncrementalRunner(spark, index, store, full_resync_threshold=10)
    r = runner.run_batch(pages)
    assert r.full_resync


def test_streaming_equals_batch(spark, sf_dir, tmp_path):
    pages = pages_df(spark, sf_dir)
    src = str(tmp_path / "stream_src")
    pages.write.mode("overwrite").parquet(src)

    stream_df = streaming_tile_counts(spark, src, pages.schema, z=4, window="24 hours")
    q = (
        stream_df.writeStream.format("memory")
        .queryName("tiles_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.window_start, r.x, r.y): r.cnt
        for r in spark.sql("select * from tiles_stream").collect()
    }
    from osm_notes_ingestion_spark.functions.mercator import tile_x_col, tile_y_col

    ext = extract_pages(pages).where(F.col("has_coords"))
    exp_df = (
        ext.groupBy(
            F.window("warc_ts", "24 hours")["start"].alias("window_start"),
            tile_x_col(F.col("lon"), 4).alias("x"),
            tile_y_col(F.col("lat"), 4).alias("y"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    exp = {(r.window_start, r.x, r.y): r.cnt for r in exp_df.collect()}
    assert got == exp


def test_stateful_fold_state_crosses_batches(spark, tmp_path):
    """applyInPandasWithState: a close in batch 0 and a reopen in batch 2
    must compose through the state store — the settled status is 'open'
    and intermediate updates show the interleaving."""
    import datetime as dt
    import glob
    import os
    import shutil
    import time

    from osm_notes_ingestion_spark.streaming.stateful import streaming_status_fold

    t0 = dt.datetime(2020, 1, 1)
    chunks = [
        [(1, "closed", t0, 0), (2, "opened", t0, 1)],
        [(1, "commented", t0 + dt.timedelta(seconds=1), 2), (2, "hidden", t0 + dt.timedelta(seconds=1), 3)],
        [(1, "reopened", t0 + dt.timedelta(seconds=2), 4), (2, "commented", t0 + dt.timedelta(seconds=2), 5)],
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "note_id long, event string, created_at timestamp, seq long"
    for i, rows in enumerate(chunks):
        tmp = str(tmp_path / f"chunk{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{i:04d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (time.time() + i, time.time() + i))

    stream = streaming_status_fold(spark, src, spark.createDataFrame([], schema).schema)
    q = (
        stream.writeStream.format("memory")
        .queryName("stateful_fold_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    updates = spark.table("stateful_fold_test").collect()
    # one update per (note, batch containing that note) -> 3 per note here
    assert len(updates) == 6
    by_note = {}
    for r in sorted(updates, key=lambda r: r.n_events):
        by_note.setdefault(r.note_id, []).append(r.status)
    # note 1: closed -> (commented keeps close) -> reopened: open settles
    assert by_note[1] == ["close", "close", "open"]
    # note 2: open -> hidden -> (commented keeps hidden)
    assert by_note[2] == ["open", "hidden", "hidden"]
