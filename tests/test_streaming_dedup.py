"""Streaming incremental MinHash-LSH dedup: settled result ≡ the batch
pipeline on the full corpus, and batch replays are idempotent."""

import glob
import os
import shutil

import pytest

from osm_notes_ingestion_spark.operators.textops import (
    doc_shingle_sets,
    jaccard_filter_sets,
    lsh_candidate_pairs,
    minhash_band_signatures_sets,
)
from osm_notes_ingestion_spark.streaming.dedup import (
    _pruned_store,
    _touched_buckets,
    near_dup_pairs,
    process_dedup_batch,
    streaming_near_dups,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")


def _batch_pairs(spark, docs):
    sets = doc_shingle_sets(docs).persist()
    pairs = jaccard_filter_sets(
        lsh_candidate_pairs(minhash_band_signatures_sets(sets)), sets
    )
    out = sorted((r.id_a, r.id_b) for r in pairs.collect())
    sets.unpersist(blocking=False)
    return out


@pytest.fixture()
def dirs(tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    os.makedirs(src)
    yield src, store
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def _write_slices(spark, docs, src, n_slices=3):
    """One parquet FILE per slice in one source dir → one micro-batch
    per slice under maxFilesPerTrigger=1."""
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    bounds = [ids[int(len(ids) * i / n_slices)] for i in range(1, n_slices)] + [
        ids[-1] + 1
    ]
    lo = None
    for i, hi in enumerate(bounds):
        sl = docs.where(
            f"doc_id < {hi}" + (f" AND doc_id >= {lo}" if lo is not None else "")
        )
        tmp = f"{src}_tmp{i}"
        sl.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, os.path.join(src, f"slice_{i}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
        lo = hi


def test_streaming_settled_equals_batch(spark, dirs):
    src, store = dirs
    docs = _docs(spark)
    _write_slices(spark, docs, src, n_slices=3)
    q = streaming_near_dups(spark, src, docs.schema, store)
    q.awaitTermination()
    got = sorted((r.id_a, r.id_b) for r in near_dup_pairs(spark, store).collect())
    want = _batch_pairs(spark, docs)
    assert got == want and len(want) > 0


def test_store_reads_are_bucket_pruned(spark, dirs):
    """The round-4 scale fix: a micro-batch must read only the store
    buckets its own bandsigs/ids can match, not the full accumulated
    store. Build a multi-bucket store from the corpus, then read it the
    way a SMALL batch would (few distinct bandsigs → few touched
    buckets) and assert strictly fewer files than the store holds —
    while a full-corpus touched set still sees every stored row."""
    _, store = dirs
    docs = _docs(spark)
    B = 16
    process_dedup_batch(
        spark, docs.where("doc_id % 2 = 0"), 0, store, n_store_buckets=B
    )
    process_dedup_batch(
        spark, docs.where("doc_id % 2 = 1"), 1, store, n_store_buckets=B
    )
    bands_dir = os.path.join(store, "bands")
    all_files = glob.glob(f"{bands_dir}/batch_id=*/bkt=*/part-*.parquet")
    n_buckets_on_disk = len(
        {p.split("/bkt=")[1].split("/")[0] for p in all_files}
    )
    assert n_buckets_on_disk > 4  # the corpus really spans many buckets

    schema = "doc_id long, band int, bandsig string"
    min_id = docs.agg({"doc_id": "min"}).first()[0]
    one_doc_sigs = minhash_band_signatures_sets(
        doc_shingle_sets(docs.where(f"doc_id = {min_id}"))
    )
    touched = _touched_buckets(one_doc_sigs, "bandsig", B)
    assert 0 < len(touched) <= 4  # 4 bands → at most 4 buckets
    pruned = _pruned_store(spark, bands_dir, schema, touched)
    read_files = {f.removeprefix("file://") for f in pruned.inputFiles()}
    assert read_files and read_files < set(all_files)
    assert all(any(f"/bkt={b}/" in f for b in touched) for f in read_files)

    # lossless: the union over ALL buckets is exactly the stored rows
    every = _pruned_store(spark, bands_dir, schema, list(range(B)))
    assert every.count() == spark.read.parquet(*all_files).count()
    # and the excluded batch is skipped at the path level
    no_b1 = _pruned_store(
        spark, bands_dir, schema, list(range(B)), exclude_batch_id=1
    )
    b1_files = [f for f in no_b1.inputFiles() if "/batch_id=1/" in f]
    assert no_b1.inputFiles() and not b1_files


def test_replayed_batch_is_idempotent(spark, dirs):
    _, store = dirs
    docs = _docs(spark)
    first = docs.where("doc_id % 2 = 0")
    second = docs.where("doc_id % 2 = 1")
    process_dedup_batch(spark, first, 0, store)
    process_dedup_batch(spark, second, 1, store)
    settled = sorted(
        (r.id_a, r.id_b) for r in near_dup_pairs(spark, store).collect()
    )
    # replay batch 1 (same id): stores must be unchanged, not doubled
    process_dedup_batch(spark, second, 1, store)
    replayed = sorted(
        (r.id_a, r.id_b) for r in near_dup_pairs(spark, store).collect()
    )
    assert replayed == settled == _batch_pairs(spark, docs)


def test_hot_family_across_batches_is_bridged(spark, dirs):
    """With hot_band_cap set, a boilerplate family arriving over two
    batches costs O(new) candidate edges per batch (star + one bridge,
    not |new|x|store| pairs), and the settled verified pairs still
    connect the WHOLE family transitively."""
    _, store = dirs
    fam_text = "identical boilerplate header shared by the whole family"
    b0 = spark.range(0, 400).selectExpr("id AS doc_id", f"'{fam_text}' AS text")
    b1 = spark.range(400, 800).selectExpr("id AS doc_id", f"'{fam_text}' AS text")
    process_dedup_batch(spark, b0, 0, store, hot_band_cap=50)
    process_dedup_batch(spark, b1, 1, store, hot_band_cap=50)
    pairs = [(r.id_a, r.id_b) for r in near_dup_pairs(spark, store).collect()]
    # O(n) per batch: batch 0 stars to 0 (399 edges); batch 1 stars to
    # 400 (399 edges) plus ONE bridge (0, 400) — not 400*400 cross pairs
    assert len(pairs) == 399 + 399 + 1
    assert (0, 400) in pairs
    # transitive closure connects all 800 members
    parent = list(range(800))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(800)}) == 1


def test_layout_guards_fail_loudly(spark, dirs):
    """A store must not silently read as empty: a bucket-count change
    raises at batch entry, and a batch dir holding data without bkt=
    partitions (pre-bucketing layout) raises at read time."""
    _, store = dirs
    docs = _docs(spark).limit(50)
    process_dedup_batch(spark, docs, 0, store, n_store_buckets=8)
    with pytest.raises(ValueError, match="n_store_buckets"):
        process_dedup_batch(spark, docs, 1, store, n_store_buckets=16)

    legacy = os.path.join(store, "legacy_bands")
    bands = minhash_band_signatures_sets(doc_shingle_sets(docs))
    bands.write.mode("overwrite").parquet(os.path.join(legacy, "batch_id=0"))
    with pytest.raises(ValueError, match="bkt= bucket layout"):
        _pruned_store(
            spark, legacy, "doc_id long, band int, bandsig string", [0]
        ).count()
