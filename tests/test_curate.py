"""End-to-end curation funnel: one planted casualty per stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_notes_ingestion_spark.operators.curate import curate_corpus


def test_curate_funnel_drops_one_doc_per_stage(spark):
    v = [f"v{i}" for i in range(12)]  # doc-1 vocab (12 words, 2 chunks)
    w = [f"w{i}" for i in range(80)]  # doc-3 vocab (80 words, 8 chunks)
    doc1 = " ".join(v)
    doc3 = " ".join(w)
    # doc 7 = doc 3 with one word INSERTED at position 5: every 10-word
    # chunk shifts (paragraph stage keeps it intact) but 3-gram shingle
    # overlap stays >= 0.8 (near-dup stage drops it)
    doc7 = " ".join(w[:5] + ["zz"] + w[5:])
    bench_text = "secret eval phrase one two"
    docs = spark.createDataFrame(
        [
            (1, doc1),  # survives everything
            (2, doc1),  # exact duplicate of 1 → exact stage
            (3, doc3),  # survives everything
            (4, " ".join(v[:10])),  # == doc 1's chunk 0 → paragraph stage
            (5, "a " * 11 + "a"),  # uniq_pct 8, top2gram 100 → quality stage
            (6, f"clean lead {bench_text} trailing filler words pad"),  # decontam
            (7, doc7),  # near-dup of 3 → curated stage
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")

    stages = curate_corpus(docs, bench)
    counts = {name: df.count() for name, df in stages.items()}
    assert counts == {
        "input": 7,
        "exact": 6,
        "paragraph": 5,
        "quality": 4,
        "decontam": 3,
        "curated": 2,
    }, counts
    assert {r["doc_id"] for r in stages["curated"].select("doc_id").collect()} == {1, 3}
    # doc 1's rewritten text preserves the token stream
    t1 = stages["curated"].where(F.col("doc_id") == 1).collect()[0]["text"]
    assert t1.split(" ") == v


def test_curate_without_benchmark_skips_decontam(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"u{i}x{j}" for j in range(12))) for i in range(5)],
        "doc_id long, text string",
    )
    stages = curate_corpus(docs, None)
    assert stages["decontam"] is stages["quality"]
    assert stages["curated"].count() == 5
