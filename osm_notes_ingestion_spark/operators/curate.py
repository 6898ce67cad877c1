"""End-to-end corpus curation: the funnel a training-data pipeline runs
before tokenization, composed from this engine's tested operators.

Stages (each filters — funnel order puts the cheap, high-yield cuts
first so later stages scan fewer rows):

  input → exact dedup → paragraph dedup → quality filter →
  decontamination (optional) → near-dup cluster canonicals → curated

Every stage is the already-gated operator (dedup_exact /
paragraph_dedup / quality_features / decontaminate /
minhash-LSH + connected components), so the composition adds no new
semantics — just the wiring, which is what `--job curate` exposes via
spark-submit. Reference analog: the staged sync pipeline
(bin/process/processPlanetNotes.sh — load → dedup → merge → derive),
re-expressed as a corpus funnel.

Scale notes: each stage's winner/score computation is the operator's
own scale shape (min-struct aggregates, broadcast benchmark set, banded
LSH equi-join). The funnel returns every intermediate stage; a caller
that needs per-stage counts should persist() or write each stage before
counting, otherwise each count re-executes the lineage above it (the
runner job does exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import dedup_cluster_labels
from .textops import (
    decontaminate,
    doc_shingle_sets,
    jaccard_filter_sets,
    lsh_candidate_pairs,
    minhash_band_signatures_sets,
    paragraph_dedup,
    quality_features,
    word_chunks,
)


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    min_uniq_pct: int = 20,
    max_top2gram_pct: int = 60,
    max_dup3gram_pct: int = 60,
    contam_max_ngrams: int = 0,
    jaccard_threshold: float = 0.8,
) -> dict[str, DataFrame]:
    """Run the curation funnel; → ordered dict of stage name →
    (id_col, text_col) survivors, ending at 'curated'. Stages:

    exact        keep the min-id doc per exact text hash
    paragraph    strip globally-duplicated paragraphs (word_chunks of
                 `chunk_words`); docs whose every paragraph was
                 boilerplate drop out
    quality      token-count window + uniqueness + Gopher repetition caps
    decontam     drop docs sharing > contam_max_ngrams word-5-grams with
                 `benchmark` (stage skipped when benchmark is None)
    curated      MinHash-LSH near-dup clusters at `jaccard_threshold`;
                 keep each cluster's canonical (min-id) member
    """
    stages: dict[str, DataFrame] = {"input": docs.select(id_col, text_col)}

    # -- exact dedup: min-struct winner per content hash (skew-safe; an
    #    identical text replicated 10^9 times partially folds map-side)
    d = stages["input"].withColumn("_md5", F.md5(F.encode(text_col, "UTF-8")))
    w = d.groupBy("_md5").agg(F.min(F.col(id_col)).alias("_w"))
    stages["exact"] = (
        d.join(w, "_md5").where(F.col(id_col) == F.col("_w")).select(id_col, text_col)
    )

    # -- paragraph-level boilerplate strip; text is REWRITTEN to the
    #    kept paragraphs, empty docs drop
    pd = paragraph_dedup(
        stages["exact"].select(
            F.col(id_col), word_chunks(F.col(text_col), chunk_words).alias("_paras")
        ),
        F.col("_paras"),
        id_col=id_col,
    )
    stages["paragraph"] = pd.where(F.col("n_kept") > 0).select(
        F.col(id_col), F.col("kept_text").alias(text_col)
    )

    # -- quality window (all integer features, same thresholds both
    #    engines would compute)
    qf = quality_features(stages["paragraph"], id_col=id_col, text_col=text_col)
    good = qf.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("uniq_pct") >= min_uniq_pct)
        & (F.col("top_2gram_pct") <= max_top2gram_pct)
        & (F.col("dup_3gram_pct") <= max_dup3gram_pct)
    ).select(id_col)
    stages["quality"] = stages["paragraph"].join(good, id_col)

    # -- benchmark decontamination (optional)
    if benchmark is not None:
        dc = decontaminate(
            stages["quality"], benchmark, id_col=id_col, text_col=text_col
        )
        clean = dc.where(F.col("contam_ngrams") <= contam_max_ngrams).select(id_col)
        stages["decontam"] = stages["quality"].join(clean, id_col)
    else:
        stages["decontam"] = stages["quality"]

    # -- near-dup clusters → canonical members only
    sets = doc_shingle_sets(stages["decontam"], id_col=id_col, text_col=text_col)
    cands = lsh_candidate_pairs(minhash_band_signatures_sets(sets, id_col=id_col))
    pairs = jaccard_filter_sets(cands, sets, id_col=id_col, threshold=jaccard_threshold)
    labels = dedup_cluster_labels(
        pairs, stages["decontam"].select(id_col), doc_col=id_col
    )
    stages["curated"] = stages["decontam"].join(
        labels.where(F.col("is_canonical") == 1).select(id_col), id_col
    )
    return stages
