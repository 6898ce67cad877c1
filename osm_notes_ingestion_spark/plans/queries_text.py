"""Driver-gate queries: training-data ops (dedup / similarity / text).

Corpus = documents ∪ planted near-duplicates (doc_id+100000, 5 words
appended, doc_id%10=0) ∪ planted exact duplicates (doc_id+200000,
doc_id%25=0) — deterministic and reconstructible in SQL, since the raw
documents table contains no duplicates at all (verified at build time).

Every hash is md5-derived (bit-identical across Spark and DuckDB), so
even MinHash-LSH has an exact oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import extract_media_metadata, resize_media, sample_frames
from ..operators.similarity import cosine_topk, embedding_near_dups, ivf_topk
from ..operators.textops import (
    LANG_MARKERS,
    doc_shingle_sets,
    fingerprint,
    jaccard_filter,
    jaccard_filter_sets,
    lang_id,
    lsh_candidate_pairs,
    minhash_band_signatures_sets,
    quality_features,
    simhash,
    word_shingles,
)

_APPEND = " zz yy xx qq pp"

SQL_CORPUS = f"""corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000, text || '{_APPEND}' FROM documents WHERE doc_id % 10 = 0
  UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id % 25 = 0
)"""


def _corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    near = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_APPEND)).alias("text"),
    )
    exact = docs.where(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    out = docs.unionByName(near).unionByName(exact)
    # the local testdata corpus is ONE small parquet file → a 1-3
    # partition scan (union: ≤6) that serializes every md5-heavy
    # shingle/simhash stage on a handful of cores (measured:
    # dedup_minhash_lsh 4.5s → 2.6s at sf0.1/32 threads after
    # spreading). Spread AFTER the union — per-branch repartition would
    # concatenate to 3×par partitions. Production inputs arrive as many
    # files, so the guard skips the shuffle there; the shuffled payload
    # is the raw doc rows — tiny relative to the exploded shingle work
    # it unlocks.
    par = spark.sparkContext.defaultParallelism
    if out.rdd.getNumPartitions() < par:
        out = out.repartition(par)
    return out


# ------------------------------------------------------------- exact dedup


def _messy_url(doc_id):
    """Deterministic messy-URL synthesis for the url-dedup leg: 8
    variants per doc that all denote page (doc_id % 97) — host/scheme
    case, default port, trailing slash, fragment, unsorted params,
    tracking params. Both engines build the SAME strings from doc_id;
    only Spark runs the normalizer, the oracle derives the expected
    canonical directly from the id arithmetic — so the gate checks the
    normalizer against an INDEPENDENT expectation, not a mirrored
    implementation."""
    pid = (doc_id % 97).cast("string")
    v = doc_id % 8
    base = F.concat(F.lit("https://example.com/docs/"), pid)
    return (
        F.when(v == 0, F.concat(F.lit("https://EXAMPLE.com/docs/"), pid))
        .when(v == 1, F.concat(F.lit("https://example.com:443/docs/"), pid))
        .when(v == 2, F.concat(base, F.lit("/")))
        .when(v == 3, F.concat(base, F.lit("?utm_source=feed&utm_medium=rss")))
        .when(v == 4, F.concat(base, F.lit("?b=2&a=1")))
        .when(v == 5, F.concat(base, F.lit("?a=1&b=2#section-3")))
        .when(v == 6, F.concat(F.lit("HTTPS://example.com/docs/"), pid))
        .otherwise(F.concat(base, F.lit("?a=1&utm_campaign=x&b=2")))
    )


def q_dedup_exact(spark, sf_dir):
    """Exact dedup, TWO legs folded into one gate (driver 50-cap):
    leg='text' keys by content hash (canonical min doc id per text md5);
    leg='url' keys by normalized URL (functions/urls.normalize_url over
    a deterministically-messy synthetic URL — the host/URL-level dedup a
    training pipeline runs before content dedup). Column-identical legs
    union into one result; the oracle recomputes the text leg with
    DuckDB's md5 and the url leg from the generator's id arithmetic
    (variants 4/5/7 keep ?a=1&b=2, the rest normalize to the bare path),
    so every normalization rule is hash-pinned."""
    from ..functions.urls import normalize_url

    c = _corpus(spark, sf_dir)
    text_leg = (
        c.withColumn("key", F.md5(F.encode("text", "UTF-8")))
        .groupBy("key")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies"))
        .withColumn("leg", F.lit("text"))
    )
    url_leg = (
        c.select("doc_id", _messy_url(F.col("doc_id")).alias("url"))
        .withColumn("key", normalize_url("url"))
        .groupBy("key")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies"))
        .withColumn("leg", F.lit("url"))
    )
    cols = ["leg", "key", "canonical_id", "n_copies"]
    return text_leg.select(cols).unionByName(url_leg.select(cols))


SQL_DEDUP_EXACT = f"""WITH {SQL_CORPUS}
SELECT 'text' AS leg, md5(text) AS key, min(doc_id) AS canonical_id,
       count(*) AS n_copies
FROM corpus GROUP BY 2
UNION ALL
SELECT 'url' AS leg,
       'https://example.com/docs/' || CAST(doc_id % 97 AS VARCHAR)
         || CASE WHEN doc_id % 8 IN (4, 5, 7) THEN '?a=1&b=2' ELSE '' END AS key,
       min(doc_id) AS canonical_id, count(*) AS n_copies
FROM corpus GROUP BY 2"""


# ------------------------------------------------------- exact jaccard dedup

_SQL_SHINGLES = """shingles AS (
  SELECT DISTINCT doc_id, s AS shingle FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' ')) - 1),
           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS s
    FROM corpus)
)"""


def q_dedup_jaccard(spark, sf_dir):
    """All-pairs word-3-gram Jaccard ≥ 0.8.

    BASELINE-ONLY: the crossJoin feed is the deliberate small-scale
    exactness oracle, NOT a production path — never run this shape at
    scale. The canonical scalable dedup is dedup_minhash_lsh (banded
    equi-join candidates → jaccard verify), which this baseline exists
    to validate against."""
    c = _corpus(spark, sf_dir)
    sh = word_shingles(c)
    # persist the cross join: jaccard_filter references `pairs` three
    # times (id-set restriction + both pair joins) — unpersisted, the
    # O(n²) cross would be EVALUATED three times. Single-slot cache as
    # in q_dedup_minhash_lsh (bounded: baseline-only, gate-scale input).
    while _SHINGLE_CACHE_SLOT:
        _SHINGLE_CACHE_SLOT.pop().unpersist(blocking=False)
    all_pairs = (
        sh.select(F.col("doc_id").alias("id_a"))
        .distinct()
        .crossJoin(sh.select(F.col("doc_id").alias("id_b")).distinct())
        .where(F.col("id_a") < F.col("id_b"))
    ).persist()
    _SHINGLE_CACHE_SLOT.append(all_pairs)
    return jaccard_filter(all_pairs, sh, threshold=0.8)


SQL_DEDUP_JACCARD = f"""WITH {SQL_CORPUS}, {_SQL_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b FROM inter
JOIN sizes za ON za.doc_id = id_a JOIN sizes zb ON zb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / (za.sz + zb.sz - i) >= 0.8"""


# ------------------------------------------------------------- minhash LSH

_SQL_MINHASH = """mh AS (
  SELECT doc_id, hid, min((h1 + hid * h2m) % 1000000007) AS mh
  FROM (
    SELECT doc_id,
           ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h1,
           (('0x' || substr(md5(shingle), 16, 15))::BIGINT % 2147483647) AS h2m
    FROM shingles
  ), range(16) r(hid) GROUP BY 1, 2
), bands AS (
  SELECT doc_id, CAST(hid // 4 AS INT) AS band,
         string_agg(CAST(mh AS VARCHAR), '-' ORDER BY hid) AS bandsig
  FROM mh GROUP BY 1, 2
), cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bandsig = b.bandsig AND a.doc_id < b.doc_id
)"""


_SHINGLE_CACHE_SLOT: list = []


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash(16) → LSH(4 bands × 4 rows) candidates → exact-Jaccard
    verification ≥ 0.8. Deterministic end to end (md5 hashing).

    Array-shaped pipeline: the per-doc distinct-shingle ARRAY is computed
    once (doc_shingle_sets, persisted — signatures and verification both
    consume it), signatures fold over it map-only, and the FIRST shuffle
    in the whole pipeline is the banded candidate equi-join. The
    candidate-pair table is persisted too (referenced by the broadcast
    id-set restriction and both pair joins). A single-slot cache bounds
    both leaks: repeated invocations (bench trials, gate re-runs)
    unpersist the previous copies instead of accumulating cached tables
    for the session lifetime."""
    while _SHINGLE_CACHE_SLOT:
        _SHINGLE_CACHE_SLOT.pop().unpersist(blocking=False)
    c = _corpus(spark, sf_dir)
    sets = doc_shingle_sets(c).persist()
    _SHINGLE_CACHE_SLOT.append(sets)
    cands = lsh_candidate_pairs(
        minhash_band_signatures_sets(sets, n_hashes=16, rows_per_band=4)
    ).persist()
    _SHINGLE_CACHE_SLOT.append(cands)
    return jaccard_filter_sets(cands, sets, threshold=0.8)


SQL_DEDUP_MINHASH = f"""WITH {SQL_CORPUS}, {_SQL_SHINGLES}, {_SQL_MINHASH},
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cands c JOIN shingles a ON a.doc_id = c.id_a JOIN shingles b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT id_a, id_b FROM inter
JOIN sizes za ON za.doc_id = id_a JOIN sizes zb ON zb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / (za.sz + zb.sz - i) >= 0.8"""


# ------------------------------------------------------- dedup clusters


def q_dedup_clusters(spark, sf_dir):
    """Transitive near-dup GROUPS from the verified MinHash-LSH pairs:
    connected components (large-star/small-star, operators/components.py)
    over the pair graph, canonical doc = component minimum. This is the
    step that makes dedup actionable — keep rows where is_canonical=1.
    The oracle recomputes the identical pair graph in SQL and resolves
    components with a recursive min-label closure.

    The gate also pins INCREMENTAL label maintenance (the daily job that
    folds new similarity edges into yesterday's labels without re-reading
    the settled pair graph, operators/components.incremental_components):
    the same verified pairs are split deterministically into two batches
    (pmod(xxhash64(id_a, id_b), 2)), batch 0 is labeled from scratch and
    batch 1 folded in incrementally; the result's `inc_cluster_id` column
    carries those maintained labels. The oracle emits its full-graph
    closure label for BOTH columns, so the value hash pins
    incremental ≡ full ≡ independent SQL closure, per row."""
    from ..operators.components import dedup_cluster_labels, incremental_cluster_labels

    pairs = q_dedup_minhash_lsh(spark, sf_dir).withColumn(
        "_b", F.pmod(F.xxhash64("id_a", "id_b"), F.lit(2))
    )
    pairs.persist()
    _SHINGLE_CACHE_SLOT.append(pairs)
    docs = _corpus(spark, sf_dir).select("doc_id")
    full = dedup_cluster_labels(pairs, docs)
    prior = dedup_cluster_labels(pairs.where(F.col("_b") == 0), docs)
    inc = incremental_cluster_labels(pairs.where(F.col("_b") == 1), prior, docs)
    return full.join(
        inc.select("doc_id", F.col("cluster_id").alias("inc_cluster_id")), "doc_id"
    ).select("doc_id", "cluster_id", "is_canonical", "inc_cluster_id")


SQL_DEDUP_CLUSTERS = f"""WITH RECURSIVE {SQL_CORPUS}, {_SQL_SHINGLES}, {_SQL_MINHASH},
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cands c JOIN shingles a ON a.doc_id = c.id_a JOIN shingles b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
),
verified AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes za ON za.doc_id = id_a JOIN sizes zb ON zb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / (za.sz + zb.sz - i) >= 0.8
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM verified
  UNION SELECT id_b, id_a FROM verified
),
reach AS (
  SELECT doc_id AS node, doc_id AS comp FROM corpus
  UNION
  -- propagate labels only downhill (comp < target): the component min
  -- reaches every member through nodes it is smaller than, so min()
  -- below is unaffected and the closure stays linear-ish
  SELECT e.v AS node, r.comp FROM reach r JOIN edges e ON e.u = r.node
  WHERE r.comp < e.v
),
lab AS (SELECT node, min(comp) AS comp FROM reach GROUP BY 1)
SELECT node AS doc_id, comp AS cluster_id,
       CAST(CASE WHEN node = comp THEN 1 ELSE 0 END AS INTEGER) AS is_canonical,
       comp AS inc_cluster_id
FROM lab"""


# ----------------------------------------------------------------- simhash


def q_simhash(spark, sf_dir):
    return simhash(_corpus(spark, sf_dir))


def _sql_simhash_bits(bits: int = 16) -> str:
    sums = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(bits)
    )
    sig = " + ".join(f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""toks AS (
  SELECT DISTINCT doc_id, t AS tok FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM corpus)
), th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 4))::BIGINT AS h FROM toks
), bitsums AS (
  SELECT doc_id, {sums} FROM th GROUP BY doc_id
)
SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM bitsums"""


SQL_SIMHASH = f"WITH {SQL_CORPUS}, {_sql_simhash_bits()}"


# ----------------------------------------------------------- language / QA


def q_simhash_near_dups(spark, sf_dir):
    """SimHash dedup scale path: pigeonhole banding (4×4-bit slices) →
    equi-join candidates → exact hamming ≤ 3 verify. Oracle mirrors the
    banding exactly — same slices, same bit ops."""
    from ..operators.textops import simhash_near_dups

    return simhash_near_dups(simhash(_corpus(spark, sf_dir)), max_hamming=3)


def _sql_simhash_near_dups(bits: int = 16, bands: int = 4, max_hamming: int = 3) -> str:
    width = bits // bands
    mask = (1 << width) - 1
    slices = ", ".join(f"({b}, (simhash >> {b * width}) & {mask})" for b in range(bands))
    # _sql_simhash_bits() = "toks AS (...), th AS (...), bitsums AS (...)
    # SELECT <sig> FROM bitsums" — wrap its final SELECT as a CTE
    cte_chain, final_select = _sql_simhash_bits().rsplit("\nSELECT ", 1)
    return f"""WITH {SQL_CORPUS}, {cte_chain},
sigs AS (SELECT {final_select}),
banded AS (
  SELECT doc_id, simhash, band, slice
  FROM sigs, LATERAL (VALUES {slices}) t(band, slice)
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a JOIN banded b ON a.band = b.band AND a.slice = b.slice AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


SQL_SIMHASH_NEAR_DUPS = _sql_simhash_near_dups()


def q_lang_id(spark, sf_dir):
    return lang_id(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _sql_lang_id() -> str:
    cnt = {
        lang: f"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
        for lang, w in LANG_MARKERS
    }
    langs = [lang for lang, _ in LANG_MARKERS]
    case = ""
    for i, lang in enumerate(langs[:-1]):
        conds = []
        for j, other in enumerate(langs):
            if j == i:
                continue
            op = ">=" if j > i else ">"
            conds.append(f"c_{lang} {op} c_{other}")
        case += f"WHEN {' AND '.join(conds)} THEN '{lang}' "
    scores = ", ".join(f"{expr} AS c_{lang}" for lang, expr in cnt.items())
    return f"""WITH scored AS (SELECT doc_id, {scores} FROM documents)
SELECT doc_id, CASE {case}ELSE '{langs[-1]}' END AS lang_guess FROM scored"""


SQL_LANG_ID = _sql_lang_id()


def q_quality(spark, sf_dir):
    """Quality gate, TWO legs folded (driver 50-cap, strict superset):
    the per-doc quality/repetition features, plus benchmark
    DECONTAMINATION columns (textops.decontaminate) — the synthetic
    'eval suite' is every doc with doc_id % 37 == 0, reconstructible in
    SQL, so the oracle derives the benchmark n-gram set independently.
    Bench docs are fully self-contaminated by construction
    (contam_ngrams == n_doc_ngrams) and natural 5-gram overlap between
    the synthetic docs exercises the partial-overlap path."""
    from ..operators.textops import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qf = quality_features(docs)
    bench = docs.where(F.col("doc_id") % 37 == 0)
    return qf.join(decontaminate(docs, bench, n=5), "doc_id")


SQL_QUALITY = """WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
), g AS (
  SELECT doc_id, text, toks,
    CASE WHEN len(toks) >= 2
         THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
         ELSE CAST([] AS VARCHAR[]) END AS g2,
    CASE WHEN len(toks) >= 3
         THEN list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE CAST([] AS VARCHAR[]) END AS g3,
    CASE WHEN len(toks) >= 5
         THEN list_distinct(list_transform(range(1, len(toks) - 3),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))
         ELSE CAST([] AS VARCHAR[]) END AS g5
  FROM t
), bg AS (
  SELECT DISTINCT unnest(g5) AS gram FROM g WHERE doc_id % 37 = 0
), hits AS (
  SELECT dg.doc_id, count(*) AS contam_ngrams
  FROM (SELECT doc_id, unnest(g5) AS gram FROM g) dg JOIN bg USING (gram)
  GROUP BY 1
)
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
  CAST(floor(len(list_distinct(toks)) * 100 / len(toks)) AS BIGINT) AS uniq_pct,
  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
  CAST(CASE WHEN len(g2) > 0
       THEN floor(len(list_filter(g2, x -> x = list_aggr(g2, 'mode'))) * 100 / len(g2))
       ELSE 0 END AS BIGINT) AS top_2gram_pct,
  CAST(CASE WHEN len(g3) > 0
       THEN floor((len(g3) - len(list_distinct(g3))) * 100 / len(g3))
       ELSE 0 END AS BIGINT) AS dup_3gram_pct,
  CAST(CASE WHEN length(text) > 0
       THEN floor((length(text) - length(translate(text, '.,;:!?''"()-', ''))) * 100 / length(text))
       ELSE 0 END AS BIGINT) AS punct_pct,
  CAST(floor(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) * 100 / len(toks)) AS BIGINT) AS stopword_pct,
  CAST(len(g5) AS BIGINT) AS n_doc_ngrams,
  CAST(COALESCE(h.contam_ngrams, 0) AS BIGINT) AS contam_ngrams,
  CAST(CASE WHEN COALESCE(h.contam_ngrams, 0) > 0 THEN 1 ELSE 0 END AS INTEGER) AS contaminated
FROM g LEFT JOIN hits h USING (doc_id)"""


def q_token_percentiles(spark, sf_dir):
    """Aggregation-family depth: exact p50/p95/p99 of per-doc token
    counts by (lang, source) — Spark's exact `percentile` (continuous
    interpolation) against DuckDB's quantile_cont, rounded to 4 dp."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ntok = F.size(F.split(F.col("text"), " ")).cast("double")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.percentile(ntok, F.lit(0.5)), 4).alias("p50_tokens"),
            F.round(F.percentile(ntok, F.lit(0.95)), 4).alias("p95_tokens"),
            F.round(F.percentile(ntok, F.lit(0.99)), 4).alias("p99_tokens"),
        )
    )


SQL_TOKEN_PERCENTILES = """SELECT lang, source, count(*) AS n_docs,
  round(quantile_cont(CAST(len(string_split(text, ' ')) AS DOUBLE), 0.5), 4) AS p50_tokens,
  round(quantile_cont(CAST(len(string_split(text, ' ')) AS DOUBLE), 0.95), 4) AS p95_tokens,
  round(quantile_cont(CAST(len(string_split(text, ' ')) AS DOUBLE), 0.99), 4) AS p99_tokens
FROM documents GROUP BY lang, source"""


def q_fingerprint(spark, sf_dir):
    """Fingerprint gate, TWO legs folded (driver 50-cap, strict
    superset): the winnowing-lite min-hash, plus CCNet-style
    PARAGRAPH-level dedup columns (textops.paragraph_dedup) over a
    deterministically multi-paragraph corpus — each doc's paragraph
    list = 10-word chunks of its own text ++ the chunks of doc
    (doc_id % 11), so every doc carries planted cross-doc duplicate
    paragraphs (and docs 0..10, where doc_id % 11 == doc_id, carry
    SELF-duplicates, exercising the within-doc first-wins path). The
    oracle recomputes the first-occurrence winners independently with
    a row_number window, vs the engine's skew-safe min-struct
    aggregate."""
    from ..operators.textops import paragraph_dedup, word_chunks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    other = docs.select(F.col("doc_id").alias("_k"), F.col("text").alias("_t2"))
    withp = docs.join(other, docs["doc_id"] % 11 == other["_k"]).select(
        "doc_id",
        F.concat(word_chunks(F.col("text")), word_chunks(F.col("_t2"))).alias("paras"),
    )
    pd = paragraph_dedup(withp, F.col("paras")).select(
        "doc_id",
        "n_paras",
        "n_kept",
        F.md5(F.encode("kept_text", "UTF-8")).alias("kept_md5"),
    )
    return fingerprint(docs).join(pd, "doc_id")


_SQL_CHUNKS = (
    "list_transform(range(0, CAST(ceil(len({tk}) / 10.0) AS BIGINT)), "
    "i -> array_to_string({tk}[i*10+1 : i*10+10], ' '))"
)

SQL_FINGERPRINT = f"""WITH grams AS (
  SELECT doc_id, substr(text, i, 8) AS g
  FROM documents, LATERAL unnest(range(1, greatest(length(text) - 6, 2))) t(i)
), fp AS (
  SELECT doc_id, min(('0x' || substr(md5(g), 1, 15))::BIGINT) AS fingerprint
  FROM grams GROUP BY 1
), wp AS (
  SELECT a.doc_id,
         list_concat({_SQL_CHUNKS.format(tk="string_split(a.text, ' ')")},
                     {_SQL_CHUNKS.format(tk="string_split(b.text, ' ')")}) AS ps
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id % 11
), paras AS (
  SELECT doc_id, i - 1 AS pos, ps[i] AS para
  FROM wp, LATERAL unnest(range(1, len(ps) + 1)) r(i)
), ranked AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
  FROM paras
), pd AS (
  SELECT doc_id, count(*) AS n_paras,
         sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept,
         md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN para END, ' ' ORDER BY pos), '')) AS kept_md5
  FROM ranked GROUP BY 1
)
SELECT fp.doc_id, fp.fingerprint, CAST(pd.n_paras AS BIGINT) AS n_paras,
       CAST(pd.n_kept AS BIGINT) AS n_kept, pd.kept_md5
FROM fp JOIN pd USING (doc_id)"""


# ------------------------------------------------------------- embeddings


def q_embed_topk(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return cosine_topk(emb, queries, k=5)


SQL_EMBED_TOPK = """WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3
), scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product(e.embedding::DOUBLE[], q.qv)
               / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                      * list_dot_product(q.qv, q.qv)), 6) AS cos6
  FROM embeddings e, q
)
SELECT query_id, rank, vec_id, cos6 FROM (
  SELECT query_id, vec_id, cos6,
         row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= 5"""


def q_embed_neardup(spark, sf_dir):
    """Near-dup pairs over embeddings ∪ planted exact-scaled copies
    (vec_id+100000, 2× scaling ⇒ cosine exactly 1)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    planted = emb.where(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("embedding").cast("array<double>"), lambda x: x * 2.0).alias("embedding"),
    )
    corpus = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")).unionByName(planted)
    return embedding_near_dups(corpus, threshold=0.999)


SQL_EMBED_NEARDUP = """WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(embedding::DOUBLE[], x -> x * 2.0)
  FROM embeddings WHERE vec_id % 50 = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM corpus a, corpus b
WHERE a.vec_id < b.vec_id
  AND list_dot_product(a.v, b.v) / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) > 0.999"""


def q_embed_neardup_bucketed(spark, sf_dir):
    """The SCALE near-dup path, gated: SRP-bucketed equi-join (no
    cartesian) over the same planted-dup corpus as embed_neardup. The
    oracle mirrors the bucketing EXACTLY (same md5-seeded hyperplanes,
    same sign test), like embed_topk_ivf's oracle mirrors IVF."""
    from ..operators.similarity import embedding_near_dups_bucketed

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    planted = emb.where(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("embedding").cast("array<double>"), lambda x: x * 2.0).alias("embedding"),
    )
    corpus = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")).unionByName(planted)
    return embedding_near_dups_bucketed(corpus, threshold=0.999, bits=8)


def _sql_srp_bucket_expr(v: str, bits: int = 8) -> str:
    """DuckDB twin of srp_bucket: same md5-seeded ±1 hyperplanes, same
    in-order ±v[i] accumulation (sign flips are IEEE-exact, so the fold
    agrees bit-for-bit with Spark's aggregate)."""
    terms = []
    for b in range(bits):
        w = (
            f"list_transform(range(0, len({v})), i -> "
            f"CASE WHEN ('0x' || substr(md5('{b}:' || i), 1, 1))::BIGINT % 2 = 1 "
            f"THEN {v}[i + 1] ELSE -{v}[i + 1] END)"
        )
        terms.append(f"(CASE WHEN list_sum({w}) > 0 THEN {1 << b} ELSE 0 END)")
    return " + ".join(terms)


SQL_EMBED_NEARDUP_BUCKETED = f"""WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(embedding::DOUBLE[], x -> x * 2.0)
  FROM embeddings WHERE vec_id % 50 = 0
), buck AS (
  SELECT vec_id, v, CAST({_sql_srp_bucket_expr('v')} AS BIGINT) AS srp_bucket FROM corpus
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM buck a JOIN buck b ON a.srp_bucket = b.srp_bucket AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) > 0.999"""


def q_embed_topk_ivf(spark, sf_dir):
    """IVF clustered ANN — the scale path (cent_id as partition key →
    file-pruned probes). Same query set as embed_topk; the oracle mirrors
    the IVF algorithm itself, so the check is exact."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return ivf_topk(emb, queries, k=5, nlist=16, nprobe=4)


_SQL_COS = (
    "round(list_dot_product({a}, {b}) / sqrt(list_dot_product({a}, {a})"
    " * list_dot_product({b}, {b})), 6)"
)

SQL_EMBED_TOPK_IVF = f"""WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), cents AS (
  -- mirrors the engine exactly: FIRST nlist corpus vectors BY ID ORDER
  -- (not id<16, which diverges on sparse/offset id spaces)
  SELECT vec_id AS cent_id, v AS cv FROM c ORDER BY vec_id LIMIT 16
), assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT c.vec_id, c.v, cents.cent_id,
           row_number() OVER (PARTITION BY c.vec_id
             ORDER BY {_SQL_COS.format(a='c.v', b='cents.cv')} DESC, cents.cent_id) AS rn
    FROM c, cents
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 3
), probes AS (
  SELECT query_id, qv, cent_id FROM (
    SELECT q.query_id, q.qv, cents.cent_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {_SQL_COS.format(a='q.qv', b='cents.cv')} DESC, cents.cent_id) AS prank
    FROM q, cents
  ) WHERE prank <= 4
), cand AS (
  SELECT p.query_id, a.vec_id, {_SQL_COS.format(a='a.v', b='p.qv')} AS cos6
  FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
)
SELECT query_id, rank, vec_id, cos6 FROM (
  SELECT query_id, vec_id, cos6,
         row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, vec_id) AS rank
  FROM cand
) WHERE rank <= 5"""


# ------------------------------------------------------------- multimodal


def q_multimodal_meta(spark, sf_dir):
    """Binary-payload metadata extraction. decoder='stub' is FORCED here
    (the payloads are synthetic text bytes, not real images, and the
    oracle states the stub's exact fake dimensions); the operator's
    'auto' mode probes for PIL on the executor and self-describes via
    the emitted decoder column."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return extract_media_metadata(docs, decoder="stub")


SQL_MULTIMODAL_META = """SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST(160 + ('0x' || substr(md5(text), 1, 6))::BIGINT % 1920 AS BIGINT) AS width,
  CAST(120 + ('0x' || substr(md5(text), 7, 6))::BIGINT % 1080 AS BIGINT) AS height,
  'stub' AS decoder
FROM documents"""


def q_multimodal_resize(spark, sf_dir):
    """Resize plumbing (decode/resample stubbed): bytes → bytes at a
    target resolution, verified via md5 of the output payload."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return resize_media(docs, target_w=64, target_h=64)


SQL_MULTIMODAL_RESIZE = """SELECT doc_id,
  CAST(64 AS BIGINT) AS width, CAST(64 AS BIGINT) AS height,
  md5(text || ':64x64') AS resized_md5
FROM documents"""


def q_multimodal_frames(spark, sf_dir):
    """Frame-sampling fan-out (1 video row → n_frames rows; UDTF shape)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return sample_frames(docs)


SQL_MULTIMODAL_FRAMES = """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
  md5(text || ':' || i) AS frame_md5
FROM documents, LATERAL unnest(range(0, 1 + octet_length(encode(text)) % 5)) t(i)"""


def q_multimodal_pipeline(spark, sf_dir):
    """Combined multimodal gate: metadata probe + resize + frame-sample
    fan-out in ONE registry entry (one row per sampled frame, joined with
    the doc's metadata and resize digest) — folded so the driver's
    50-query gate cap covers every registered query (VERDICT r2 #2: the
    separate resize/frames rows fell off the r02 snapshot). All three
    operators run in full; the 1→N Arrow fan-out of sample_frames is
    exercised by the per-frame row grain."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    meta = extract_media_metadata(docs, decoder="stub").select(
        "doc_id",
        "n_bytes",
        F.col("width").alias("src_w"),
        F.col("height").alias("src_h"),
        "decoder",
    )
    resized = resize_media(docs, target_w=64, target_h=64).select("doc_id", "resized_md5")
    frames = sample_frames(docs)
    return frames.join(meta, "doc_id").join(resized, "doc_id")


SQL_MULTIMODAL_PIPELINE = f"""SELECT fr.doc_id, fr.frame_idx, fr.frame_md5,
  mm.n_bytes, mm.width AS src_w, mm.height AS src_h, mm.decoder, rz.resized_md5
FROM ({SQL_MULTIMODAL_FRAMES}) fr
JOIN ({SQL_MULTIMODAL_META}) mm USING (doc_id)
JOIN ({SQL_MULTIMODAL_RESIZE}) rz USING (doc_id)"""


QUERIES: dict[str, tuple] = {
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_jaccard": (q_dedup_jaccard, SQL_DEDUP_JACCARD),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, SQL_DEDUP_MINHASH),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    # simhash's standalone gate folded into simhash_near_dups (whose
    # oracle recomputes every signature bit-for-bit from raw text before
    # the banding join); the signature function keeps its numpy-twin
    # pytest coverage. Slot freed for dedup_clusters under the driver's
    # 50-query cap.
    "simhash_near_dups": (q_simhash_near_dups, SQL_SIMHASH_NEAR_DUPS),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "quality_features": (q_quality, SQL_QUALITY),
    "fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "token_percentiles": (q_token_percentiles, SQL_TOKEN_PERCENTILES),
    "embed_topk": (q_embed_topk, SQL_EMBED_TOPK),
    "embed_neardup": (q_embed_neardup, SQL_EMBED_NEARDUP),
    "embed_neardup_bucketed": (q_embed_neardup_bucketed, SQL_EMBED_NEARDUP_BUCKETED),
    # ONE combined multimodal gate (meta+resize+frames) — the driver caps
    # the gate at 50 queries, and three separate rows pushed the last two
    # off the r02 snapshot; the single-op functions remain for API use
    # and tools/check_oracles still exercises them via the pipeline join
    "multimodal_pipeline": (q_multimodal_pipeline, SQL_MULTIMODAL_PIPELINE),
    "embed_topk_ivf": (q_embed_topk_ivf, SQL_EMBED_TOPK_IVF),
}
