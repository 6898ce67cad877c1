"""Text-analysis operators for training-data pipelines — all JVM-side.

No reference counterpart (the reference stores note text verbatim); these
are the large-scale-corpus operators the engine adds (SURVEY §2 'beyond
the reference'): shingling, MinHash, SimHash, language-ID heuristic,
quality scoring, token counting, fingerprinting.

Design rule: every hash is derived from md5 of a UTF-8 string and hex→int
conversion — built-in, whole-stage-codegen'd, and bit-identical in DuckDB
(`('0x'||substr(md5(s),1,15))::BIGINT` ≡ Spark
`conv(substring(md5(encode(s,'utf-8')),1,15),16,10)`), so every operator
has an exact SQL oracle. No Python appears anywhere in these paths.

Scale notes: shingle explode is the canonical MinHash shuffle (rows ×
~n_tokens); signatures aggregate with map-side combine; LSH self-join is
an equi-join on (band, signature) — the whole point of banding is that
this join is tiny compared to the all-pairs cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _md5_int(col_expr, start: int = 1, length: int = 15):
    """First `length` hex chars of md5 as integer (≤15 hex → fits int64)."""
    return F.conv(F.substring(F.md5(F.encode(col_expr, "UTF-8")), start, length), 16, 10).cast(
        "long"
    )


def shingle_array(text_col_expr, k: int = 3):
    """Distinct word k-grams of a text column as ONE array expression."""
    toks = F.split(text_col_expr, " ")
    n = F.size(toks)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.array_join(F.slice(toks, i, k), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """→ (id, shingle) — distinct word k-grams per document."""
    return df.select(
        F.col(id_col), F.explode(shingle_array(F.col(text_col), k)).alias("shingle")
    )


def doc_shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """→ (id, shset) — one row per doc holding its distinct-shingle array.

    The array shape is the scale-preferred carrier for the whole MinHash
    pipeline: signatures fold over the array map-only (no explode row
    blow-up, no groupBy shuffle — see minhash_band_signatures_sets), and
    the same array IS the doc's shingle set for jaccard verification
    (jaccard_filter_sets), so the verify stage needs no collect_set
    shuffle either. Memory per row is bounded by document length, the
    same bound the exploded rows already impose on the shuffle."""
    return df.select(F.col(id_col), shingle_array(F.col(text_col), k).alias("shset"))


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id", n_hashes: int = 16) -> DataFrame:
    """→ (id, hid, mh): per (doc, hash-function) minimum shingle hash.

    ONE md5 per shingle (not per shingle×hash): the digest's two
    independent 15-hex halves seed a universal family
    h_i = (h1 + i·(h2 mod 2^31−1)) mod (10^9+7) — the prime modulus is
    what decorrelates the per-function argmins (without it the family is
    monotone in h1 and all bands collapse toward the same min-shingle;
    measured: 4 false-negative pairs at 16 hashes). i·h2m < 2^35, sums
    stay well inside int64. The mins aggregate as n_hashes WIDE columns
    (shuffle = one row per doc, map-side combined), then unpivot to the
    long (id, hid, mh) shape. vs the naive crossJoin×16: 16× fewer md5s
    AND 16× less shuffle input."""
    P = 1000000007
    h1 = _md5_int(F.col("shingle"), 1, 15)
    h2m = _md5_int(F.col("shingle"), 16, 15) % F.lit(2147483647)
    base = shingles.select(F.col(id_col), h1.alias("h1"), h2m.alias("h2m"))
    wide = base.groupBy(id_col).agg(
        *[
            F.min((F.col("h1") + F.lit(i) * F.col("h2m")) % F.lit(P)).alias(f"_mh{i}")
            for i in range(n_hashes)
        ]
    )
    stack = ", ".join(f"CAST({i} AS BIGINT), _mh{i}" for i in range(n_hashes))
    return wide.select(
        F.col(id_col), F.expr(f"stack({n_hashes}, {stack}) AS (hid, mh)")
    )


def lsh_band_signatures(
    signatures: DataFrame, id_col: str = "doc_id", rows_per_band: int = 4
) -> DataFrame:
    """→ (id, band, bandsig): concat of the band's minhashes in hid order."""
    return (
        signatures.withColumn("band", (F.col("hid") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("hid", "mh"))), lambda s: s["mh"]
                ),
                "-",
            ).alias("bandsig")
        )
    )


def minhash_band_signatures_sets(
    docsets: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    rows_per_band: int = 4,
    set_col: str = "shset",
) -> DataFrame:
    """→ (id, band, bandsig) from per-doc shingle arrays — ZERO shuffles.

    Bit-identical to lsh_band_signatures(minhash_signatures(word_shingles
    rows)) — the bandsig is the same '-'-joined decimal minhashes in hid
    order — but every minhash is an array_min fold over the doc's own
    shingle array, so the canonical MinHash shuffle (shingle-row explode
    + per-doc groupBy min) disappears entirely: the first shuffle in the
    whole LSH pipeline is the banded candidate equi-join itself. The two
    md5 halves are materialized once per shingle in a separate projection
    (CollapseProject keeps non-cheap multi-use aliases), not once per
    (shingle × hash function). Docs with no shingles carry no signature,
    matching the row path where they simply have no rows."""
    P = 1000000007
    hs = F.transform(
        F.col(set_col),
        lambda s: F.struct(
            _md5_int(s, 1, 15).alias("h1"),
            (_md5_int(s, 16, 15) % F.lit(2147483647)).alias("h2m"),
        ),
    )
    wide = docsets.where(F.size(set_col) > 0).select(
        F.col(id_col), hs.alias("_hs")
    )
    mh = [
        F.array_min(
            F.transform(
                F.col("_hs"),
                lambda h: (h["h1"] + F.lit(i) * h["h2m"]) % F.lit(P),
            )
        ).cast("string")
        for i in range(n_hashes)
    ]
    n_bands = n_hashes // rows_per_band
    band_arr = F.array(
        *[
            F.concat_ws("-", *mh[b * rows_per_band : (b + 1) * rows_per_band])
            for b in range(n_bands)
        ]
    )
    return wide.select(F.col(id_col), F.posexplode(band_arr).alias("band", "bandsig"))


def lsh_candidate_pairs(
    band_sigs: DataFrame, id_col: str = "doc_id", hot_band_cap: int | None = None
) -> DataFrame:
    """→ (id_a, id_b), id_a < id_b: pairs sharing ≥1 band signature.

    hot_band_cap guards the one way the banded self-join can go
    quadratic at corpus scale: a DEGENERATE band group — one bandsig
    shared by 10^4+ documents (boilerplate pages, identical license
    headers), which all four minhash folds of a band can only produce
    when the shingle sets are identical or near-identical, i.e. an
    exact-dup family in practice. With the cap set, groups larger than
    `hot_band_cap` emit a STAR (every member paired with the group's
    min id, O(n) edges) instead of all O(n^2) pairs; groups at or under
    the cap pair exactly as before. The star output is a different —
    deliberately weaker — contract than the full pair set: its Jaccard-
    verified transitive CLOSURE equals the full pair set's closure for
    exact-dup families (every member verifies against the
    representative at Jaccard 1), which is what cluster resolution
    (operators/components.dedup_cluster_labels) consumes; callers that
    need every individual pair of a hot family listed should route hot
    families through exact-dup semantics (q_dedup_exact) first.
    Default None = unchanged full-pair behavior, and the gated
    queries use the default (the hot-group aggregate adds one
    same-key exchange ahead of the band join, which the default's
    zero-pre-join-exchange plan does not pay). The hot aggregate is
    referenced twice (exclusion keys + star join), so band_sigs is
    scanned twice more than the default path — callers on a cold source
    should persist band_sigs first (the streaming path persists
    new_bands; this function stays persist-free so it never owns cache
    lifecycle it cannot release)."""
    a = band_sigs.select(F.col(id_col).alias("id_a"), "band", "bandsig")
    b = band_sigs.select(F.col(id_col).alias("id_b"), "band", "bandsig")
    if hot_band_cap is None:
        return (
            a.join(b, ["band", "bandsig"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    stats = band_sigs.groupBy("band", "bandsig").agg(
        F.count(F.lit(1)).alias("_n"), F.min(id_col).alias("_rep")
    )
    # hot groups are few by definition (each holds > cap members of a
    # finite corpus) → broadcast both the exclusion key set and the
    # star representatives; the cold self-join below is the ordinary
    # banded equi-join minus hot keys (map-side anti-join, no new
    # shuffle on the fact side beyond the band join itself)
    hot = stats.where(F.col("_n") > int(hot_band_cap)).select(
        "band", "bandsig", "_rep"
    )
    hot_keys = F.broadcast(hot.select("band", "bandsig"))
    cold_a = a.join(hot_keys, ["band", "bandsig"], "left_anti")
    cold_b = b.join(hot_keys, ["band", "bandsig"], "left_anti")
    cold_pairs = (
        cold_a.join(cold_b, ["band", "bandsig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    star = (
        band_sigs.join(F.broadcast(hot), ["band", "bandsig"])
        .where(F.col(id_col) != F.col("_rep"))
        .select(F.col("_rep").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    return cold_pairs.unionByName(star).distinct()


def jaccard_filter(
    pairs: DataFrame, shingles: DataFrame, id_col: str = "doc_id", threshold: float = 0.8
) -> DataFrame:
    """Exact word-shingle Jaccard over candidate pairs; keeps ≥ threshold.

    At scale the candidate set is the (small) LSH output, so the exact
    verification join touches only candidate docs' shingles: the full
    shingle table is first cut down to candidate docs by a BROADCAST
    semi-join on the candidate-id set — a map-side filter, so the only
    rows that ever shuffle in the verify stage are candidates'. The
    caller should persist `pairs` (it is referenced three times: the id
    set, the intersection, and nothing else recomputes it then).
    """
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # shingles are DISTINCT per doc (word_shingles array_distincts), so
    # each candidate doc's shingles form a set: fold them into ONE array
    # row per doc and verify pairs by array_intersect — the pair joins
    # then move one bounded-by-doc-length array per doc instead of ~|doc|
    # shingle rows per doc, and the only shingle-row shuffle left is the
    # candidate-restricted collect_set. (The id-set broadcast is O(LSH
    # candidates); if that ever exceeds the broadcast budget, dropping
    # the hint degrades gracefully to a shuffled semi-join.)
    docsets = (
        shingles.join(F.broadcast(ids), id_col, "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("shingle").alias("_shset"))
    )
    a = docsets.select(F.col(id_col).alias("id_a"), F.col("_shset").alias("_sa"))
    b = docsets.select(F.col(id_col).alias("id_b"), F.col("_shset").alias("_sb"))
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            inter / (F.size(F.col("_sa")) + F.size(F.col("_sb")) - inter),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )


def jaccard_filter_sets(
    pairs: DataFrame,
    docsets: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    set_col: str = "shset",
) -> DataFrame:
    """jaccard_filter over per-doc shingle ARRAYS (doc_shingle_sets):
    the docset table is restricted to candidate docs by a broadcast
    semi-join, then each pair is verified map-side by array_intersect —
    no shingle-row shuffle at all in the verify stage. Pairs where either
    side has no shingles fall out via the NULL 0/0 jaccard, matching the
    row path (such docs contribute no intersection rows there)."""
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    cand_sets = docsets.join(F.broadcast(ids), id_col, "left_semi")
    a = cand_sets.select(F.col(id_col).alias("id_a"), F.col(set_col).alias("_sa"))
    b = cand_sets.select(F.col(id_col).alias("id_b"), F.col(set_col).alias("_sb"))
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            inter / (F.size(F.col("_sa")) + F.size(F.col("_sb")) - inter),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """→ (id, simhash): majority-vote bit signature over distinct tokens.

    Token hash = first 4 md5 hex chars (16 bits); bit b of the signature
    is 1 iff more token hashes have bit b set than not.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok")
    )
    h = _md5_int(F.col("tok"), 1, 4)
    toks = toks.select(id_col, h.alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_near_dups(
    signatures: DataFrame,
    max_hamming: int = 3,
    bits: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
) -> DataFrame:
    """→ (id_a, id_b): pairs with hamming(simhash) <= max_hamming — the
    SimHash dedup SCALE path.

    Pigeonhole banding: split the signature into `bands` equal bit
    slices; two signatures within `max_hamming` (< bands) differ in at
    most max_hamming slices, so they MATCH EXACTLY in at least one slice
    — candidates come from an equi-join on (band, slice_bits), never a
    cartesian. Exact hamming (bit_count of xor, JVM-side) verifies; a
    pair colliding in several bands dedupes via distinct. At scale the
    (band, slice) pair is the shuffle key — same shape as MinHash-LSH
    banding.

    SIZING (`bits`/`bands` must grow with corpus size): the join key
    space has bands · 2^(bits/bands) values, so the defaults (16 bits,
    4 bands → 4·2^4 = 64 keys) are sized for test/gate corpora; a fixed
    key space makes candidate work Θ(n²/keys) as n grows. At scale use a
    64-bit simhash with bands = max_hamming+1 so each slice carries
    64/(max_hamming+1) bits — e.g. max_hamming=3 → 4 bands × 2^16 slices
    ≈ 260k keys, and grow slice width (more signature bits) until
    n / (bands·2^width) is a workable per-key candidate count.
    """
    if bands <= max_hamming:
        raise ValueError("need bands > max_hamming for the pigeonhole guarantee")
    width = bits // bands
    mask = (1 << width) - 1
    s = signatures.select(F.col(id_col).alias("_id"), F.col(sig_col).alias("_sig"))
    banded = s.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("_sig", b * width).bitwiseAND(F.lit(mask)).alias("slice"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("_id", "_sig", F.col("bs.band").alias("band"), F.col("bs.slice").alias("slice"))
    a = banded.select(
        F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"), "band", "slice"
    )
    b = banded.select(
        F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"), "band", "slice"
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["band", "slice"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(ham <= max_hamming)
        .select("id_a", "id_b")
        .distinct()
    )


# language-ID markers: deterministic rule heuristic (parity with SQL
# oracle is the contract; linguistic accuracy is a stub concern — real
# deployments swap the marker table)
LANG_MARKERS = [("en", "the"), ("es", "data"), ("de", "window"), ("fr", "join"), ("zh", "table")]


def _count_occurrences(text_col, word: str):
    padded = F.concat(F.lit(" "), text_col, F.lit(" "))
    pat = f" {word} "
    return (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit("")))) / len(pat)


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ (id, lang_guess): argmax marker-word count, first-listed wins ties."""
    counts = [(_count_occurrences(F.col(text_col), w)).alias(f"c_{lang}") for lang, w in LANG_MARKERS]
    scored = df.select(F.col(id_col), *counts)
    guess = None
    # build reverse CASE: a language wins if its count >= all later ones
    # and > all earlier ones (first-listed wins ties)
    langs = [lang for lang, _ in LANG_MARKERS]
    expr = F.lit(langs[-1])
    for i in range(len(langs) - 2, -1, -1):
        cond = None
        for j in range(len(langs)):
            if j == i:
                continue
            c = (
                F.col(f"c_{langs[i]}") >= F.col(f"c_{langs[j]}")
                if j > i
                else F.col(f"c_{langs[i]}") > F.col(f"c_{langs[j]}")
            )
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(langs[i])).otherwise(expr)
    guess = expr
    return scored.select(F.col(id_col), guess.alias("lang_guess"))


def ngram_array(text_col_expr, k: int = 2):
    """ALL word k-grams of a text column, duplicates kept, document
    order — the repetition-signal carrier (shingle_array is the
    DISTINCT twin used for set similarity)."""
    toks = F.split(text_col_expr, " ")
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _max_multiplicity(arr):
    """Max element multiplicity of a string array as one JVM fold: sort,
    then track the longest run of equal adjacent values — per-row
    O(n log n), no explode/groupBy shuffle."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(F.array_sort(arr), acc0, step, lambda acc: acc["best"])


# Fixed vocabularies for the quality ratio features — tiny and
# deterministic so the DuckDB oracle can restate them verbatim.
_PUNCT = ".,;:!?'\"()-"
_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def quality_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """→ (id, n_chars, n_tokens, n_distinct_tokens, uniq_pct,
    est_bpe_tokens, top_2gram_pct, dup_3gram_pct, punct_pct,
    stopword_pct) — integer-valued quality features.

    The last two are the Gopher-style repetition filters (Rae et al.
    2021 §A1.1) a training-data pipeline cuts boilerplate with:
    top_2gram_pct = share of word-2-grams taken by the single most
    frequent 2-gram; dup_3gram_pct = share of word-3-grams that are
    repeats of an earlier one. Both are pure per-row JVM folds
    (_max_multiplicity / array_distinct) — no shuffle, no Python — and
    integer-floored so the DuckDB oracle (SQL_QUALITY) matches exactly.
    Documents too short to form an n-gram score 0 (nothing to repeat)."""
    toks = F.split(F.col(text_col), " ")
    g2 = ngram_array(F.col(text_col), 2)
    g3 = ngram_array(F.col(text_col), 3)
    n2 = F.size(g2)
    n3 = F.size(g3)
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.floor(F.size(F.array_distinct(toks)) * 100 / F.size(toks)).cast("long").alias("uniq_pct"),
        F.ceil(F.length(text_col) / 4.0).cast("long").alias("est_bpe_tokens"),
        F.when(n2 > 0, F.floor(_max_multiplicity(g2) * 100 / n2))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("top_2gram_pct"),
        F.when(n3 > 0, F.floor((n3 - F.size(F.array_distinct(g3))) * 100 / n3))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("dup_3gram_pct"),
        # length/punct/stopword ratios (C4/CCNet-style quality cuts):
        # punct_pct via translate-strip (one JVM pass, no explode);
        # stopword_pct via a filter fold over the token array. Both
        # integer-floored for exact cross-engine parity.
        F.when(
            F.length(text_col) > 0,
            F.floor(
                (F.length(text_col) - F.length(F.translate(F.col(text_col), _PUNCT, "")))
                * 100
                / F.length(text_col)
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("punct_pct"),
        F.floor(
            F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))) * 100 / F.size(toks)
        )
        .cast("long")
        .alias("stopword_pct"),
    )


def word_chunks(text_col_expr, k: int = 10):
    """Fixed-size word chunks of a text column as ONE array expression —
    the 'paragraph' splitter for corpora whose documents are single
    lines (the synthetic tables here). Real pipelines pass
    F.split(text, '\\n\\n') instead; paragraph_dedup is agnostic."""
    toks = F.split(text_col_expr, " ")
    nchunks = F.ceil(F.size(toks) / F.lit(float(k))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
    )


def paragraph_dedup(
    df: DataFrame, paras_col, id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style paragraph-hash dedup: across the whole corpus, keep
    only the FIRST occurrence of each distinct paragraph (global order =
    (doc_id, position)) and reassemble each document from its kept
    paragraphs. This is the line-grain dedup a training pipeline runs to
    strip boilerplate (cookie banners, nav text) that exact/near doc
    dedup can't touch.

    `paras_col` is any array<string> Column (word_chunks(...) here;
    F.split(text, '\\n\\n') on real corpora).

    → (id_col, n_paras, n_kept, kept_text) — kept_text preserves the
    original paragraph order, '' when everything was dropped. Docs
    whose paragraph array is empty or NULL stay in the output as
    (0, 0, '') — posexplode_OUTER keeps their row, so a downstream
    inner join never silently loses a document.

    Scale shape: the first-occurrence winner per paragraph hash is a
    min-STRUCT AGGREGATE (map-side combinable), NOT a row_number window
    — a boilerplate paragraph appearing in 10^9 docs partially folds
    inside every input partition instead of routing all copies through
    one window task; the join back on the hash is a plain equi-join
    (AQE skew-split handles the same hot keys). Reassembly groups by
    doc — collect_list of (pos, para) structs, array_sort, array_join —
    one shuffle at document grain. Reference analog: the sync-table
    set-difference dedup (sql/process/processPlanetNotes_43_*) applied
    at sub-document grain."""
    p = df.select(
        F.col(id_col), F.posexplode_outer(paras_col).alias("pos", "para")
    ).withColumn("h", F.md5(F.encode("para", "UTF-8")))
    firsts = (
        p.where(F.col("para").isNotNull())
        .groupBy("h")
        .agg(F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("first"))
    )
    kept = p.join(firsts, "h", "left").withColumn(
        "keep",
        F.coalesce(
            (F.col(id_col) == F.col("first.i")) & (F.col("pos") == F.col("first.p")),
            F.lit(False),
        ),
    )
    return kept.groupBy(id_col).agg(
        F.count("para").cast("long").alias("n_paras"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct(F.col("pos"), F.col("para")))
                    )
                ),
                lambda x: x["para"],
            ),
            " ",
        ).alias("kept_text"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3-appendix-C / PaLM / Llama
    style n-gram-overlap check a training pipeline runs before training):
    per training document, count how many of its DISTINCT word n-grams
    also occur anywhere in an evaluation benchmark, so contaminated rows
    can be dropped or flagged.

    → (id_col, n_doc_ngrams, contam_ngrams, contaminated) — all
    deterministic integer columns, so the check has an exact SQL oracle.

    Scale shape (100 TB corpus vs a fixed eval suite): the benchmark
    n-gram set is tiny relative to the corpus (~10^6-10^8 grams vs ~10^12
    docs), so it is md5-hashed, dedup'd and BROADCAST; the corpus is
    scanned ONCE — each doc explodes (explode_outer, so gram-less docs
    survive) its distinct n-grams map-side into the broadcast hash
    left-join, and the per-doc aggregate partially folds inside every
    input partition (hit indicators sum, the per-row total rides along
    as max), so the only shuffle is ~1 row per document. Reference
    analog: the Planet-vs-API reconciliation diff
    (sql/monitor/processCheckPlanetNotes_31_loadCheckNotes.sql) — flag
    rows of one corpus by content intersection with another.
    """
    grams = F.array_distinct(ngram_array(F.col(text_col), n))
    bench_hashes = (
        benchmark.select(
            F.explode(F.array_distinct(ngram_array(F.col(bench_text_col), n))).alias("g")
        )
        .select(F.md5(F.encode("g", "UTF-8")).alias("h"))
        .distinct()
        .withColumn("_hit", F.lit(1).cast("long"))
    )
    exploded = docs.select(
        F.col(id_col),
        F.size(grams).cast("long").alias("_n"),
        F.explode_outer(grams).alias("g"),
    ).select(F.col(id_col), "_n", F.md5(F.encode("g", "UTF-8")).alias("h"))
    return (
        exploded.join(F.broadcast(bench_hashes), "h", "left")
        .groupBy(id_col)
        .agg(
            F.max("_n").alias("n_doc_ngrams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("contam_ngrams"),
        )
        .select(
            F.col(id_col),
            "n_doc_ngrams",
            F.col("contam_ngrams").cast("long").alias("contam_ngrams"),
            (F.col("contam_ngrams") > 0).cast("int").alias("contaminated"),
        )
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", gram: int = 8
) -> DataFrame:
    """→ (id, fingerprint): winnowing-lite — min md5-int over all char
    `gram`-grams (a 1-permutation MinHash over character shingles)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text_col) - (gram - 1), F.lit(1)))
    grams = df.select(
        F.col(id_col),
        F.explode(idx).alias("i"),
        F.col(text_col).alias("_t"),
    ).select(F.col(id_col), F.expr(f"substring(_t, i, {gram})").alias("g"))
    return grams.select(F.col(id_col), _md5_int(F.col("g")).alias("h")).groupBy(id_col).agg(
        F.min("h").alias("fingerprint")
    )


def token_percentiles_approx(
    df: DataFrame,
    accuracy: int = 10000,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """SCALE default for per-group token-count percentiles.

    The exact gate twin (plans/queries_text.q_token_percentiles) uses
    `F.percentile`, which buffers and sorts every group's values — fine
    at gate scale, a sort-heavy aggregation at 100 TB. This variant uses
    `percentile_approx` (Greenwald–Khanna sketch): one-pass, mergeable
    (map-side combine works), memory O(accuracy · log n), with rank
    error bounded by 1/accuracy. The property test pins the returned
    value inside the exact [p − 1/accuracy, p + 1/accuracy] quantile
    envelope per group.
    """
    ntok = F.size(F.split(F.col(text_col), " ")).cast("double")
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.percentile_approx(ntok, F.lit(0.5), F.lit(accuracy)).alias("p50_tokens"),
        F.percentile_approx(ntok, F.lit(0.95), F.lit(accuracy)).alias("p95_tokens"),
        F.percentile_approx(ntok, F.lit(0.99), F.lit(accuracy)).alias("p99_tokens"),
    )
