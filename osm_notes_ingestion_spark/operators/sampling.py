"""Content-stable sampling for corpus curation (deterministic, no RNG).

Training-data pipelines sample constantly — per-language balancing,
quality-bucket mixes, per-country/tile geo balancing, eval holdouts.
Spark's `df.sample`/`sampleBy` seed per PARTITION: the selected set
changes when the input is repartitioned, compacted, or re-read with a
different split planning — deadly for reproducible corpus releases.
Everything here keys off `xxhash64(key, seed)` of a ROW-CONTENT key
(url, doc_id) instead, so the sample is a pure function of the data:
stable under repartitioning, shuffle, storage layout, and engine
version, and directly auditable (membership is decidable per row).

Reference analog: the reference samples nothing (it processes every
note), but its reproducibility contract — identical outputs from
identical inputs regardless of split planning
(bin/process/processPlanetNotes.sh's deterministic XML split + load) —
is the property these samplers preserve at corpus scale.

Scale notes:
- `hash_sample` / `stratified_sample` are MAP-ONLY: one filter over the
  scan, zero shuffles, zero driver state. At 10^12 docs they cost one
  pass regardless of fraction.
- `stratified_take` (exact N per stratum) needs per-stratum order
  statistics, which no map-only plan can give. The naive plan — window
  over every stratum — sorts the FULL corpus per stratum (a 100-TB sort
  for a 1M-doc sample). Instead: one cheap count agg picks a per-stratum
  hash threshold that provably oversamples, the map-side prefilter cuts
  the corpus to ~oversample·N rows per stratum, and only the survivors
  pay for the exact window. Strata where the probabilistic prefilter
  undershoots (detected exactly, by counting survivors) fall back to the
  unfiltered window for THOSE strata only — so the result is always
  exactly "the N smallest hashes per stratum", just cheap in the common
  case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash_sample", "stratified_sample", "stratified_take"]

# xxhash64 is signed; shift into [0, 2^64)-equivalent unsigned ordering
# by comparing against a threshold on the same affine map. We work in
# double fractions of the signed range instead: u = (h / 2^64) + 0.5
# maps int64-min→0.0, int64-max→~1.0, uniform for a uniform hash.
_HASH_SPAN = float(2**64)


def _unit_hash(key: Column, seed: int) -> Column:
    """xxhash64(key, seed) mapped to a uniform double in [0, 1)."""
    return F.xxhash64(key, F.lit(seed)) / F.lit(_HASH_SPAN) + F.lit(0.5)


def hash_sample(df: DataFrame, key_col: str, fraction: float, seed: int = 0) -> DataFrame:
    """Content-stable Bernoulli sample: keep rows with u(key) < fraction.

    Deterministic in (key values, seed) only. Nested samples compose:
    hash_sample(f1) ⊇ hash_sample(f2) for f1 ≥ f2 at the same seed, so a
    10% corpus release is a strict superset of the 1% one — useful for
    scaling-law ladders. Map-only; no shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.where(_unit_hash(F.col(key_col), seed) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    fractions: dict | float,
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum content-stable Bernoulli sample.

    fractions: either one float for all strata, or {stratum_value:
    fraction}. Dict keys are the values of a SINGLE stratum column
    (pass strata_cols=["lang"]) or tuples matching multiple columns.
    Strata absent from the dict are dropped (fraction 0) — the common
    "keep only these languages, at these rates" shape.

    Map-only: the stratum→threshold map is a literal CASE expression
    (strata cardinality is pipeline-config sized, not data-sized), so
    the plan is one filter over the scan — no join, no shuffle."""
    u = _unit_hash(F.col(key_col), seed)
    if isinstance(fractions, (int, float)):
        return df.where(u < F.lit(float(fractions)))
    if not strata_cols:
        raise ValueError("strata_cols required with a fractions dict")
    skey = (
        F.col(strata_cols[0])
        if len(strata_cols) == 1
        else F.struct(*[F.col(c) for c in strata_cols])
    )
    expr = F.lit(0.0)
    for value, frac in fractions.items():
        if not 0.0 <= float(frac) <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0,1]")
        # struct equality in Spark is name-sensitive: alias literal
        # fields to the stratum column names so the types unify
        lit = (
            F.struct(*[F.lit(v).alias(c) for v, c in zip(value, strata_cols)])
            if isinstance(value, tuple)
            else F.lit(value)
        )
        expr = F.when(skey == lit, F.lit(float(frac))).otherwise(expr)
    return df.where(u < expr)


def stratified_take(
    df: DataFrame,
    strata_cols: list[str],
    n: int,
    key_col: str,
    seed: int = 0,
    oversample: float = 2.0,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum: the n SMALLEST unit
    hashes — a deterministic, content-stable uniform draw without
    replacement. Output = input rows + a `_u` rank-hash column (callers
    may drop it; kept so audits can re-verify membership).

    Plan: (1) one partial-agg count per stratum (tiny result, broadcast
    back); (2) map-side prefilter u < oversample·n/count keeps ≈
    oversample·n rows per stratum — the 100-TB scan never reaches the
    sort; (3) exact row_number window over the survivors; (4) strata
    whose survivor count undershot n (exactly detected) re-run the
    window WITHOUT the prefilter, so the contract is exact regardless
    of the prefilter's luck. With oversample=2 the undershoot
    probability per stratum is exp(-Θ(n)) (Chernoff) — the fallback is
    a correctness net, not a hot path."""
    if n <= 0:
        raise ValueError("n must be positive")
    if oversample <= 0:
        raise ValueError("oversample must be positive")
    u = _unit_hash(F.col(key_col), seed).alias("_u")
    base = df.select("*", u)

    counts = base.groupBy(*strata_cols).agg(F.count("*").alias("_stratum_n"))
    # threshold ≥ 1.0 (count ≤ oversample·n) keeps everything — small
    # strata never pay the fallback
    thresh = counts.select(
        *strata_cols,
        F.least(F.lit(1.0), F.lit(float(oversample) * n) / F.col("_stratum_n")).alias(
            "_thresh"
        ),
    )
    pref = base.join(F.broadcast(thresh), strata_cols).where(F.col("_u") < F.col("_thresh"))

    w = Window.partitionBy(*strata_cols).orderBy("_u", key_col)
    taken = (
        pref.drop("_thresh")
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n)
    )

    # exact undershoot detection: strata whose FULL size ≥ n but whose
    # prefilter survivors < n must re-run unfiltered
    survivor_n = pref.groupBy(*strata_cols).agg(F.count("*").alias("_surv_n"))
    short = (
        counts.join(survivor_n, strata_cols, "left")
        .where(
            (F.col("_stratum_n") > F.coalesce(F.col("_surv_n"), F.lit(0)))
            & (F.coalesce(F.col("_surv_n"), F.lit(0)) < n)
        )
        .select(*strata_cols)
    )
    ok = taken.join(F.broadcast(short), strata_cols, "left_anti")
    redo = (
        base.join(F.broadcast(short), strata_cols)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n)
    )
    return ok.unionByName(redo).drop("_rk")
