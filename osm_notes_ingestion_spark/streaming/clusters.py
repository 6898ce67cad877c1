"""Streaming incremental density clustering: grid_cluster maintenance
over micro-batches, store-backed (the foreachBatch shape streaming/
dedup.py pins for LSH state, applied to the ClusterState algebra of
operators/clustering.py).

Stores under `root/`:
- points/bkt=K/batch_id=N   (id, plat, plon) — each batch's NEW points,
  hash-bucketed by their eps-CELL: K = pmod(xxhash64(cell), B). Spatial
  pruning, not just key pruning: a micro-batch derives its touched set
  from the RING-2 cells of its own points (every old point whose
  neighbour count, core status, or pair set can change lies within
  Chebyshev distance 2 cells of some new point — new×old pairs reach
  ring 1, and PROMOTED points' own pair sweeps reach 1 further), and
  reads only matching bkt= directories. Lossless for the same reason
  the dedup store's is: equal cells hash to equal buckets.
- nbinc/bkt=K/batch_id=N    (id, cell, inc) — per-batch neighbour-count
  increments (new points' initial counts AND old points' deltas),
  bucketed by the point's OWN cell so a point's total folds from its
  one bucket: n_nb(id) = Σ inc over batches. Counts are mutable but the
  STORE stays append-only.
- labels/gen=N              (node, comp) — core labels, full rewrite per
  batch. Inherent to min-id labeling: a merge can relabel an arbitrary
  fraction of components, and incremental_components reads the full
  prior labels as its seed anyway (same contract as the near-dup label
  maintenance, VERDICT r4 #4). Partitioning labels by comp and
  rewriting only merged components is the documented next hardening.
- border/bkt=K/batch_id=N   (id, core_id) — border-edge ADDS, append
  only: an edge (noncore, core) can only stop mattering when `id` is
  PROMOTED (core status is monotone; distances never change), so live
  borders = all adds whose id is not in the current core set. No
  delete markers needed.

Exactly-once: every writer lands under its batch_id partition
(idempotent foreachBatch — a replayed batch overwrites its own rows);
labels/gen=N is keyed by batch id too, so a replay rewrites the same
generation instead of forking history.

Settled invariant (tests/test_streaming_clusters.py): after any prefix
of batches, labels from the stores EQUAL grid_cluster over every point
seen — the streaming twin is the batch operator, not an approximation.

Contract: ids unique across the stream; append-only (deletions would
demote cores — out of contract, same as the batch increment).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.clustering import _eps_pairs, _indexed, _level_for_eps
from ..operators.components import incremental_components

_EMPTY_LABELS = "node long, comp long"


def _cell_col(level: int):
    n = 1 << level
    from ..functions.cells import LEVEL_SHIFT, Y_SHIFT

    x = F.floor((F.col("plon") + F.lit(180_000_000)) * F.lit(n) / F.lit(360_000_000))
    y = F.floor((F.col("plat") + F.lit(90_000_000)) * F.lit(n) / F.lit(180_000_000))
    x = F.least(F.greatest(x, F.lit(0)), F.lit(n - 1)).cast("long")
    y = F.least(F.greatest(y, F.lit(0)), F.lit(n - 1)).cast("long")
    return (
        F.lit(level).cast("long") * F.lit(1 << LEVEL_SHIFT).cast("long")
        + y * F.lit(1 << Y_SHIFT).cast("long")
        + x
    )


def _bkt(cell_col, n_buckets: int):
    return F.pmod(F.xxhash64(cell_col), F.lit(n_buckets)).cast("int")


def _ring_cells(level: int, k: int):
    """Array column of the (2k+1)² ring cells around (cx, cy) — JVM-side,
    lon wraps, lat clipped rows dropped."""
    n = 1 << level
    from ..functions.cells import LEVEL_SHIFT, Y_SHIFT

    def cell_of(cx, cy):
        return (
            F.lit(level).cast("long") * F.lit(1 << LEVEL_SHIFT).cast("long")
            + cy * F.lit(1 << Y_SHIFT).cast("long")
            + cx
        )

    return F.array_compact(
        F.array(
            *[
                F.when(
                    (F.col("cy") + F.lit(dy) >= 0) & (F.col("cy") + F.lit(dy) <= n - 1),
                    cell_of(F.pmod(F.col("cx") + F.lit(dx), F.lit(n)).cast("long"), F.col("cy") + F.lit(dy)),
                )
                for dx in range(-k, k + 1)
                for dy in range(-k, k + 1)
            ]
        )
    )


def _read_buckets(
    spark: SparkSession, root: str, buckets: list[int], schema: str, before_batch: int
) -> DataFrame:
    """Read only the touched bkt= dirs, EXCLUDING rows of batch ids ≥
    before_batch — a replayed batch must not see its own crashed write
    as prior state (the dedup store's in-flight-exclusion contract)."""
    parts = [f"{root}/bkt={b}" for b in buckets if os.path.exists(f"{root}/bkt={b}")]
    if not parts:
        return spark.createDataFrame([], schema + ", batch_id long")
    # basePath keeps partition discovery rooted at the store even though
    # only the touched bkt= dirs are listed/read
    return (
        spark.read.option("basePath", root).parquet(*parts).where(F.col("batch_id") < before_batch)
    )


def _latest_gen(root: str, before_batch: int | None = None) -> int | None:
    """Newest label generation, optionally only among gens < before_batch
    (replay: a batch must seed from its PREDECESSOR's labels, never from
    its own crashed generation)."""
    if not os.path.exists(root):
        return None
    gens = [int(d.split("=")[1]) for d in os.listdir(root) if d.startswith("gen=")]
    if before_batch is not None:
        gens = [g for g in gens if g < before_batch]
    return max(gens) if gens else None


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Store dirs can legitimately hold no data files (an all-core batch
    writes zero border rows but partitionBy still creates the root) —
    fall back to an empty frame instead of failing schema inference."""
    if not os.path.exists(path):
        return spark.createDataFrame([], schema)
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], schema)


def cluster_labels(spark: SparkSession, store_root: str) -> DataFrame:
    """(id, cluster, role) from the settled stores — cores from the
    latest label generation, borders resolved by a label join (adds
    whose id is not core), noise = everything else."""
    gen = _latest_gen(f"{store_root}/labels")
    labels = (
        spark.read.parquet(f"{store_root}/labels/gen={gen}")
        if gen is not None
        else spark.createDataFrame([], _EMPTY_LABELS)
    )
    points = _read_or_empty(spark, f"{store_root}/points", "id long, plat long, plon long")
    border = _read_or_empty(spark, f"{store_root}/border", "id long, core_id long")
    core_out = labels.select(F.col("node").alias("id"), F.col("comp").alias("cluster"), F.lit("core").alias("role"))
    border_out = (
        border.join(labels.select(F.col("node").alias("id")), "id", "left_anti")  # promoted ids drop out
        .join(labels.withColumnRenamed("node", "core_id"), "core_id")
        .groupBy("id")
        .agg(F.min("comp").alias("cluster"))
        .withColumn("role", F.lit("border"))
    )
    rest = (
        points.select("id")
        .join(core_out.select("id"), "id", "left_anti")
        .join(border_out.select("id"), "id", "left_anti")
        .select("id", F.lit(-1).cast("long").alias("cluster"), F.lit("noise").alias("role"))
    )
    return core_out.unionByName(border_out).unionByName(rest)


def process_cluster_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_root: str,
    eps_e6: int,
    min_pts: int = 4,
    n_buckets: int = 16,
    id_col: str = "id",
    lat_e6_col: str = "lat_e6",
    lon_e6_col: str = "lon_e6",
) -> None:
    """Fold one micro-batch into the stores (foreachBatch body). Store
    READS are pruned to the buckets of the batch's ring-2 cells; the
    distance work is new×slice plus promoted neighbourhoods, exactly the
    batch increment's contract."""
    if os.path.exists(f"{store_root}/_compact"):
        raise RuntimeError(
            f"{store_root}: compaction markers present — a crashed "
            "compact_cluster_store may have left folded rows twice; run "
            "compact_cluster_store() to recover before streaming resumes"
        )
    level = _level_for_eps(int(eps_e6))
    eps2 = int(eps_e6) * int(eps_e6)

    new = _indexed(batch_df, level, id_col, lat_e6_col, lon_e6_col).cache()
    cell = _cell_col(level)

    # touched buckets from the batch's OWN ring-2 cells (driver collect of
    # ≤ n_buckets small ints — the dedup store's contract)
    ring2 = new.select(F.explode(_ring_cells(level, 2)).alias("cell"))
    touched = sorted(
        r["b"] for r in ring2.select(_bkt(F.col("cell"), n_buckets).alias("b")).distinct().collect()
    )

    old = _read_buckets(
        spark, f"{store_root}/points", touched, "id long, plat long, plon long", batch_id
    )
    old = _indexed(old, level, "id", "plat", "plon").cache()
    inc_hist = _read_buckets(
        spark, f"{store_root}/nbinc", touched, "id long, cell long, inc long", batch_id
    )
    old_nb = inc_hist.groupBy("id").agg(F.sum("inc").alias("n_nb"))

    gen = _latest_gen(f"{store_root}/labels", before_batch=batch_id)
    prior_labels = (
        spark.read.parquet(f"{store_root}/labels/gen={gen}")
        if gen is not None
        else spark.createDataFrame([], _EMPTY_LABELS)
    )

    pairs_nn = _eps_pairs(new, new, level, eps2)
    pairs_no = _eps_pairs(new, old, level, eps2)

    # --- neighbour-count increments (append-only nbinc rows)
    inc_old = pairs_no.groupBy("id_b").agg(F.count("*").alias("inc")).withColumnRenamed("id_b", "id")
    cnt_new = (
        pairs_nn.groupBy("id").agg(F.count("*").alias("c1"))
        .join(pairs_no.groupBy("id").agg(F.count("*").alias("c2")), "id", "full")
        .select("id", (F.coalesce(F.col("c1"), F.lit(0)) + F.coalesce(F.col("c2"), F.lit(0))).alias("inc"))
    )
    new_inc = new.select("id", "plat", "plon").join(cnt_new, "id", "left").select(
        "id", F.coalesce(F.col("inc"), F.lit(0)).alias("inc"), "plat", "plon"
    )
    inc_rows = (
        old.select("id", "plat", "plon").join(inc_old, "id").select("id", "inc", "plat", "plon")
        .unionByName(new_inc)
        .withColumn("cell", cell)
        .select("id", "cell", "inc", _bkt(F.col("cell"), n_buckets).alias("bkt"), F.lit(batch_id).alias("batch_id"))
    )

    # --- core sets
    old_total = old_nb.join(inc_old.withColumnRenamed("inc", "d"), "id", "left").select(
        "id", (F.col("n_nb") + F.coalesce(F.col("d"), F.lit(0))).alias("n_nb")
    )
    prior_core = prior_labels.select(F.col("node").alias("id"))
    old_core_now = old_total.where(F.col("n_nb") + 1 >= min_pts).select("id")
    promoted = old_core_now.join(prior_core, "id", "left_anti")
    new_core = new_inc.where(F.col("inc") + 1 >= min_pts).select("id")
    # core ids OUTSIDE the slice stay core and keep their labels — they
    # cannot gain or lose edges this batch (they are > 2 cells from every
    # new point), so all_core for edge building only needs the slice
    slice_core = old_core_now.unionByName(new_core)

    promoted_idx = old.join(promoted, "id")
    pairs_po = _eps_pairs(promoted_idx, old, level, eps2)

    core_b = slice_core.withColumnRenamed("id", "id_b")
    delta_edges = (
        pairs_nn.join(new_core, "id").join(core_b, "id_b")
        .unionByName(pairs_no.join(new_core, "id").join(core_b, "id_b"))
        .unionByName(
            pairs_no.select(F.col("id_b").alias("id"), F.col("id").alias("id_b"))
            .join(slice_core, "id")
            .join(new_core.withColumnRenamed("id", "id_b"), "id_b")
        )
        .unionByName(pairs_po.join(promoted, "id").join(core_b, "id_b"))
        .select(F.col("id").alias("src"), F.col("id_b").alias("dst"))
    )
    all_core_nodes = prior_core.unionByName(slice_core).distinct().withColumnRenamed("id", "node")
    labels2 = incremental_components(delta_edges, prior_labels, nodes=all_core_nodes)

    # --- border-edge ADDS (bucketed by the border point's cell)
    noncore_new = new_inc.where(F.col("inc") + 1 < min_pts).select("id")
    noncore_old = old_total.where(F.col("n_nb") + 1 < min_pts).select("id")
    add_edges = (
        pairs_nn.join(noncore_new, "id").join(new_core.withColumnRenamed("id", "id_b"), "id_b")
        .unionByName(pairs_no.join(noncore_new, "id").join(old_core_now.withColumnRenamed("id", "id_b"), "id_b"))
        .unionByName(
            pairs_no.select(F.col("id_b").alias("id"), F.col("id").alias("id_b"))
            .join(noncore_old, "id")
            .join(new_core.withColumnRenamed("id", "id_b"), "id_b")
        )
        .unionByName(
            pairs_po.select(F.col("id_b").alias("id"), F.col("id").alias("id_b"))
            .join(noncore_old, "id")
            .join(promoted.withColumnRenamed("id", "id_b"), "id_b")
        )
        .select("id", F.col("id_b").alias("core_id"))
        .distinct()
    )
    border_rows = (
        add_edges.join(new.select("id", "plat", "plon").unionByName(old.select("id", "plat", "plon")), "id")
        .withColumn("cell", cell)
        .select("id", "core_id", _bkt(F.col("cell"), n_buckets).alias("bkt"), F.lit(batch_id).alias("batch_id"))
    )

    # --- writes, all keyed by batch_id (idempotent on replay). The
    # overwrite mode rides on each WRITE as an option, NOT session conf:
    # inside streaming foreachBatch the batch executes on a CLONED
    # session whose conf was snapshotted at stream start, so a runtime
    # spark.conf.set never reaches it — with the session default
    # (static) a partitioned overwrite then wipes every PRIOR batch's
    # partitions (observed: only the last micro-batch's points
    # survived the runner's stream; the direct-call tests never clone).
    (
        new.select("id", "plat", "plon")
        .withColumn("cell", cell)
        .select("id", "plat", "plon", _bkt(F.col("cell"), n_buckets).alias("bkt"), F.lit(batch_id).alias("batch_id"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bkt", "batch_id")
        .parquet(f"{store_root}/points")
    )
    (
        inc_rows.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bkt", "batch_id")
        .parquet(f"{store_root}/nbinc")
    )
    (
        border_rows.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bkt", "batch_id")
        .parquet(f"{store_root}/border")
    )
    labels2.write.mode("overwrite").parquet(f"{store_root}/labels/gen={batch_id}")
    new.unpersist()
    old.unpersist()


def streaming_clusters(
    spark: SparkSession,
    source_dir: str,
    schema,
    store_root: str,
    eps_e6: int,
    min_pts: int = 4,
    n_buckets: int = 16,
    **kwargs,
):
    """readStream over a point directory → foreachBatch incremental
    clustering (process_cluster_batch). Returns the started
    StreamingQuery; run with trigger(availableNow=True) +
    awaitTermination for the settled result, then read
    cluster_labels(spark, store_root)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            lambda b, bid: process_cluster_batch(
                spark, b, bid, store_root, eps_e6, min_pts, n_buckets=n_buckets, **kwargs
            )
        )
        .option("checkpointLocation", os.path.join(store_root, "_stream_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


# --------------------------------------------------------- store compaction

_CLUSTER_SUBS = ("points", "nbinc", "border")


def _cdelete_batch_dirs(fs, root, ids: set[int]) -> None:
    for sub in _CLUSTER_SUBS:
        sroot = root.suffix(f"/{sub}")
        if not fs.exists(sroot):
            continue
        for bk in fs.listStatus(sroot):
            if not bk.getPath().getName().startswith("bkt="):
                continue
            for i in ids:
                fs.delete(bk.getPath().suffix(f"/batch_id={int(i)}"), True)


def _cstore_batch_ids(fs, root) -> set[int]:
    ids: set[int] = set()
    if not fs.exists(root):
        return ids
    for bk in fs.listStatus(root):
        if not bk.getPath().getName().startswith("bkt="):
            continue
        for st in fs.listStatus(bk.getPath()):
            name = st.getPath().getName()
            if name.startswith("batch_id="):
                ids.add(int(name.split("=", 1)[1]))
    return ids


def compact_cluster_store(
    spark: SparkSession, store_root: str, keep_batches: int = 1
) -> int:
    """Fold settled batches of the points/nbinc/border stores into one
    consolidated GENERATION (batch_id = -g), the dedup store's contract
    (streaming/dedup.compact_store) applied to the cluster stores — a
    bucket's child count stays ~(1 + keep_batches) instead of growing
    one dir per micro-batch forever. Returns the new generation number
    (positive), or 0 if nothing folded.

    Beyond concatenation, two folds genuinely SHRINK state:
    - nbinc: increments SUM into one row per (id, cell) — a point
      touched by a thousand batches compacts to one row;
    - border: edges whose id is now CORE are dropped outright (core
      status is monotone under insertions, so a promoted point can
      never need its border edges again), and survivors dedup.

    Label generations older than the newest two are pruned in the same
    pass (replay needs the predecessor generation only).

    Run ONLY while the stream is stopped, keep_batches ≥ 1 (replay
    exclusion needs the newest batches path-excludable; generations,
    batch_id < 0, always pass `batch_id < current`). Crash safety =
    dedup's two-phase empty-marker protocol: gen=/keep= markers before
    any write, committed after all writes, recovery rolls back (no
    committed — partial generation dropped, sources intact) or forward
    (committed — finish the deletes). process_cluster_batch refuses to
    run while markers exist."""
    if keep_batches < 1:
        raise ValueError("keep_batches must be ≥ 1 (replay exclusion contract)")
    from .dedup import _fs_and_path

    fs, root = _fs_and_path(spark, store_root)
    marker_dir = root.suffix("/_compact")

    def _fold_set(exclude_gen: int | None, keep: int) -> set[int]:
        all_ids: set[int] = set()
        for sub in _CLUSTER_SUBS:
            all_ids |= _cstore_batch_ids(fs, root.suffix(f"/{sub}"))
        stream_ids = sorted(i for i in all_ids if i >= 0)
        gens = {i for i in all_ids if i < 0} - {exclude_gen}
        return gens | set(stream_ids[: max(0, len(stream_ids) - keep)])

    if fs.exists(marker_dir):
        names = {st.getPath().getName() for st in fs.listStatus(marker_dir)}
        stale_gen = next((int(n.split("=", 1)[1]) for n in names if n.startswith("gen=")), None)
        stale_keep = next((int(n.split("=", 1)[1]) for n in names if n.startswith("keep=")), None)
        if "committed" in names and stale_gen is not None and stale_keep is not None:
            _cdelete_batch_dirs(fs, root, _fold_set(stale_gen, stale_keep))
        elif stale_gen is not None:
            _cdelete_batch_dirs(fs, root, {stale_gen})
        fs.delete(marker_dir, True)

    fold = _fold_set(None, keep_batches)
    gen_only = {i for i in fold if i < 0}
    if not fold or (fold == gen_only and len(gen_only) <= 1):
        return 0
    new_gen = min(gen_only, default=0) - 1

    fs.mkdirs(marker_dir.suffix(f"/gen={new_gen}"))
    fs.mkdirs(marker_dir.suffix(f"/keep={int(keep_batches)}"))
    fold_pred = F.col("batch_id").isin([int(i) for i in fold])

    gen = _latest_gen(f"{store_root}/labels")
    core = (
        spark.read.parquet(f"{store_root}/labels/gen={gen}").select(F.col("node").alias("id"))
        if gen is not None
        else spark.createDataFrame([], "id long")
    )

    for sub in _CLUSTER_SUBS:
        sroot = root.suffix(f"/{sub}")
        # a store root can exist with zero bkt= children (a stream whose
        # batches produced no rows of this kind writes only _SUCCESS) —
        # nothing to fold, and a bare read would fail schema inference
        if not fs.exists(sroot) or not any(
            st.getPath().getName().startswith("bkt=") for st in fs.listStatus(sroot)
        ):
            continue
        df = (
            spark.read.option("basePath", sroot.toString())
            .parquet(sroot.toString())
            .where(fold_pred)
        )
        if sub == "nbinc":
            df = df.groupBy("bkt", "id", "cell").agg(F.sum("inc").alias("inc"))
        elif sub == "border":
            # monotone-core argument: once core, never border again
            df = df.join(core, "id", "left_anti").select("bkt", "id", "core_id").distinct()
        df = df.withColumn("batch_id", F.lit(int(new_gen)))
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bkt", "batch_id")
            .parquet(sroot.toString())
        )
    fs.mkdirs(marker_dir.suffix("/committed"))
    _cdelete_batch_dirs(fs, root, fold)
    # prune stale label generations (keep the newest two)
    lroot = root.suffix("/labels")
    if fs.exists(lroot):
        gens = sorted(
            int(st.getPath().getName().split("=", 1)[1])
            for st in fs.listStatus(lroot)
            if st.getPath().getName().startswith("gen=")
        )
        for g in gens[:-2]:
            fs.delete(lroot.suffix(f"/gen={g}"), True)
    fs.delete(marker_dir, True)
    return -new_gen
