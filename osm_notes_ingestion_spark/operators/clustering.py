"""Grid-density point clustering — a deterministic DBSCAN variant.

No reference counterpart (the reference's densest analog is its zone
triage, which PARTITIONS space; this op CLUSTERS the points themselves
— "where are the page-coordinate hotspots"). Semantics are therefore
pinned by an independent brute-force oracle (tests/test_clustering.py),
like the other beyond-reference ops (overlap_audit, sampling).

Spec (DBSCAN with the order-dependence removed):
- metric: the engine's pinned planar µdeg metric (knn's): squared
  microdegree distance with longitude wrap;
- CORE point: ≥ min_pts points within eps of it (count includes self);
- clusters: connected components of the core-core graph (edges = core
  pairs within eps); label = MIN point id in the component (the CC
  operator's canonical label);
- BORDER point: non-core within eps of ≥1 core — joins the SMALLEST
  label among its core neighbours (classic DBSCAN assigns border points
  to whichever cluster scanned them first; min-label is the
  deterministic version, so results are reproducible across partition
  counts and engines);
- NOISE: everything else, cluster = -1.

Scale design: candidate pairs come from an equi-join on eps-sized
geocells — each point joins the 3x3 ring of its cell (a pure-JVM
array/explode, 9 rows per point, no Python), so two points within eps
always share a ring cell (the level is chosen so the cell's SHORT side
≥ eps) and the exact distance filter runs map-side after the join. One
shuffle for the pair join, then the aggregations and the CC rounds
(operators/components.py — the published large-star/small-star
MapReduce algorithm, no driver graph state). Per-cell cost is bounded
by physical point density at eps resolution; a pathologically hot cell
(the USA/Germany skew the north rule names) is an AQE-splittable
equi-join key, and eps is typically small (city-block scale) precisely
where density is high. Noise points never enter the CC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import LEVEL_SHIFT, Y_SHIFT
from .components import connected_components


def _level_for_eps(eps_e6: int) -> int:
    """Deepest level whose cell SHORT side (lat extent, 180e6/2^level
    µdeg) still covers eps — then any two points within eps differ by
    ≤1 cell index per axis, so the 3x3 ring is a complete candidate
    cover. Capped at 29 (the encoding's index width)."""
    level = 0
    while level < 29 and (180_000_000 >> (level + 1)) >= eps_e6:
        level += 1
    return level


def _wrap_d2(alat, alon, blat, blon):
    dlon = F.abs(alon - blon)
    dlon = F.least(dlon, F.lit(360_000_000) - dlon)
    dlat = alat - blat
    return dlat * dlat + dlon * dlon


def grid_cluster(
    points: DataFrame,
    eps_e6: int,
    min_pts: int = 4,
    id_col: str = "id",
    lat_e6_col: str = "lat_e6",
    lon_e6_col: str = "lon_e6",
) -> DataFrame:
    """→ (id, cluster, role) — cluster = min point id in the cluster, -1
    for noise; role ∈ {'core','border','noise'}. See module spec."""
    level = _level_for_eps(int(eps_e6))
    n = 1 << level
    eps2 = int(eps_e6) * int(eps_e6)

    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_e6_col).cast("long").alias("plat"),
        F.col(lon_e6_col).cast("long").alias("plon"),
    )
    # JVM cell index straight from the integer µdeg coords (floor division
    # is exact — no float in the partitioning path)
    x = F.floor((F.col("plon") + F.lit(180_000_000)) * F.lit(n) / F.lit(360_000_000))
    y = F.floor((F.col("plat") + F.lit(90_000_000)) * F.lit(n) / F.lit(180_000_000))
    x = F.least(F.greatest(x, F.lit(0)), F.lit(n - 1))
    y = F.least(F.greatest(y, F.lit(0)), F.lit(n - 1))
    pts = pts.withColumn("cx", x.cast("long")).withColumn("cy", y.cast("long"))

    def cell_of(cx, cy):
        return (
            F.lit(level).cast("long") * F.lit(1 << LEVEL_SHIFT).cast("long")
            + cy * F.lit(1 << Y_SHIFT).cast("long")
            + cx
        )

    # build side: each point under its own cell (the join key)
    right = pts.select(
        F.col("id").alias("id_b"),
        F.col("plat").alias("blat"),
        F.col("plon").alias("blon"),
        cell_of(F.col("cx"), F.col("cy")).alias("cell"),
    )
    # probe side: each point exploded to its 3x3 ring (lon wraps via pmod,
    # lat rows outside [0, n-1] dropped via array_compact — no pole dups)
    ring = F.array_compact(
        F.array(
            *[
                F.when(
                    (F.col("cy") + F.lit(dy) >= 0) & (F.col("cy") + F.lit(dy) <= n - 1),
                    cell_of(
                        F.pmod(F.col("cx") + F.lit(dx), F.lit(n)).cast("long"),
                        F.col("cy") + F.lit(dy),
                    ),
                )
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    )
    left = pts.select(
        "id", "plat", "plon", F.explode(ring).alias("cell")
    )

    pairs = (
        left.join(right, "cell")
        .where(
            (F.col("id") != F.col("id_b"))
            & (_wrap_d2(F.col("plat"), F.col("plon"), F.col("blat"), F.col("blon")) <= F.lit(eps2))
        )
        # a pair can meet in up to 2 ring cells when lon wraps at small n;
        # distinct keeps neighbor COUNTS exact
        .select("id", "id_b")
        .distinct()
    )

    counts = pairs.groupBy("id").agg(F.count("*").alias("n_nb"))
    flags = pts.select("id").join(counts, "id", "left").select(
        "id", (F.coalesce(F.col("n_nb"), F.lit(0)) + 1 >= min_pts).alias("is_core")
    )

    core_ids = flags.where("is_core").select("id")
    core_edges = (
        pairs.join(core_ids.withColumnRenamed("id", "id_b"), "id_b")
        .join(core_ids, "id")
        .select(F.col("id").alias("src"), F.col("id_b").alias("dst"))
    )
    labels = connected_components(core_edges, nodes=core_ids.withColumnRenamed("id", "node"))

    core_out = (
        core_ids.join(labels, core_ids["id"] == labels["node"])
        .select("id", F.col("comp").alias("cluster"), F.lit("core").alias("role"))
    )
    # border: non-core with ≥1 core neighbour → smallest core-neighbour label
    border_out = (
        pairs.join(flags.where(~F.col("is_core")).select("id"), "id")
        .join(labels.withColumnRenamed("node", "id_b"), "id_b")
        .groupBy("id")
        .agg(F.min("comp").alias("cluster"))
        .withColumn("role", F.lit("border"))
    )
    rest = (
        pts.select("id")
        .join(core_out.select("id"), "id", "left_anti")
        .join(border_out.select("id"), "id", "left_anti")
        .select("id", F.lit(-1).cast("long").alias("cluster"), F.lit("noise").alias("role"))
    )
    return core_out.unionByName(border_out).unionByName(rest)
