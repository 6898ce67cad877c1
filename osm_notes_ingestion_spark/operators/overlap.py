"""Polygon×polygon intersects join + boundary-overlap audit.

The engine's other spatial joins are point×polygon (assignment). This
module closes the polygon×polygon gap: which boundary pairs OVERLAP
(open-interior intersection, shared-area claims) — the QA question
behind the reference's hand-tuned priority zones. The reference resolves
overlapping admin/maritime claims with a 24-zone priority grid
(sql/functionsProcess_31_organizeAreas_2DGrid.sql) and prefilters
re-assignment with envelope ST_Intersects
(bin/process/updateCountries.sh:278); the priority table exists BECAUSE
boundary polygons overlap. `overlap_audit` discovers those pairs from
the geometry alone, so a priority table can be validated (or generated)
instead of hand-maintained.

Semantics (pinned): a pair matches iff the polygons' OPEN INTERIORS
intersect — i.e. they share positive area. Neighbors that only share a
border edge or touch at a corner do NOT match. This is deliberately the
complement of the engine's boundary-excluded ST_Contains convention
(functions/geometry.points_in_rings): adjacent admin-0 countries share
edges everywhere, and an audit that flagged every legal border would be
useless.

Join plan (100-TB shape, same skeleton as the point path):

1. Build each side's exact quadtree cell cover once at prep time
   (functions/geometry.cover_polygon — FULL cells are *proved* interior,
   PARTIAL cells exactly touch the boundary, OUTSIDE cells provably
   disjoint). Covers are tiny relative to the fact side (10^4–10^6
   rows); point-in-polygon facts never enter this join.
2. Candidate pairs = cover⋈cover equi-join on the cell id (broadcast the
   smaller cover). Lossless: if two interiors share a point p, p's cell
   is in both covers. No cartesian, no shuffle beyond the one equi-join.
3. JVM-side proof shortcut: a shared cell FULL on BOTH sides proves the
   open cell ⊆ A∩B → overlap, no Python. For genuinely overlapping
   admin claims this resolves the bulk of pairs.
4. Only unproven candidate pairs (boundary-adjacent covers) pay for an
   exact vectorized refine (`interiors_intersect`) in an Arrow batch
   UDF over the broadcast ring packs — the same broadcast-pack pattern
   as operators/spatial_join.py.

Exactness caveat (documented, tested): `interiors_intersect` decides via
(a) proper boundary crossing, (b) a hole-aware interior representative
point of each polygon tested strictly-inside the other, (c) any vertex
of one strictly inside the other. This is exact for all valid inputs
except adversarial measure-zero configurations where EVERY boundary
crossing is degenerate (collinear overlap / vertex-through-vertex) AND
every probe point lands exactly on a boundary. Shared-edge neighbors,
corner-touches, nested, identical, and hole-nested polygons are all
decided correctly (tests/test_overlap.py pins each).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.geometry import PolygonPack, cover_polygon, points_in_rings

__all__ = [
    "interiors_intersect",
    "interior_point",
    "polygon_intersects_join",
    "overlap_audit",
]


def _edges(rings: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All ring edges as flat (x1, y1, x2, y2) arrays (closing edge included)."""
    x1 = np.concatenate([r[:, 0] for r in rings])
    y1 = np.concatenate([r[:, 1] for r in rings])
    x2 = np.concatenate([np.roll(r[:, 0], -1) for r in rings])
    y2 = np.concatenate([np.roll(r[:, 1], -1) for r in rings])
    return x1, y1, x2, y2


def _proper_crossing(ringsA: list[np.ndarray], ringsB: list[np.ndarray]) -> bool:
    """True iff some edge of A PROPERLY crosses some edge of B (strict
    orientation signs; collinear overlaps and endpoint touches excluded).

    Vectorized A-edges × B-edges with a bbox prefilter, blocked over A
    edges so the temporary stays bounded for big admin shapes.
    """
    ax1, ay1, ax2, ay2 = _edges(ringsA)
    bx1, by1, bx2, by2 = _edges(ringsB)
    # per-edge bboxes for the prefilter
    alo_x, ahi_x = np.minimum(ax1, ax2), np.maximum(ax1, ax2)
    alo_y, ahi_y = np.minimum(ay1, ay2), np.maximum(ay1, ay2)
    blo_x, bhi_x = np.minimum(bx1, bx2), np.maximum(bx1, bx2)
    blo_y, bhi_y = np.minimum(by1, by2), np.maximum(by1, by2)

    BLOCK = 512
    for s in range(0, len(ax1), BLOCK):
        e = s + BLOCK
        # bbox overlap mask: (block, Eb)
        m = (
            (alo_x[s:e, None] <= bhi_x[None, :])
            & (ahi_x[s:e, None] >= blo_x[None, :])
            & (alo_y[s:e, None] <= bhi_y[None, :])
            & (ahi_y[s:e, None] >= blo_y[None, :])
        )
        if not m.any():
            continue
        ai, bi = np.nonzero(m)
        p1x, p1y = ax1[s:e][ai], ay1[s:e][ai]
        p2x, p2y = ax2[s:e][ai], ay2[s:e][ai]
        q1x, q1y = bx1[bi], by1[bi]
        q2x, q2y = bx2[bi], by2[bi]
        dqx, dqy = q2x - q1x, q2y - q1y
        dpx, dpy = p2x - p1x, p2y - p1y
        d1 = dqx * (p1y - q1y) - dqy * (p1x - q1x)
        d2 = dqx * (p2y - q1y) - dqy * (p2x - q1x)
        d3 = dpx * (q1y - p1y) - dpy * (q1x - p1x)
        d4 = dpx * (q2y - p1y) - dpy * (q2x - p1x)
        # strict sign products: proper crossing only (touch/collinear → 0
        # product → excluded, matching the open-interiors contract)
        if ((d1 * d2 < 0) & (d3 * d4 < 0)).any():
            return True
    return False


def interior_point(rings: list[np.ndarray]) -> tuple[float, float] | None:
    """A representative point STRICTLY interior to the polygon, hole-aware.

    Scanline construction: pick a horizontal y* strictly between two
    distinct vertex ordinates, collect the edge crossings, and take the
    midpoint of the widest even-odd inside interval. Even-odd parity
    makes the result respect holes (a point inside a hole has even
    crossing count and is never chosen). Verified with the strict PIP
    before returning; several scanlines are tried so a degenerate first
    pick (crossing through near-tangent geometry) falls through to the
    next. Returns None only for zero-area input.
    """
    ys = np.unique(np.concatenate([r[:, 1] for r in rings]))
    if len(ys) < 2:
        return None
    # candidate scanlines: midpoints of consecutive distinct ys, tried
    # from the middle outwards (the middle slab is widest most often)
    mids = (ys[:-1] + ys[1:]) / 2.0
    order = np.argsort(np.abs(np.arange(len(mids)) - (len(mids) - 1) / 2.0))
    x1, y1, x2, y2 = _edges(rings)
    for y_star in mids[order]:
        cross = (y1 > y_star) != (y2 > y_star)
        if not cross.any():
            continue
        cx = x1[cross] + (y_star - y1[cross]) * (x2[cross] - x1[cross]) / (y2[cross] - y1[cross])
        cx.sort()
        if len(cx) < 2:
            continue
        # inside intervals are (cx[0],cx[1]), (cx[2],cx[3]), ... ; take
        # the widest so float midpoints stay clear of the walls
        widths = cx[1::2] - cx[0:-1:2] if len(cx) % 2 == 0 else cx[1::2] - cx[0 : len(cx) - 1 : 2]
        if len(widths) == 0:
            continue
        k = int(np.argmax(widths))
        px = (cx[2 * k] + cx[2 * k + 1]) / 2.0
        if points_in_rings(np.array([px]), np.array([y_star]), rings)[0]:
            return float(px), float(y_star)
    return None


def _bbox(rings: list[np.ndarray]) -> tuple[float, float, float, float]:
    return (
        min(float(r[:, 0].min()) for r in rings),
        min(float(r[:, 1].min()) for r in rings),
        max(float(r[:, 0].max()) for r in rings),
        max(float(r[:, 1].max()) for r in rings),
    )


def interiors_intersect(ringsA: list[np.ndarray], ringsB: list[np.ndarray]) -> bool:
    """True iff the polygons' open interiors intersect (share positive area).

    Decision cascade (each step exact, cheapest first):
      bbox-disjoint → False
      proper boundary crossing → True (interiors lie on both sides locally)
      interior representative of A strictly in B (or B in A) → True
      any vertex of one strictly inside the other → True
      else False (boundaries at most touch; interiors disjoint)
    """
    a_lo_x, a_lo_y, a_hi_x, a_hi_y = _bbox(ringsA)
    b_lo_x, b_lo_y, b_hi_x, b_hi_y = _bbox(ringsB)
    if a_hi_x < b_lo_x or b_hi_x < a_lo_x or a_hi_y < b_lo_y or b_hi_y < a_lo_y:
        return False
    if _proper_crossing(ringsA, ringsB):
        return True
    pa = interior_point(ringsA)
    if pa is not None and points_in_rings(np.array([pa[0]]), np.array([pa[1]]), ringsB)[0]:
        return True
    pb = interior_point(ringsB)
    if pb is not None and points_in_rings(np.array([pb[0]]), np.array([pb[1]]), ringsA)[0]:
        return True
    # vertex probes (covers a lobe of A poking into B whose representative
    # point sits elsewhere and whose crossings are all degenerate)
    va = np.concatenate([r for r in ringsA])
    if points_in_rings(va[:, 0], va[:, 1], ringsB).any():
        return True
    vb = np.concatenate([r for r in ringsB])
    return bool(points_in_rings(vb[:, 0], vb[:, 1], ringsA).any())


_COVER_SCHEMA = T.StructType(
    [
        T.StructField("cell", T.LongType(), False),
        T.StructField("pid", T.LongType(), False),
        T.StructField("full", T.BooleanType(), False),
    ]
)


def _cover_table(spark: SparkSession, polys: list[dict], level: int) -> tuple[DataFrame, int]:
    """(cover df, driver-known row count) — the count picks the broadcast
    side without firing a Spark job (covers are built driver-side)."""
    import pandas as pd

    cells, pids, fulls = [], [], []
    for p in polys:
        full, partial = cover_polygon(p["rings"], level)
        for arr, is_full in ((full, True), (partial, False)):
            cells.append(arr)
            pids.append(np.full(len(arr), p["country_id"], dtype=np.int64))
            fulls.append(np.full(len(arr), is_full, dtype=bool))
    pdf = pd.DataFrame(
        {
            "cell": np.concatenate(cells) if cells else np.zeros(0, dtype=np.int64),
            "pid": np.concatenate(pids) if pids else np.zeros(0, dtype=np.int64),
            "full": np.concatenate(fulls) if fulls else np.zeros(0, dtype=bool),
        }
    )
    return spark.createDataFrame(pdf, schema=_COVER_SCHEMA), len(pdf)


def polygon_intersects_join(
    spark: SparkSession,
    polysA: list[dict],
    polysB: list[dict],
    level: int = 7,
    self_join: bool = False,
) -> DataFrame:
    """Pairs (a_id, b_id) whose open interiors intersect.

    polysA/polysB: the engine's polygon dict shape
    ({"rings": [np.ndarray], "country_id": int, ...}, as consumed by
    sources/polygons.prep_polygons). Ids must be unique within a side.
    With `self_join`, polysB is ignored and pairs are emitted once with
    a_id < b_id.

    Scale: both covers are prep-time artifacts (the polygon DIMENSION,
    not the fact table); the candidate join is one cell equi-join with
    the smaller cover broadcast. The FULL∧FULL shortcut proves most
    genuinely-overlapping pairs JVM-side; only boundary-adjacent pairs
    reach the Arrow refine, each evaluated once (not once per shared
    cell). For a dimension too large to hold rings driver-side, feed
    covers from sources/polygons.prep_polygons_distributed and swap the
    broadcast packs for the clipped-fragment refine — same trade as
    assign_country vs assign_country_distributed.
    """
    if self_join:
        polysB = polysA
    coverA, nA = _cover_table(spark, polysA, level)
    coverA = coverA.withColumnsRenamed({"pid": "a_id", "full": "a_full"})
    coverB, nB = _cover_table(spark, polysB, level)
    coverB = coverB.withColumnsRenamed({"pid": "b_id", "full": "b_full"})
    small, big = (coverA, coverB) if nA <= nB else (coverB, coverA)
    cand = big.join(F.broadcast(small), "cell")
    if self_join:
        cand = cand.where(F.col("a_id") < F.col("b_id"))
    pairs = cand.groupBy("a_id", "b_id").agg(
        F.max(F.col("a_full") & F.col("b_full")).alias("proved")
    )

    packA = PolygonPack.build(polysA)
    packB = PolygonPack.build(polysB)
    bcA = spark.sparkContext.broadcast(packA)
    bcB = spark.sparkContext.broadcast(packB)

    def refine(batches):
        import pandas as pd

        pA = bcA.value
        pB = bcB.value
        idxA = pA.index_of_id()
        idxB = pB.index_of_id()
        for pdf in batches:
            keep = []
            for a, b in zip(pdf["a_id"].to_numpy(), pdf["b_id"].to_numpy()):
                keep.append(
                    interiors_intersect(pA.rings_of(idxA[int(a)]), pB.rings_of(idxB[int(b)]))
                )
            out = pdf.loc[np.asarray(keep, dtype=bool), ["a_id", "b_id"]]
            yield out

    out_schema = T.StructType(
        [
            T.StructField("a_id", T.LongType(), False),
            T.StructField("b_id", T.LongType(), False),
        ]
    )
    proved = pairs.where(F.col("proved")).select("a_id", "b_id")
    unproved = pairs.where(~F.col("proved")).select("a_id", "b_id")
    refined = unproved.mapInPandas(refine, schema=out_schema)
    return proved.unionByName(refined)


def overlap_audit(spark: SparkSession, polys: list[dict], level: int = 7) -> DataFrame:
    """Self-join convenience: all distinct polygon pairs (a_id < b_id)
    whose interiors overlap — the pairs a priority table must rank.
    Shared-border neighbors do not appear (open-interiors semantics)."""
    return polygon_intersects_join(spark, polys, polys, level=level, self_join=True)
