"""Polygon×polygon overlap audit: predicate pins + join ≡ brute force.

The operator's contract has two layers, tested separately:
1. the `interiors_intersect` predicate decides curated configurations
   correctly (shared edges False, nested True, holes respected, ...);
2. the distributed join (cell-cover candidates + FULL∧FULL proof +
   Arrow refine) returns EXACTLY the brute-force all-pairs evaluation
   of that same predicate — candidate generation is lossless and the
   proof shortcut is sound.
"""

from __future__ import annotations

import numpy as np
import pytest

from osm_notes_ingestion_spark.operators.overlap import (
    interior_point,
    interiors_intersect,
    overlap_audit,
    polygon_intersects_join,
)


def rect(lo_x, lo_y, hi_x, hi_y) -> np.ndarray:
    return np.array(
        [[lo_x, lo_y], [hi_x, lo_y], [hi_x, hi_y], [lo_x, hi_y]], dtype=np.float64
    )


def diamond(cx, cy, r) -> np.ndarray:
    return np.array(
        [[cx + r, cy], [cx, cy + r], [cx - r, cy], [cx, cy - r]], dtype=np.float64
    )


# ---------------------------------------------------------------- predicate


def test_identical_squares_overlap():
    a = [rect(0, 0, 10, 10)]
    assert interiors_intersect(a, [rect(0, 0, 10, 10)])


def test_shared_edge_neighbors_do_not_overlap():
    # adjacent admin polygons share a border edge; open interiors disjoint
    assert not interiors_intersect([rect(0, 0, 10, 10)], [rect(10, 0, 20, 10)])


def test_corner_touch_does_not_overlap():
    assert not interiors_intersect([rect(0, 0, 10, 10)], [rect(10, 10, 20, 20)])


def test_partial_overlap():
    assert interiors_intersect([rect(0, 0, 10, 10)], [rect(5, 5, 15, 15)])


def test_nested():
    assert interiors_intersect([rect(0, 0, 10, 10)], [rect(2, 2, 4, 4)])
    assert interiors_intersect([rect(2, 2, 4, 4)], [rect(0, 0, 10, 10)])


def test_disjoint():
    assert not interiors_intersect([rect(0, 0, 10, 10)], [rect(20, 0, 30, 10)])


def test_plus_sign_crossing():
    # every vertex of each polygon is outside the other; only the proper
    # boundary crossings reveal the shared center area
    horiz = [rect(-10, -1, 10, 1)]
    vert = [rect(-1, -10, 1, 10)]
    assert interiors_intersect(horiz, vert)
    assert interiors_intersect(vert, horiz)


def test_hole_respected():
    # annulus = outer square minus inner hole; a polygon fully inside the
    # hole shares no interior with the annulus
    annulus = [rect(0, 0, 10, 10), rect(3, 3, 7, 7)]
    assert not interiors_intersect(annulus, [rect(4, 4, 6, 6)])
    # ... but one that spans the rim does
    assert interiors_intersect(annulus, [rect(5, 5, 9, 9)])
    # and the hole's exact filler shares only the rim boundary
    assert not interiors_intersect(annulus, [rect(3, 3, 7, 7)])


def test_notch_shared_edges_only():
    # L-shape around a notch; the notch filler touches along edges only
    ell = [
        np.array(
            [[0, 0], [10, 0], [10, 10], [5, 10], [5, 5], [0, 5]], dtype=np.float64
        )
    ]
    notch = [rect(0, 5, 5, 10)]
    assert not interiors_intersect(ell, notch)
    # shifting the filler 1 unit down overlaps the L's lower-left block
    assert interiors_intersect(ell, [rect(0, 4, 5, 9)])


def test_diamond_square_edge_cases():
    d = [diamond(0, 0, 5)]
    # square inscribed in the diamond's bbox corner, outside the diamond
    assert not interiors_intersect(d, [rect(3.1, 3.1, 5, 5)])
    assert interiors_intersect(d, [rect(-1, -1, 1, 1)])


# ------------------------------------------------------------ interior_point


@pytest.mark.parametrize(
    "rings",
    [
        [rect(0, 0, 10, 10)],
        [diamond(0, 0, 5)],
        [rect(0, 0, 10, 10), rect(3, 3, 7, 7)],  # annulus
        [np.array([[0, 0], [10, 0], [10, 10], [5, 10], [5, 5], [0, 5]], dtype=np.float64)],
    ],
)
def test_interior_point_strictly_inside(rings):
    from osm_notes_ingestion_spark.functions.geometry import points_in_rings

    pt = interior_point(rings)
    assert pt is not None
    assert points_in_rings(np.array([pt[0]]), np.array([pt[1]]), rings)[0]


def test_interior_point_zero_area():
    degenerate = [np.array([[0, 0], [1, 0]], dtype=np.float64)]
    assert interior_point(degenerate) is None


# ------------------------------------------------------------------- join


def _poly(cid: int, *rings) -> dict:
    return {"country_id": cid, "priority": 0, "name": f"p{cid}", "rings": list(rings)}


def _brute_pairs(polysA, polysB, self_join=False):
    out = set()
    for pa in polysA:
        for pb in polysB:
            if self_join and pa["country_id"] >= pb["country_id"]:
                continue
            if interiors_intersect(pa["rings"], pb["rings"]):
                out.add((pa["country_id"], pb["country_id"]))
    return out


def _random_polys(rng, n_rect, n_diamond, lo=-50.0, hi=50.0, max_side=12.0):
    polys = []
    cid = 1
    for _ in range(n_rect):
        x0 = rng.uniform(lo, hi - max_side)
        y0 = rng.uniform(lo, hi - max_side)
        w = rng.uniform(0.5, max_side)
        h = rng.uniform(0.5, max_side)
        polys.append(_poly(cid, rect(x0, y0, x0 + w, y0 + h)))
        cid += 1
    for _ in range(n_diamond):
        cx = rng.uniform(lo, hi)
        cy = rng.uniform(lo, hi)
        polys.append(_poly(cid, diamond(cx, cy, rng.uniform(0.5, max_side / 2))))
        cid += 1
    return polys


def test_audit_equals_brute_force_random(spark):
    rng = np.random.default_rng(42)
    polys = _random_polys(rng, n_rect=36, n_diamond=10)
    got = {
        (r.a_id, r.b_id)
        for r in overlap_audit(spark, polys, level=7).collect()
    }
    want = _brute_pairs(polys, polys, self_join=True)
    assert got == want
    assert len(want) > 10  # the fixture must actually exercise overlaps


def test_two_sided_join_equals_brute_force(spark):
    rng = np.random.default_rng(7)
    pa = _random_polys(rng, n_rect=14, n_diamond=4)
    pb = _random_polys(rng, n_rect=14, n_diamond=4)
    got = {
        (r.a_id, r.b_id)
        for r in polygon_intersects_join(spark, pa, pb, level=7).collect()
    }
    assert got == _brute_pairs(pa, pb)
    # symmetry: swapping sides transposes the pair set
    swapped = {
        (r.b_id, r.a_id)
        for r in polygon_intersects_join(spark, pb, pa, level=7).collect()
    }
    assert swapped == got


def test_audit_excludes_shared_border_neighbors(spark):
    # a 3×1 strip of bordering squares + one overlapping claim on top
    polys = [
        _poly(1, rect(0, 0, 10, 10)),
        _poly(2, rect(10, 0, 20, 10)),
        _poly(3, rect(20, 0, 30, 10)),
        _poly(9, rect(5, 2, 25, 8)),  # the "EEZ" claim spanning all three
    ]
    got = {(r.a_id, r.b_id) for r in overlap_audit(spark, polys, level=7).collect()}
    assert got == {(1, 9), (2, 9), (3, 9)}


def test_world_fixture_claims(spark):
    # the repo's world fixture: each EEZ overlaps its country; countries
    # themselves are mutually disjoint
    from osm_notes_ingestion_spark.sources.synth import world_polygons

    pairs = {
        (r.a_id, r.b_id) for r in overlap_audit(spark, world_polygons(), level=7).collect()
    }
    assert (1, 7) in pairs  # Hotland ⊂ Hotland EEZ
    assert (3, 8) in pairs  # Diamond ⊂ Diamond EEZ
    # no two base countries (priority ≤ 3, ids 1-6) overlap each other
    assert not any(a <= 6 and b <= 6 for a, b in pairs)


def test_join_plan_has_no_cartesian(spark):
    polys = [_poly(1, rect(0, 0, 10, 10)), _poly(2, rect(5, 5, 15, 15))]
    df = overlap_audit(spark, polys, level=6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
