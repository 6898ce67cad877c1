"""Polygon repair cascade (ST_MakeValid/Buffer(0) analog) unit tests."""

from __future__ import annotations

import numpy as np

from osm_notes_ingestion_spark.functions.geometry import (
    _convex_hull,
    _ring_self_intersects,
    points_in_rings,
    repair_rings,
)


def test_clean_ring_passes_through():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    out, method = repair_rings([sq])
    assert method == "clean"
    assert np.array_equal(out[0], sq)


def test_duplicate_vertices_removed():
    sq = np.array([[0, 0], [0, 0], [10, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    out, method = repair_rings([sq])
    assert method == "clean"
    assert len(out[0]) == 4


def test_bowtie_renodes_like_make_valid():
    """Repair must match ST_MakeValid/shapely make_valid on a bowtie:
    two triangles meeting at the crossing point — NOT the convex hull.
    Expected values precomputed with shapely 2.x:
        make_valid(Polygon([(0,0),(10,10),(10,0),(0,10)]))
        == MultiPolygon([((0,0),(5,5),(0,10)), ((10,10),(5,5),(10,0))])
    so (1,5) and (9,5) are contained, the center (5,5) is a boundary
    point of both parts (ST_Contains false), and (5,1)/(5,9) are outside
    (they'd be INSIDE the hull — the old, wrong, repair)."""
    bowtie = np.array([[0, 0], [10, 10], [10, 0], [0, 10]], dtype=float)
    assert _ring_self_intersects(bowtie)
    out, method = repair_rings([bowtie])
    assert method == "renode"
    assert len(out) == 2 and all(not _ring_self_intersects(r) for r in out)
    px = np.array([1.0, 9.0, 5.0, 5.0, 5.0])
    py = np.array([5.0, 5.0, 5.0, 1.0, 9.0])
    got = points_in_rings(px, py, out)
    assert got.tolist() == [True, True, False, False, False]


def test_renode_preserves_even_odd_parity():
    """Splitting at crossings preserves the directed-edge multiset up to
    subdivision, so even-odd coverage is EXACTLY preserved — checked on a
    pentagram (5 crossings; tips inside, center pentagon outside)."""
    ang = np.pi / 2 + 2 * np.pi * np.arange(5) * 2 / 5  # star order 0,2,4,1,3
    star = np.stack([10 * np.cos(ang), 10 * np.sin(ang)], axis=1)
    out, method = repair_rings([star])
    assert method == "renode"
    assert all(not _ring_self_intersects(r) for r in out)
    rng = np.random.RandomState(7)
    px = rng.uniform(-11, 11, 4000)
    py = rng.uniform(-11, 11, 4000)
    orig = points_in_rings(px, py, [star])
    renoded = points_in_rings(px, py, out)
    assert np.array_equal(orig, renoded)
    # spot semantics: a tip is inside, the center is NOT (parity 2)
    assert points_in_rings(np.array([0.0]), np.array([9.0]), out)[0]
    assert not points_in_rings(np.array([0.0]), np.array([0.0]), out)[0]


def test_boundary_convention_is_excluded():
    """Pinned ST_Contains semantics: on-vertex / on-horizontal-edge /
    on-vertical-edge / on-slanted-edge points are NOT contained; interior
    points are (SURVEY §7.4 risk 2)."""
    sq = [np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)]
    px = np.array([0.0, 5.0, 0.0, 10.0, 5.0, 0.5, 9.5])
    py = np.array([0.0, 0.0, 5.0, 10.0, 10.0, 0.5, 9.5])
    got = points_in_rings(px, py, sq)
    assert got.tolist() == [False, False, False, False, False, True, True]
    # slanted edge, float-exactly representable: (0.5, 0.5) on x+y=1
    diamond = [np.array([[-1, 0], [0, -1], [1, 0], [0, 1]], dtype=float)]
    assert not points_in_rings(np.array([0.5]), np.array([0.5]), diamond)[0]
    assert points_in_rings(np.array([0.25]), np.array([0.25]), diamond)[0]
    # hole boundary is boundary too: point on a hole ring is excluded
    holey = [
        np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float),
        np.array([[4, 4], [6, 4], [6, 6], [4, 6]], dtype=float),
    ]
    assert not points_in_rings(np.array([4.0]), np.array([5.0]), holey)[0]
    assert not points_in_rings(np.array([5.0]), np.array([5.0]), holey)[0]  # in hole
    assert points_in_rings(np.array([2.0]), np.array([5.0]), holey)[0]


def test_degenerate_ring_dropped():
    line = np.array([[0, 0], [5, 5], [0, 0]], dtype=float)
    out, method = repair_rings([line])
    assert method == "dropped" and out == []


def test_hull_is_convex_and_ccw():
    pts = np.array([[0, 0], [4, 0], [4, 4], [2, 2], [0, 4]], dtype=float)
    h = _convex_hull(pts)
    assert len(h) == 4  # interior point (2,2) excluded
    x, y = h[:, 0], h[:, 1]
    cross = (np.roll(x, -1) - x) * (np.roll(y, -2) - np.roll(y, -1)) - (
        np.roll(y, -1) - y
    ) * (np.roll(x, -2) - np.roll(x, -1))
    assert (cross > 0).all() or (cross < 0).all()


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(4, 10),
)
def test_renode_parity_property_random_polygons(seed, n):
    """Parity-preservation theorem, fuzzed: connect n random points in a
    random order (almost surely self-crossing); re-noding must preserve
    even-odd containment at every sample point, and every output ring
    must be simple."""
    rng = np.random.RandomState(seed)
    ring = rng.uniform(-50, 50, size=(n, 2)).round(3)
    # drop ties that make degenerate geometry trivially ambiguous
    if len(np.unique(ring, axis=0)) < n:
        return
    from osm_notes_ingestion_spark.functions.geometry import _renode_ring

    if not _ring_self_intersects(ring):
        return
    parts = _renode_ring(ring)
    if parts is None:  # split budget exhausted (pathological) → hull path
        return
    assert all(not _ring_self_intersects(r) for r in parts)
    px = rng.uniform(-55, 55, 2000)
    py = rng.uniform(-55, 55, 2000)
    orig = points_in_rings(px, py, [ring])
    renoded = points_in_rings(px, py, parts)
    # tolerate disagreement only within float slack of a boundary:
    # compare exactly — the edge multiset argument is exact up to the
    # inserted intersection points, which are computed once and shared
    assert np.array_equal(orig, renoded)
