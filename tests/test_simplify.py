"""Douglas-Peucker ring simplification: the tol guarantee, idempotence,
and the opt-in prep_polygons hook (assignment drift bounded by tol)."""

from __future__ import annotations

import numpy as np
import pytest

from osm_notes_ingestion_spark.functions.geometry import (
    _point_segment_dist,
    simplify_polys,
    simplify_ring,
)


def _max_deviation(original: np.ndarray, simplified: np.ndarray) -> float:
    """Max distance from any original vertex to the simplified ring's
    nearest edge (closing edge included) — the DP bound under test."""
    m = len(simplified)
    best = np.full(len(original), np.inf)
    for i in range(m):
        a, b = simplified[i], simplified[(i + 1) % m]
        best = np.minimum(best, _point_segment_dist(original, a, b))
    return float(best.max())


def _circle(n=1000, r=1.0):
    th = np.linspace(0, 2 * np.pi, n + 1)[:-1]
    return np.c_[r * np.cos(th), r * np.sin(th)]


def test_tol_zero_removes_only_collinear():
    sq = np.array([[0, 0], [5, 0], [10, 0], [10, 10], [0, 10]], float)
    out = simplify_ring(sq, 0.0)
    assert out.tolist() == [[0, 0], [10, 0], [10, 10], [0, 10]]


def test_square_survives_any_tol():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    assert simplify_ring(sq, 100.0).shape[0] >= 2  # extremes kept


@pytest.mark.parametrize("tol", [0.001, 0.01, 0.05, 0.2])
def test_deviation_bound(tol):
    ring = _circle()
    out = simplify_ring(ring, tol)
    assert len(out) < len(ring)
    assert _max_deviation(ring, out) <= tol + 1e-12


def test_vertex_count_monotone_in_tol():
    ring = _circle()
    ns = [len(simplify_ring(ring, t)) for t in (0.001, 0.01, 0.05, 0.2)]
    assert ns == sorted(ns, reverse=True)


def test_idempotent():
    ring = _circle(500)
    once = simplify_ring(ring, 0.03)
    twice = simplify_ring(once, 0.03)
    assert np.array_equal(once, twice)


def test_simplify_polys_drops_collapsed_rings():
    polys = [
        {
            "country_id": 1,
            "rings": [
                _circle(200, r=10.0),  # survives
                _circle(50, r=0.001),  # collapses below 3 vertices at tol
            ],
        },
        {"country_id": 2, "rings": [_circle(50, r=0.001)]},  # fully dropped
    ]
    out = simplify_polys(polys, tol=0.01)
    assert [p["country_id"] for p in out] == [1]
    assert len(out[0]["rings"]) == 1


def test_prep_polygons_simplified_assignment_drift_bounded(spark):
    """PIP against the simplified dimension may differ from full-res only
    for points within tol of a boundary."""
    from osm_notes_ingestion_spark.functions.geometry import (
        PolygonPack,
        points_in_rings,
    )
    from osm_notes_ingestion_spark.sources.polygons import prep_polygons

    tol = 0.05
    poly = {"country_id": 1, "priority": 0, "name": "c", "rings": [_circle(800, r=5.0)]}
    full = prep_polygons([poly], level=7)
    simp = prep_polygons([poly], level=7, simplify_tol=tol)
    assert len(simp.pack.vertices) < len(full.pack.vertices) / 5

    rng = np.random.default_rng(3)
    lon = rng.uniform(-6, 6, 4000)
    lat = rng.uniform(-6, 6, 4000)
    in_full = points_in_rings(lon, lat, full.pack.rings_of(0))
    in_simp = points_in_rings(lon, lat, simp.pack.rings_of(0))
    disagree = in_full != in_simp
    # all disagreements sit in the tol-band around the circle boundary
    r = np.hypot(lon[disagree], lat[disagree])
    assert np.all(np.abs(r - 5.0) <= tol + 1e-9)
    # and agreement holds for the overwhelming majority
    assert disagree.mean() < 0.02
