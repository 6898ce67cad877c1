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


def test_bowtie_healed_by_hull():
    bowtie = np.array([[0, 0], [10, 10], [10, 0], [0, 10]], dtype=float)
    assert _ring_self_intersects(bowtie)
    out, method = repair_rings([bowtie])
    assert method == "hull"
    # healed shape contains the center (the bowtie's even-odd hole)
    assert points_in_rings(np.array([5.0]), np.array([5.0]), out)[0]


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
