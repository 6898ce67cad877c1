"""nearest_polygon — the maritime/ocean-point fallback (operators/nearest.py).

Pinned against an INDEPENDENT brute-force oracle (plain Python loops, no
pruning, no shared kernel code) on seeded random points, plus hand cases:
longitude wrap, hole interiors, the max_d2 cap, and the cid tie-break.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from osm_notes_ingestion_spark.functions.geometry import PolygonPack
from osm_notes_ingestion_spark.operators.nearest import (
    _segment_pack,
    nearest_polygon,
    nearest_polygon_kernel,
)
from osm_notes_ingestion_spark.sources.synth import world_polygons

SHIFTS = (-360_000_000.0, 0.0, 360_000_000.0)


def _brute(lon_e6: int, lat_e6: int, polys_dicts):
    """Independent reference: per polygon, min over every ring wraparound
    segment and lon shift of the clamped-projection distance; floored;
    argmin with ascending-cid tie-break."""
    best, best_cid = None, -1
    for p in sorted(polys_dicts, key=lambda p: p["country_id"]):
        d = math.inf
        for ring in p["rings"]:
            v = np.asarray(ring, dtype=np.float64) * 1e6
            n = len(v)
            for i in range(n):
                ax, ay = v[i]
                bx, by = v[(i + 1) % n]
                if ax == bx and ay == by:
                    continue
                for s in SHIFTS:
                    px, py = float(lon_e6) + s, float(lat_e6)
                    vx, vy = bx - ax, by - ay
                    wx, wy = px - ax, py - ay
                    t = min(max((wx * vx + wy * vy) / (vx * vx + vy * vy), 0.0), 1.0)
                    dx, dy = wx - t * vx, wy - t * vy
                    d = min(d, dx * dx + dy * dy)
        fd = math.floor(d)
        if best is None or fd < best:
            best, best_cid = fd, p["country_id"]
    return best_cid, best


@pytest.fixture(scope="module")
def pack():
    return PolygonPack.build(world_polygons())


def test_kernel_matches_brute_force_random(pack):
    rng = np.random.default_rng(42)
    lon = rng.integers(-180_000_000, 180_000_001, size=400)
    lat = rng.integers(-90_000_000, 90_000_001, size=400)
    cid, d2 = nearest_polygon_kernel(lon, lat, _segment_pack(pack))
    world = world_polygons()
    for i in range(len(lon)):
        bcid, bd2 = _brute(int(lon[i]), int(lat[i]), world)
        assert (cid[i], d2[i]) == (bcid, bd2), (lon[i], lat[i])


def test_wrap_hole_and_interior_cases(pack):
    polys = _segment_pack(pack)
    # point just west of the antimeridian, above Wrapland's lat band:
    # nearest boundary is Wrapland's top edge (~5° away), reachable on
    # both sides of ±180 — wrap must not inflate it to a ~350° trip
    cid, d2 = nearest_polygon_kernel(
        np.array([179_500_000]), np.array([15_000_000]), polys
    )
    assert cid[0] == 5
    assert d2[0] < (6_000_000) ** 2
    # inside Holey's hole: not contained (even-odd), nearest solid point
    # is on the hole ring ~5° away — must assign Holey, not a neighbour
    cid, d2 = nearest_polygon_kernel(
        np.array([-45_000_000]), np.array([-35_000_000]), polys
    )
    assert cid[0] == 4
    assert abs(math.sqrt(d2[0]) - 5_000_000) < 10
    # interior of Hotland: the metric is distance to the BOUNDARY (the
    # operator contract feeds only unmatched points, for which boundary
    # distance == solid distance); nearest edge is the top one, 9° +
    # the half-µdeg ring grow away -> floor((9e6 + 0.5)^2)
    cid, d2 = nearest_polygon_kernel(
        np.array([-100_000_000]), np.array([40_000_000]), polys
    )
    assert cid[0] == 1 and d2[0] == 81_000_009_000_000


def test_max_d2_cap_and_tie_break(pack):
    polys = _segment_pack(pack)
    # mid-ocean point: with a tiny cap nothing qualifies -> (-1, -1)
    cid, d2 = nearest_polygon_kernel(
        np.array([120_000_000]), np.array([-60_000_000]), polys, max_d2=10_000
    )
    assert cid[0] == -1 and d2[0] == -1
    # equidistant tie: Hotland EEZ right edge is at lon -55-eps, Holey
    # left edge at lon -60-eps... construct a synthetic two-poly tie
    # instead: two unit squares flanking the point symmetrically
    twin = PolygonPack.build(
        [
            {"country_id": 11, "priority": 1, "rings": [np.array([[10.0, 0], [11, 0], [11, 1], [10, 1]])]},
            {"country_id": 10, "priority": 1, "rings": [np.array([[-11.0, 0], [-10, 0], [-10, 1], [-11, 1]])]},
        ]
    )
    cid, d2 = nearest_polygon_kernel(
        np.array([0]), np.array([500_000]), _segment_pack(twin)
    )
    assert cid[0] == 10  # equal floored d2 -> smaller country_id wins


def test_spark_operator_matches_kernel(spark, pack):
    rng = np.random.default_rng(7)
    rows = [
        (i, int(rng.integers(-90_000_000, 90_000_001)), int(rng.integers(-180_000_000, 180_000_001)))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, lat_e6 long, lon_e6 long")
    got = {
        r["id"]: (r["nearest_country_id"], r["nearest_d2"])
        for r in nearest_polygon(spark, df, pack).collect()
    }
    polys = _segment_pack(pack)
    lat = np.array([r[1] for r in rows], dtype=np.int64)
    lon = np.array([r[2] for r in rows], dtype=np.int64)
    cid, d2 = nearest_polygon_kernel(lon, lat, polys)
    for i, r in enumerate(rows):
        assert got[r[0]] == (cid[i], d2[i])
    # passthrough: input columns survive
    out_cols = nearest_polygon(spark, df, pack).columns
    assert out_cols == ["id", "lat_e6", "lon_e6", "nearest_country_id", "nearest_d2"]
