"""Polygon measures (functions/measures.py): hand-computed fixtures for
area/centroid/perimeter incl. hole subtraction and island-in-a-lake
nesting, spherical sanity bounds, and the distributed applyInPandas twin
against the driver functions.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from osm_notes_ingestion_spark.functions.measures import (
    EARTH_R_M,
    measures_df,
    polygon_area,
    polygon_centroid,
    polygon_perimeter,
)


def _sq(lo, hi):
    return np.array([[lo, lo], [hi, lo], [hi, hi], [lo, hi]], dtype=np.float64)


def test_area_rect_hole_and_nesting():
    assert polygon_area([_sq(0, 10)]) == pytest.approx(100.0, rel=1e-12)
    # hole subtracts
    assert polygon_area([_sq(0, 10), _sq(2, 4)]) == pytest.approx(96.0, rel=1e-12)
    # island in a lake adds back (depth 2)
    assert polygon_area([_sq(0, 30), _sq(5, 25), _sq(10, 20)]) == pytest.approx(
        900 - 400 + 100, rel=1e-12
    )
    # orientation-agnostic: reversing a ring changes nothing
    assert polygon_area([_sq(0, 10)[::-1], _sq(2, 4)]) == pytest.approx(96.0, rel=1e-12)
    # diamond |x|+|y| <= r has area 2r²
    d = np.array([[-3.0, 0], [0, -3], [3, 0], [0, 3]])
    assert polygon_area([d]) == pytest.approx(18.0, rel=1e-12)


def test_centroid_and_perimeter():
    cx, cy = polygon_centroid([_sq(0, 10)])
    assert (cx, cy) == pytest.approx((5.0, 5.0), abs=1e-12)
    # off-center hole pulls the centroid away from it: 2x2 hole at (7,7)
    cx, cy = polygon_centroid([_sq(0, 10), _sq(6, 8)])
    assert (cx, cy) == pytest.approx(((100 * 5 - 4 * 7) / 96,) * 2, abs=1e-12)
    # holes contribute boundary (ST_Perimeter convention)
    assert polygon_perimeter([_sq(0, 10), _sq(2, 4)]) == pytest.approx(40 + 8, rel=1e-12)
    # degenerate zero-area feature -> vertex-mean fallback
    line = np.array([[0.0, 0.0], [2.0, 0.0]])
    assert polygon_centroid([line]) == pytest.approx((1.0, 0.0), abs=1e-12)


def test_spherical_local_metric():
    # 1°x1° at the equator ≈ (111.195 km)² within the documented ~0.3%
    # area is EXACT for straight-in-lon/lat edges: check closed forms.
    # 1°x1° at the equator: ∫cos over ±0.5° = 2 sin(0.5c)/c deg
    c = math.pi / 180.0
    eq = polygon_area([_sq(-0.5, 0.5)], spherical=True)
    one_deg_m = math.pi / 180.0 * EARTH_R_M
    assert eq == pytest.approx(one_deg_m**2 * (2 * math.sin(0.5 * c) / c), rel=1e-12)
    # mid-latitude square: ∫_{44.5}^{45.5} cos = (sin(45.5c)-sin(44.5c))/c
    sq45 = np.array([[0, 44.5], [1, 44.5], [1, 45.5], [0, 45.5]], dtype=np.float64)
    strip = (math.sin(45.5 * c) - math.sin(44.5 * c)) / c
    assert polygon_area([sq45], spherical=True) == pytest.approx(
        one_deg_m**2 * strip, rel=1e-12
    )
    assert strip == pytest.approx(math.cos(math.radians(45.0)), rel=1e-4)
    # perimeter: equatorial 1°x1° square ≈ 4 * 111.195 km (lat edges exact,
    # lon edges cos-scaled ~1)
    p = polygon_perimeter([_sq(-0.5, 0.5)], spherical=True)
    assert p == pytest.approx(4 * one_deg_m, rel=3e-3)


def test_measures_df_matches_driver(spark):
    from osm_notes_ingestion_spark.sources.polygons import ring_rows_df
    from osm_notes_ingestion_spark.sources.synth import world_polygons

    polys = world_polygons()
    rows = ring_rows_df(spark, polys, densify_bands=False)
    got = {r["country_id"]: r for r in measures_df(spark, rows).collect()}
    assert set(got) == {p["country_id"] for p in polys}
    for p in polys:
        rings = [np.asarray(r, dtype=np.float64) for r in p["rings"]]
        r = got[p["country_id"]]
        assert r["area"] == pytest.approx(polygon_area(rings), rel=1e-12)
        assert r["perimeter"] == pytest.approx(polygon_perimeter(rings), rel=1e-12)
        cx, cy = polygon_centroid(rings)
        assert (r["centroid_lon"], r["centroid_lat"]) == pytest.approx((cx, cy), abs=1e-9)
    # Holey's hole must subtract: strictly less than its outer rect alone
    holey = next(p for p in polys if p["country_id"] == 4)
    outer_only = polygon_area([np.asarray(holey["rings"][0])])
    assert got[4]["area"] < outer_only


def test_centroid_antimeridian_and_full_band():
    # Wrapland-style split multipolygon: parts at 170..180 and -180..-170,
    # lat -30..10 — true centroid sits ON the antimeridian, not at lon 0
    w = [
        np.array([[170.0, -30], [180, -30], [180, 10], [170, 10]]),
        np.array([[-180.0, -30], [-170, -30], [-170, 10], [-180, 10]]),
    ]
    cx, cy = polygon_centroid(w)
    assert abs(abs(cx) - 180.0) < 1e-9 and cy == pytest.approx(-10.0, abs=1e-9)
    # asymmetric masses: 170..180 (10 wide) + -180..-160 (20 wide) ->
    # shifted frame 170..200, centroid at weighted mean of 175 and 190
    w2 = [
        np.array([[170.0, 0], [180, 0], [180, 10], [170, 10]]),
        np.array([[-180.0, 0], [-160, 0], [-160, 10], [-180, 10]]),
    ]
    cx, cy = polygon_centroid(w2)
    assert cx == pytest.approx((10 * 175 + 20 * 190) / 30 - 360.0, abs=1e-9)
    # full-longitude polar band: no frame shrinks it; planar fallback, no
    # recursion, lat centroid correct
    band = np.array([[-180.0, 80], [180, 80], [180, 90], [-180, 90]])
    cx, cy = polygon_centroid([band])
    assert cy == pytest.approx(85.0, abs=1e-9)
    # regression: the synthetic Wrapland's halves are GROWN by a seam
    # epsilon, so after the shift they overlap by ~1µdeg — a
    # shifted-frame depth test misread one half as the other's hole
    # (total mass ~0, centroid exploded to ±1e15); depths must come from
    # the original frame
    from osm_notes_ingestion_spark.sources.synth import world_polygons

    wrapland = next(p for p in world_polygons() if p["country_id"] == 5)
    cx, cy = polygon_centroid([np.asarray(r, dtype=np.float64) for r in wrapland["rings"]])
    assert abs(abs(cx) - 180.0) < 1e-5 and cy == pytest.approx(-10.0, abs=1e-5)
