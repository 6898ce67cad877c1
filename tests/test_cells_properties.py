"""Property-based tests (hypothesis) for the numpy geometry/cell kernels,
plus numpy↔JVM twin-equality checks."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_notes_ingestion_spark.functions import cells as C
from osm_notes_ingestion_spark.functions.geometry import points_in_rings

lat_st = st.floats(min_value=-90, max_value=90, allow_nan=False)
lon_st = st.floats(min_value=-180, max_value=180, allow_nan=False)
level_st = st.integers(min_value=0, max_value=14)


@settings(max_examples=200, deadline=None)
@given(lat_st, lon_st, level_st)
def test_encode_bounds_contain_point(lat, lon, level):
    cell = int(C.encode(np.array([lat]), np.array([lon]), level)[0])
    lon_min, lat_min, lon_max, lat_max = (float(v) for v in C.cell_bounds(cell))
    # clipping at the +180/+90 edge maps the point into the last cell
    assert lat_min - 1e-9 <= min(lat, lat_max) and min(lat, 89.9999999) <= lat_max + 1e-9
    assert lon_min - 1e-9 <= min(lon, lon_max)


@settings(max_examples=200, deadline=None)
@given(lat_st, lon_st, level_st, st.integers(min_value=0, max_value=6))
def test_parent_contains_child(lat, lon, level, up):
    parent_level = max(0, level - up)
    child = int(C.encode(np.array([lat]), np.array([lon]), level)[0])
    parent = int(C.cell_to_parent(np.array([child]), parent_level)[0])
    direct = int(C.encode(np.array([lat]), np.array([lon]), parent_level)[0])
    assert parent == direct


@settings(max_examples=100, deadline=None)
@given(lat_st, lon_st, st.integers(min_value=1, max_value=8), st.integers(min_value=0, max_value=3))
def test_k_ring_contains_center_and_wraps(lat, lon, level, k):
    cell = int(C.encode(np.array([lat]), np.array([lon]), level)[0])
    ring = C.k_ring(cell, k)
    assert cell in set(ring.tolist())
    assert len(ring) <= (2 * k + 1) ** 2
    assert len(set(ring.tolist())) == len(ring)


def test_k_ring_lon_wrap_explicit():
    level = 4
    cell = int(C.encode(np.array([0.0]), np.array([-179.9]), level)[0])  # x=0
    ring = set(C.k_ring(cell, 1).tolist())
    east = int(C.encode(np.array([0.0]), np.array([179.9]), level)[0])  # x=n-1
    assert east in ring


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-170, max_value=170, allow_nan=False),
            st.floats(min_value=-80, max_value=80, allow_nan=False),
        ),
        min_size=3,
        max_size=12,
    ),
    st.tuples(
        st.floats(min_value=-170, max_value=170, allow_nan=False),
        st.floats(min_value=-80, max_value=80, allow_nan=False),
    ),
)
def test_pip_convex_hull_halfplane_oracle(points, probe):
    """Even-odd PIP on a convex hull must agree with the half-plane test."""
    from osm_notes_ingestion_spark.functions.geometry import _convex_hull

    pts = np.asarray(points, dtype=np.float64)
    hull = _convex_hull(pts)
    if len(hull) < 3:
        return
    px, py = probe
    x, y = hull[:, 0], hull[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    cross = (x2 - x) * (py - y) - (y2 - y) * (px - x)
    if np.any(np.abs(cross) < 1e-9):
        return  # on-boundary: convention undefined, skip
    halfplane = bool((cross > 0).all() or (cross < 0).all())
    evenodd = bool(points_in_rings(np.array([px]), np.array([py]), [hull])[0])
    assert evenodd == halfplane


def test_jvm_numpy_twin_equality(spark):
    """cell_col / tile cols (JVM) ≡ encode / tile_xy_np (numpy) on a grid."""
    import pandas as pd
    from pyspark.sql import functions as F

    from osm_notes_ingestion_spark.functions.cells import cell_col
    from osm_notes_ingestion_spark.functions.mercator import tile_x_col, tile_xy_np, tile_y_col

    lats = np.linspace(-89.99, 89.99, 101)
    lons = np.linspace(-179.99, 179.99, 101)
    glat, glon = np.meshgrid(lats, lons)
    pdf = pd.DataFrame({"lat": glat.ravel(), "lon": glon.ravel()})
    df = spark.createDataFrame(pdf)
    out = df.select(
        "lat",
        "lon",
        cell_col(F.col("lat"), F.col("lon"), 9).alias("cell"),
        tile_x_col(F.col("lon"), 8).alias("tx"),
        tile_y_col(F.col("lat"), 8).alias("ty"),
    ).toPandas()
    np_cell = C.encode(out["lat"].to_numpy(), out["lon"].to_numpy(), 9)
    np_x, np_y = tile_xy_np(out["lat"].to_numpy(), out["lon"].to_numpy(), 8)
    assert (out["cell"].to_numpy() == np_cell).all()
    assert (out["tx"].to_numpy() == np_x).all()
    assert (out["ty"].to_numpy() == np_y).all()
