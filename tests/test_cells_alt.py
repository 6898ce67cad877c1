"""S2-style and hex (H3-style) encoders: the three twins (numpy / JVM
Column / DuckDB SQL) must produce bit-identical cell ids, and the hex
k-ring must have the exact hexagonal-disk cardinality."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_notes_ingestion_spark.functions.cells_alt import (
    HEX_OFF,
    HEX_Q_SHIFT,
    HEX_RES_SHIFT,
    hex_cell_col,
    hex_encode,
    hex_k_ring,
    hex_sql,
    s2_cell_col,
    s2_encode,
    s2_face_uv,
    s2_sql,
)

rng = np.random.default_rng(42)
N = 4000
LATS = rng.uniform(-89.9, 89.9, N)
LONS = rng.uniform(-180.0, 180.0, N)


@pytest.fixture(scope="module")
def pts_df(spark):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"i": np.arange(N), "lat": LATS, "lon": LONS})
    )


def test_s2_three_twins_agree(spark, pts_df):
    level = 10
    want = s2_encode(LATS, LONS, level)

    got_col = (
        pts_df.withColumn("c", s2_cell_col(F.col("lat"), F.col("lon"), level))
        .orderBy("i")
        .select("c")
        .toPandas()["c"]
        .to_numpy()
    )
    assert (got_col == want).all(), "JVM Column != numpy"

    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"i": np.arange(N), "lat": LATS, "lon": LONS}))
    got_sql = con.sql(
        f"SELECT {s2_sql('lat', 'lon', level)} AS c FROM pts ORDER BY i"
    ).fetchnumpy()["c"]
    assert (got_sql == want).all(), "SQL != numpy"


def test_s2_faces_cover_sphere(spark):
    # cardinal points land on their expected cube faces
    cases = [
        ((0.0, 0.0), 0),  # +x
        ((0.0, 90.0), 1),  # +y
        ((89.9, 0.0), 2),  # +z
        ((0.0, 179.9), 3),  # -x
        ((0.0, -90.0), 4),  # -y
        ((-89.9, 0.0), 5),  # -z
    ]
    for (lat, lon), want_face in cases:
        face, u, v = s2_face_uv(np.array([lat]), np.array([lon]))
        assert face[0] == want_face, (lat, lon)
        assert -1.0001 <= u[0] <= 1.0001 and -1.0001 <= v[0] <= 1.0001


def test_hex_three_twins_agree(spark, pts_df):
    res = 6
    want = hex_encode(LATS, LONS, res)

    got_col = (
        pts_df.withColumn("c", hex_cell_col(F.col("lat"), F.col("lon"), res))
        .orderBy("i")
        .select("c")
        .toPandas()["c"]
        .to_numpy()
    )
    assert (got_col == want).all(), "JVM Column != numpy"

    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"i": np.arange(N), "lat": LATS, "lon": LONS}))
    got_sql = con.sql(
        f"SELECT {hex_sql('lat', 'lon', res)} AS c FROM pts ORDER BY i"
    ).fetchnumpy()["c"]
    assert (got_sql == want).all(), "SQL != numpy"


def test_hex_k_ring_cardinality_and_distance():
    cell = int(hex_encode(np.array([10.0]), np.array([20.0]), 6)[0])
    for k in (0, 1, 2, 3):
        ring = hex_k_ring(cell, k)
        assert len(ring) == 3 * k * (k + 1) + 1  # hexagonal disk size
        assert len(set(ring.tolist())) == len(ring)
        # every member is within hex distance k (axial metric)
        q0 = ((cell >> HEX_Q_SHIFT) & ((1 << 29) - 1)) - HEX_OFF
        r0 = (cell & ((1 << 29) - 1)) - HEX_OFF
        for c in ring.tolist():
            res = c >> HEX_RES_SHIFT
            assert res == 6
            dq = (((c >> HEX_Q_SHIFT) & ((1 << 29) - 1)) - HEX_OFF) - q0
            dr = (c & ((1 << 29) - 1)) - HEX_OFF - r0
            assert max(abs(dq), abs(dr), abs(dq + dr)) <= k


def test_hex_neighbors_are_adjacent_bins():
    """Nudging a point by one hex size in the 6 axial directions lands in
    a cell from the k=1 ring."""
    res, lat0, lon0 = 6, 10.03, 20.07
    c0 = int(hex_encode(np.array([lat0]), np.array([lon0]), res)[0])
    ring1 = set(hex_k_ring(c0, 1).tolist())
    s = 4.0 / (1 << res)
    import math

    for ang in range(0, 360, 30):
        dlat = 1.2 * s * math.sin(math.radians(ang))
        dlon = 1.2 * s * math.cos(math.radians(ang))
        c = int(hex_encode(np.array([lat0 + dlat]), np.array([lon0 + dlon]), res)[0])
        assert c in ring1 or c == c0


def test_s2_parent_consistency_property():
    """Hierarchy property: encoding at a coarse level directly equals
    shifting the fine cell's Morton bits (what s2_parent_col does JVM-side
    and the s2_rollup oracle proves engine-wide)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.floats(-89.9, 89.9),
        st.floats(-180.0, 180.0),
        st.integers(2, 14),
        st.integers(0, 4),
    )
    def check(lat, lon, level, d):
        fine = int(s2_encode(np.array([lat]), np.array([lon]), level)[0])
        coarse = int(s2_encode(np.array([lat]), np.array([lon]), level - min(d, level))[0])
        dd = min(d, level)
        face = (fine >> 52) & 7
        morton = fine & ((1 << 52) - 1)
        derived = ((level - dd) << 55) | (face << 52) | (morton >> (2 * dd))
        assert derived == coarse

    check()
