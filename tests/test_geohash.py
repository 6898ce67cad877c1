"""Geohash twins (functions/geohash.py): the published bisection
algorithm as the independent reference, canonical test vectors, and
numpy ≡ JVM ≡ DuckDB equivalence on random coordinates.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_notes_ingestion_spark.functions.geohash import (
    B32,
    geohash_col,
    geohash_np,
    geohash_sql,
)


def _reference(lat: float, lon: float, precision: int) -> str:
    """Niemeyer's algorithm as published: alternate lon/lat interval
    bisection, 5 bits per base32 character, lon first."""
    lat_iv, lon_iv = [-90.0, 90.0], [-180.0, 180.0]
    out, bit, ch, even = [], 0, 0, True
    while len(out) < precision:
        iv, v = (lon_iv, lon) if even else (lat_iv, lat)
        mid = (iv[0] + iv[1]) / 2
        if v >= mid:
            ch = (ch << 1) | 1
            iv[0] = mid
        else:
            ch = ch << 1
            iv[1] = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(B32[ch])
            bit, ch = 0, 0
    return "".join(out)


def test_canonical_vectors():
    # geohash.org's canonical example + a few published city hashes
    assert geohash_np([57.64911], [10.40744], 11)[0] == "u4pruydqqvj"
    assert geohash_np([48.669], [-4.329], 5)[0] == "gbsuv"
    assert geohash_np([39.92324], [116.3906], 9)[0] == "wx4g0ec19"


@pytest.mark.parametrize("precision", [1, 2, 5, 9, 12])
def test_numpy_matches_published_algorithm(precision):
    rng = np.random.default_rng(precision)
    lat = rng.uniform(-90, 90, 200)
    lon = rng.uniform(-180, 180, 200)
    got = geohash_np(lat, lon, precision)
    for i in range(len(lat)):
        assert got[i] == _reference(lat[i], lon[i], precision), (lat[i], lon[i])


def test_edge_clamps():
    # lat=90 / lon=180 clamp into the top cell instead of overflowing
    assert geohash_np([90.0], [180.0], 6)[0] == _reference(89.9999999, 179.9999999, 6)
    assert geohash_np([-90.0], [-180.0], 6)[0] == _reference(-90.0, -180.0, 6)


def test_jvm_and_sql_twins_match_numpy(spark):
    rng = np.random.default_rng(3)
    rows = [(i, float(rng.uniform(-90, 90)), float(rng.uniform(-180, 180))) for i in range(300)]
    for precision in (5, 9, 12):
        df = spark.createDataFrame(rows, "id long, lat double, lon double")
        jvm = {
            r["id"]: r["gh"]
            for r in df.select("id", geohash_col(F.col("lat"), F.col("lon"), precision).alias("gh")).collect()
        }
        want = geohash_np([r[1] for r in rows], [r[2] for r in rows], precision)
        assert all(jvm[r[0]] == want[i] for i, r in enumerate(rows))
        con = duckdb.connect()
        con.execute("CREATE TABLE t (id BIGINT, lat DOUBLE, lon DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        sql = {
            rid: gh
            for rid, gh in con.execute(
                f"SELECT id, {geohash_sql('lat', 'lon', precision)} FROM t"
            ).fetchall()
        }
        assert all(sql[r[0]] == want[i] for i, r in enumerate(rows))


def test_precision_validation():
    with pytest.raises(ValueError):
        geohash_np([0.0], [0.0], 13)
    with pytest.raises(ValueError):
        geohash_np([0.0], [0.0], 0)


def test_decode_roundtrip_and_bbox():
    from osm_notes_ingestion_spark.functions.geohash import geohash_decode_np

    rng = np.random.default_rng(9)
    lat = rng.uniform(-90, 90, 100)
    lon = rng.uniform(-180, 180, 100)
    for precision in (4, 7, 11):
        hs = geohash_np(lat, lon, precision)
        lat_min, lon_min, lat_max, lon_max = geohash_decode_np(hs)
        # the encoded point lies inside its decoded bbox
        assert ((lat >= lat_min) & (lat < lat_max + 1e-12)).all()
        assert ((lon >= lon_min) & (lon < lon_max + 1e-12)).all()
        # re-encoding the bbox center reproduces the hash
        assert (geohash_np((lat_min + lat_max) / 2, (lon_min + lon_max) / 2, precision) == hs).all()
    # canonical: 'ezs42' decodes to the published ~(42.6, -5.6) cell
    lat_min, lon_min, lat_max, lon_max = geohash_decode_np(["ezs42"])
    assert lat_min[0] < 42.605 < lat_max[0] and lon_min[0] < -5.603 < lon_max[0]


def test_neighbors_wrap_and_poles():
    from osm_notes_ingestion_spark.functions.geohash import (
        geohash_decode_np,
        geohash_neighbors_np,
    )

    # interior cell: exactly 8 neighbors, all adjacent (bbox edges touch)
    h = geohash_np([40.0], [-100.0], 6)[0]
    ns = geohash_neighbors_np([h])[0]
    assert len(ns) == 8 and len(set(ns)) == 8 and h not in ns
    lat_min, lon_min, lat_max, lon_max = geohash_decode_np([h])
    nlat_min, nlon_min, nlat_max, nlon_max = geohash_decode_np(ns)
    lat_w = lat_max[0] - lat_min[0]
    lon_w = lon_max[0] - lon_min[0]
    assert (np.abs(nlat_min - lat_min[0]) <= lat_w + 1e-9).all()
    assert ((np.abs(nlon_min - lon_min[0]) <= lon_w + 1e-9)
            | (np.abs(np.abs(nlon_min - lon_min[0]) - 360.0) <= lon_w + 1e-9)).all()

    # antimeridian: a cell touching lon=180 has neighbors on the -180 side
    h = geohash_np([0.0], [179.999999], 5)[0]
    ns = geohash_neighbors_np([h])[0]
    _, nlon_min, _, _ = geohash_decode_np(ns)
    assert (nlon_min < -179.0).any()
    assert len(ns) == 8

    # pole: a top-row cell has only 5 neighbors (no row above)
    h = geohash_np([89.99], [10.0], 4)[0]
    ns = geohash_neighbors_np([h])[0]
    assert len(ns) == 5
