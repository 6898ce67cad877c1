"""grid_cluster (operators/clustering.py) vs an independent brute-force
DBSCAN implementation (O(n²) distance matrix + union-find), plus planted
shapes: two blobs, an antimeridian-straddling blob, border/noise roles.
"""

from __future__ import annotations

import numpy as np
import pytest

from osm_notes_ingestion_spark.operators.clustering import _level_for_eps, grid_cluster


def _brute(ids, lat, lon, eps_e6, min_pts):
    """Same spec, independent machinery: wrap metric, core = |ball| >=
    min_pts (incl. self), clusters = CC of core-core pairs labeled by min
    id, border -> min core-neighbour label, else noise."""
    n = len(ids)
    dlat = lat[:, None].astype(np.float64) - lat[None, :]
    dlon = np.abs(lon[:, None].astype(np.float64) - lon[None, :])
    dlon = np.minimum(dlon, 360_000_000 - dlon)
    d2 = dlat * dlat + dlon * dlon
    nb = d2 <= float(eps_e6) ** 2  # includes self (diag zero)
    core = nb.sum(axis=1) >= min_pts

    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and nb[i, j]:
                parent[find(i)] = find(j)
    comp_min: dict[int, int] = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            comp_min[r] = min(comp_min.get(r, ids[i]), ids[i])
    out = {}
    for i in range(n):
        if core[i]:
            out[ids[i]] = (comp_min[find(i)], "core")
        else:
            lbls = [comp_min[find(j)] for j in range(n) if core[j] and nb[i, j]]
            out[ids[i]] = (min(lbls), "border") if lbls else (-1, "noise")
    return out


def _run(spark, ids, lat, lon, eps_e6, min_pts):
    df = spark.createDataFrame(
        list(zip(map(int, ids), map(int, lat), map(int, lon))),
        "id long, lat_e6 long, lon_e6 long",
    )
    got = grid_cluster(df, eps_e6, min_pts).collect()
    return {r["id"]: (r["cluster"], r["role"]) for r in got}


def test_level_for_eps_bounds():
    for eps in (1, 1000, 1_000_000, 45_000_000, 500_000_000):
        lvl = _level_for_eps(eps)
        assert 180_000_000 / (1 << lvl) >= eps or lvl == 0
        if lvl < 29 and eps <= 90_000_000:
            assert 180_000_000 / (1 << (lvl + 1)) < eps  # deepest such level


def test_matches_brute_force_random(spark):
    rng = np.random.default_rng(11)
    # three density regimes around scattered centers + uniform noise
    pts = [rng.normal((10e6 * i, 20e6 * i), 2e6, size=(30, 2)) for i in range(3)]
    pts.append(rng.uniform((-80e6, -170e6), (80e6, 170e6), size=(40, 2)))
    arr = np.concatenate(pts).astype(np.int64)
    lat = np.clip(arr[:, 0], -90_000_000, 90_000_000)
    lon = np.clip(arr[:, 1], -180_000_000, 180_000_000)
    ids = np.arange(len(lat)) * 7 + 3  # non-contiguous ids
    eps, min_pts = 3_000_000, 4
    assert _run(spark, ids, lat, lon, eps, min_pts) == _brute(ids, lat, lon, eps, min_pts)


def test_wrap_blob_is_one_cluster(spark):
    rng = np.random.default_rng(5)
    lon = ((rng.uniform(179.5, 180.5, 25) + 180) % 360 - 180) * 1e6
    lat = rng.uniform(-0.5, 0.5, 25) * 1e6
    ids = np.arange(25)
    got = _run(spark, ids, lat.astype(np.int64), lon.astype(np.int64), 2_000_000, 3)
    clusters = {c for c, role in got.values() if role == "core"}
    assert len(clusters) == 1  # straddles ±180 but clusters as one
    assert all(role != "noise" for _, role in got.values())
    assert got == _brute(ids, lat.astype(np.int64), lon.astype(np.int64), 2_000_000, 3)


def test_border_and_noise_roles(spark):
    # 5 mutually-close core points; one satellite within eps of exactly
    # ONE core point (2 < min_pts neighbours incl. self -> border); one
    # far point (noise)
    lat = np.array([0, 0, 0, 0, 0, 999_999, 50_000_000], dtype=np.int64)
    lon = np.array([0, 200_000, 400_000, 600_000, 800_000, 0, 0], dtype=np.int64)
    ids = np.array([10, 11, 12, 13, 14, 15, 16])
    got = _run(spark, ids, lat, lon, 1_000_000, 5)
    assert got[10] == (10, "core") and got[14] == (10, "core")
    assert got[15] == (10, "border")
    assert got[16] == (-1, "noise")
