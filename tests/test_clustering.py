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


def test_incremental_equals_full_recompute(spark):
    """3 batches with families that span all three, a border that gets
    promoted to core, two clusters merged by a bridging point, and
    noise->border transitions — incremental labels must equal a full
    grid_cluster over everything seen, after every batch."""
    from osm_notes_ingestion_spark.operators.clustering import (
        grid_cluster_increment,
        grid_cluster_init,
    )

    eps, min_pts = 1_000_000, 3

    def mk(rows):
        return spark.createDataFrame(rows, "id long, lat_e6 long, lon_e6 long")

    # batch 1: blob A (3 pts, core at min_pts=3), blob B (2 pts — not yet
    # core), a lone far point (noise)
    b1 = [
        (1, 0, 0), (2, 0, 400_000), (3, 400_000, 0),          # A
        (10, 0, 20_000_000), (11, 0, 20_400_000),             # B (pre-core)
        (50, 50_000_000, 50_000_000),                          # noise
    ]
    # batch 2: completes B into a core blob; adds a satellite border to A
    b2 = [
        (12, 400_000, 20_000_000),                             # B now core
        (4, 900_000, 900_000),                                 # border of A
    ]
    # batch 3: a chain bridging A towards B? (too far) — instead merge A
    # with a NEW blob C grown adjacent, and wrap-side points
    b3 = [
        (5, 0, 800_000), (6, 0, 1_200_000), (7, 0, 1_600_000), # C, touches A
        (60, 0, -179_900_000), (61, 0, 179_900_000),           # wrap pair
        (62, 400_000, 179_900_000),                            # wrap trio -> core
    ]

    state, labels = grid_cluster_init(mk(b1), eps, min_pts)
    seen = list(b1)
    want = {r["id"]: (r["cluster"], r["role"]) for r in grid_cluster(mk(seen), eps, min_pts).collect()}
    got = {r["id"]: (r["cluster"], r["role"]) for r in labels.collect()}
    assert got == want

    for batch in (b2, b3):
        state, labels = grid_cluster_increment(state, mk(batch))
        seen += batch
        want = {r["id"]: (r["cluster"], r["role"]) for r in grid_cluster(mk(seen), eps, min_pts).collect()}
        got = {r["id"]: (r["cluster"], r["role"]) for r in labels.collect()}
        assert got == want

    # spot invariants: A and C merged into one cluster; wrap trio is core
    final = got
    assert final[1][0] == final[5][0] == final[7][0]
    assert final[60] == (60, "core") and final[61][0] == 60 and final[62][0] == 60


def test_incremental_random_batches(spark):
    """Randomized: 3 batches of mixed-density points; incremental ≡ full
    after each batch."""
    from osm_notes_ingestion_spark.operators.clustering import (
        grid_cluster_increment,
        grid_cluster_init,
    )

    rng = np.random.default_rng(23)
    eps, min_pts = 3_000_000, 4

    def draw(n, id0):
        centers = rng.uniform((-60e6, -150e6), (60e6, 150e6), size=(3, 2))
        pts = np.concatenate(
            [rng.normal(c, 2e6, size=(n // 3, 2)) for c in centers]
            + [rng.uniform((-80e6, -170e6), (80e6, 170e6), size=(n - 3 * (n // 3) + 8, 2))]
        ).astype(np.int64)
        lat = np.clip(pts[:, 0], -90_000_000, 90_000_000)
        lon = np.clip(pts[:, 1], -180_000_000, 180_000_000)
        return [(id0 + i, int(lat[i]), int(lon[i])) for i in range(len(lat))]

    def mk(rows):
        return spark.createDataFrame(rows, "id long, lat_e6 long, lon_e6 long")

    batches = [draw(30, 0), draw(30, 1000), draw(30, 2000)]
    state, labels = grid_cluster_init(mk(batches[0]), eps, min_pts)
    seen = list(batches[0])
    for batch in batches[1:]:
        state, labels = grid_cluster_increment(state, mk(batch))
        seen += batch
        want = {r["id"]: (r["cluster"], r["role"]) for r in grid_cluster(mk(seen), eps, min_pts).collect()}
        got = {r["id"]: (r["cluster"], r["role"]) for r in labels.collect()}
        assert got == want
