"""Connected components, raster→vector dissolve, and the dwithin join.

Property strategy mirrors the rest of the suite: every distributed
result is checked against an independent driver-side numpy/pure-python
oracle (union-find for components, brute-force haversine for dwithin,
direct mercator math for region bboxes).
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_notes_ingestion_spark.functions.geodesy import EARTH_RADIUS_M
from osm_notes_ingestion_spark.operators.components import (
    connected_components,
    dedup_cluster_labels,
    incremental_cluster_labels,
    incremental_components,
)
from osm_notes_ingestion_spark.operators.dwithin import dwithin_join, level_for_radius, site_cover
from osm_notes_ingestion_spark.operators.tiles import dissolve_tiles, region_bbox_cols, tile_counts


# ------------------------------------------------------- union-find oracle


def _uf_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then map every node to the MIN of its component
    comp_min: dict[int, int] = {}
    for v in range(n_nodes):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, r), v)
    return {v: comp_min[find(v)] for v in range(n_nodes)}


def test_components_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(4):
        n = rng.choice([12, 40, 120])
        m = rng.randint(0, 2 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        want = _uf_components(n, edges)
        edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
        ndf = spark.createDataFrame([(i,) for i in range(n)], "node long")
        got = {r["node"]: r["comp"] for r in connected_components(edf, nodes=ndf).collect()}
        assert got == want, f"trial {trial} (n={n}, m={m})"


def test_components_pathological_chain_and_star(spark):
    # a 60-chain exercises the O(log² n) round bound far beyond any
    # near-dup cluster's real diameter
    chain = spark.createDataFrame([(i, i + 1) for i in range(60)], "src long, dst long")
    got = connected_components(chain).collect()
    assert {r["comp"] for r in got} == {0} and len(got) == 61
    # duplicate / reversed / self-loop edges collapse harmlessly; a node
    # appearing ONLY in self-loops needs the `nodes` universe to surface
    # (self-loops are canonicalized away)
    messy = spark.createDataFrame(
        [(5, 9), (9, 5), (5, 9), (9, 9), (2, 2)], "src long, dst long"
    )
    uni = spark.createDataFrame([(2,), (5,), (9,)], "node long")
    got2 = {r["node"]: r["comp"] for r in connected_components(messy, nodes=uni).collect()}
    assert got2 == {5: 5, 9: 5, 2: 2}


def test_dedup_cluster_labels_canonical_flag(spark):
    pairs = spark.createDataFrame([(3, 1), (3, 7)], "id_a long, id_b long")
    docs = spark.createDataFrame([(i,) for i in (1, 3, 7, 9)], "doc_id long")
    rows = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in
            dedup_cluster_labels(pairs, docs).collect()}
    assert rows == {1: (1, 1), 3: (1, 0), 7: (1, 0), 9: (9, 1)}


def test_incremental_equals_full(spark):
    """VERDICT r4 #4: fold edge batches into prior labels one at a time
    (contracted-graph star rounds over the NEW edges only) and land on
    exactly the full-recompute labels after every batch — on random
    graphs AND on planted families spanning all three batches, including
    a later-arriving smaller id that must steal a component's label."""
    rng = random.Random(41)
    for trial in range(3):
        n = rng.choice([30, 80])
        batches = [
            [(rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(3, n))]
            for _ in range(3)
        ]
        # planted cross-batch families: a chain 1-4-8 built one edge per
        # batch, and component {20,21} whose min drops when 2 arrives last
        batches[0] += [(4, 8), (20, 21)]
        batches[1] += [(1, 4)]
        batches[2] += [(2, 20)]
        ndf = spark.createDataFrame([(i,) for i in range(n)], "node long")
        labels = None
        seen: list[tuple[int, int]] = []
        for edges in batches:
            seen += edges
            edf = spark.createDataFrame(edges, "src long, dst long")
            if labels is None:
                labels = connected_components(edf, nodes=ndf)
            else:
                labels = incremental_components(edf, labels, nodes=ndf)
            labels = labels.localCheckpoint(eager=True)  # yesterday's table
            got = {r["node"]: r["comp"] for r in labels.collect()}
            assert got == _uf_components(n, seen), f"trial {trial}"
        full = {
            r["node"]: r["comp"]
            for r in connected_components(
                spark.createDataFrame(seen, "src long, dst long"), nodes=ndf
            ).collect()
        }
        assert {r["node"]: r["comp"] for r in labels.collect()} == full


def test_incremental_cluster_labels_matches_batch_twin(spark):
    """The dedup-shaped wrapper: canonical flags move correctly when a
    smaller doc id joins an existing cluster, new docs appear, and an
    empty batch is a no-op."""
    docs1 = spark.createDataFrame([(i,) for i in (3, 7, 9)], "doc_id long")
    prior = dedup_cluster_labels(
        spark.createDataFrame([(3, 7)], "id_a long, id_b long"), docs1
    ).localCheckpoint(eager=True)
    docs2 = spark.createDataFrame([(i,) for i in (1, 3, 7, 9)], "doc_id long")
    inc = incremental_cluster_labels(
        spark.createDataFrame([(1, 7)], "id_a long, id_b long"), prior, docs2
    )
    rows = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in inc.collect()}
    assert rows == {1: (1, 1), 3: (1, 0), 7: (1, 0), 9: (9, 1)}
    # empty new-pair batch: labels unchanged
    empty = spark.createDataFrame([], "id_a long, id_b long")
    again = incremental_cluster_labels(empty, inc.localCheckpoint(eager=True), docs2)
    assert {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in again.collect()} == rows


# --------------------------------------------------------- dissolve tiles


def test_dissolve_tiles_regions_and_bbox(spark):
    # hand-built 8×8 raster at z=3: an L-shaped region of bin-1 tiles,
    # a separate single tile of the same bin, and a 2-tile bin-2 block
    z = 3
    tiles = [
        # L shape, cnt single-digit (bin 1)
        (z, 1, 1, 5), (z, 2, 1, 9), (z, 2, 2, 3),
        # isolated same-bin tile (diagonal contact at (3,3) does NOT connect)
        (z, 3, 3, 7),
        # two-tile block with 2-digit counts (bin 2)
        (z, 5, 1, 10), (z, 5, 2, 99),
    ]
    tdf = spark.createDataFrame(tiles, "z long, x long, y long, cnt long")
    out = {r["region_id"]: r.asDict() for r in dissolve_tiles(tdf, z).collect()}
    n = 1 << z
    key_l = 1 * n + 1
    key_iso = 3 * n + 3
    key_b2 = 5 * n + 1
    assert set(out) == {key_l, key_iso, key_b2}
    assert out[key_l]["n_tiles"] == 3 and out[key_l]["pages"] == 17 and out[key_l]["bin"] == 1
    assert out[key_iso]["n_tiles"] == 1 and out[key_iso]["bin"] == 1
    assert out[key_b2]["n_tiles"] == 2 and out[key_b2]["pages"] == 109 and out[key_b2]["bin"] == 2
    assert (out[key_l]["x_min"], out[key_l]["x_max"], out[key_l]["y_min"], out[key_l]["y_max"]) == (
        1, 2, 1, 2,
    )

    # bbox attachment vs direct numpy mercator inverse
    bb = {r["region_id"]: r.asDict() for r in
          region_bbox_cols(dissolve_tiles(tdf, z), z).collect()}

    def merc_lat(y):
        return math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y / n))))

    r = bb[key_l]
    assert r["lon_w"] == pytest.approx(1 / n * 360 - 180, abs=1e-9)
    assert r["lon_e"] == pytest.approx(3 / n * 360 - 180, abs=1e-9)
    assert r["lat_n"] == pytest.approx(merc_lat(1), abs=1e-9)
    assert r["lat_s"] == pytest.approx(merc_lat(3), abs=1e-9)


def test_dissolve_roundtrip_conserves_pages(spark, sf_dir):
    # vector regions partition the raster: Σ region pages = Σ tile counts
    from osm_notes_ingestion_spark.plans.queries_spatial import _extracted

    pts = _extracted(spark, sf_dir).where(F.col("has_coords"))
    tiles = tile_counts(pts, max_zoom=5, min_zoom=5).cache()
    total = tiles.agg(F.sum("cnt")).collect()[0][0]
    regions = dissolve_tiles(tiles, 5)
    assert regions.agg(F.sum("pages")).collect()[0][0] == total
    tiles.unpersist()


# ------------------------------------------------------------ dwithin join


def _hav_np(lat1, lon1, lat2, lon2):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp, dl = np.radians(lat2 - lat1), np.radians(lon2 - lon1)
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


@pytest.mark.parametrize(
    "sites, radius",
    [
        # antimeridian-straddling site and a polar site — the cover's lon
        # wrap and full-band widening paths
        ([(0, 10.0, 20.0), (1, -35.5, 179.9), (2, 88.0, 0.0)], 300_000.0),
        # radius big enough that a disk spans many cells at its level
        ([(0, 60.0, -120.0)], 1_500_000.0),
    ],
)
def test_dwithin_matches_bruteforce(spark, sites, radius):
    rng = np.random.default_rng(11)
    n = 4000
    lat = rng.uniform(-89.9, 89.9, n)
    lon = rng.uniform(-180.0, 180.0, n)
    pts = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype=np.int64), "lat": lat, "lon": lon})
    )
    sdf = spark.createDataFrame(sites, "site_id long, lat double, lon double")
    got = {(r["id"], r["site_id"]): r["dist_m"] for r in
           dwithin_join(pts, sdf, radius).collect()}
    want = {}
    for sid, slat, slon in sites:
        d = _hav_np(lat, lon, np.full(n, slat), np.full(n, slon))
        for i in np.nonzero(d <= radius)[0]:
            want[(int(i), sid)] = int(math.floor(d[i]))
    assert got == want


def test_site_cover_is_superset_of_disk(spark):
    # every point inside the disk must land in a covered cell — fuzz the
    # bbox-edge geometry the exact-asin widening exists for
    rng = np.random.default_rng(23)
    radius = 400_000.0
    sites = [(0, 72.3, 169.7)]
    sdf = spark.createDataFrame(sites, "site_id long, lat double, lon double")
    cover, lvl = site_cover(sdf, radius)
    cells = {r["cell"] for r in cover.collect()}
    # rejection-sample points inside the disk near its rim
    from osm_notes_ingestion_spark.functions.cells import encode

    lat = rng.uniform(sites[0][1] - 4.2, sites[0][1] + 4.2, 20000)
    lon = rng.uniform(sites[0][2] - 14.0, sites[0][2] + 14.0, 20000)
    lon = np.where(lon > 180.0, lon - 360.0, lon)
    d = _hav_np(lat, lon, np.full(lat.shape, sites[0][1]), np.full(lat.shape, sites[0][2]))
    inside = d <= radius
    pc = encode(lat[inside], lon[inside], lvl)
    missing = set(pc.tolist()) - cells
    assert not missing


def test_level_for_radius_monotone():
    last = 99
    for r in (1e3, 1e4, 1e5, 1e6, 1e7):
        lvl = level_for_radius(r)
        assert lvl <= last
        last = lvl
    # cell edge at the chosen level is at least the radius
    for r in (5e3, 2e5, 7e6):
        lvl = level_for_radius(r)
        edge_m = 180.0 / (1 << lvl) * (math.pi * EARTH_RADIUS_M / 180.0)
        assert edge_m >= r or lvl == 0


def test_tile_user_counts_exact_and_approx(spark):
    from osm_notes_ingestion_spark.operators.tiles import tile_user_counts
    import duckdb

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from osm_notes_ingestion_spark.plans.queries_spatial import _extracted

    pts = _extracted(spark, "/root/testdata/sf0.001").where(F.col("has_coords"))
    # join user dimension onto the coord pages via event id
    pts = pts.join(ev.select(F.col("event_id").alias("id"), "user_id"), "id")
    exact = {(r["x"], r["y"]): r["n_users"] for r in
             tile_user_counts(pts, 4).collect()}
    # DuckDB twin computes the identical tile binning + exact distinct
    from osm_notes_ingestion_spark.sources.synth import sql_lat_e6, sql_lon_e6, sql_u

    want = {(r[0], r[1]): r[2] for r in duckdb.sql(f"""
WITH pts AS (
  SELECT event_id AS id, user_id,
         {sql_lat_e6('event_id')}/1000000.0 AS lat,
         {sql_lon_e6('event_id')}/1000000.0 AS lon,
         {sql_u('event_id')} AS u
  FROM '/root/testdata/sf0.001/events.parquet')
SELECT CAST(LEAST(GREATEST(floor((lon + 180)/360 * 16), 0), 15) AS BIGINT) AS x,
       CAST(LEAST(GREATEST(floor((1 - ln(tan(radians(LEAST(GREATEST(lat, -85.05112878), 85.05112878)))
         + 1/cos(radians(LEAST(GREATEST(lat, -85.05112878), 85.05112878))))/pi())/2 * 16), 0), 15) AS BIGINT) AS y,
       count(DISTINCT user_id) AS n
FROM pts WHERE u < 90000 GROUP BY 1, 2""").fetchall()}
    assert exact == want
    # HLL sketch mode: every tile inside a generous rsd envelope
    approx = {(r["x"], r["y"]): r["n_users"] for r in
              tile_user_counts(pts, 4, approx=True, rsd=0.05).collect()}
    assert set(approx) == set(exact)
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(3, 5 * 0.05 * v), (k, v, approx[k])
