"""Driver-gate queries: spatial family (extract / assign / tiles / knn).

Each entry: name → (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql|None).
Oracle SQL runs in DuckDB over the pre-registered testdata views; the
pages table is derived from `events` by the shared integer formulas in
sources/synth.py, so both sides reconstruct identical ground truth.

Output discipline (driver hashes values after sorting columns by name):
- integer outputs wherever possible (µdeg, counts, ids);
- every computed column aliased identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_pages
from ..operators.knn import knn
from ..operators.spatial_join import assign_countries
from ..operators.tiles import tile_counts, tile_distinct
from ..sources.polygons import prep_polygons
from ..sources.synth import (
    pages_df,
    sql_country_case,
    sql_lat_e6,
    sql_lon_e6,
    sql_nearest_values,
    sql_page_text,
    sql_seg_d2,
    sql_u,
    world_polygons,
)

_PTS_CTE = f"""WITH pts AS (
  SELECT event_id AS id,
         {sql_lat_e6('event_id')} AS lat_e6,
         {sql_lon_e6('event_id')} AS lon_e6,
         {sql_u('event_id')} AS u,
         ts, event_type, props
  FROM events
)"""


def _extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_pages(pages_df(spark, sf_dir))


from functools import lru_cache


@lru_cache(maxsize=1)
def _index():
    # build-time artifact (reference preps countries+grid once, not per
    # query) — memoized so multi-query sessions don't re-cover polygons
    return prep_polygons(world_polygons(), level=9)


# ---------------------------------------------------------------- extract


def q_extract_coords(spark, sf_dir):
    return _extracted(spark, sf_dir).select(
        "id", "lat_e6", "lon_e6", "has_coords", "rejected"
    )


SQL_EXTRACT_COORDS = f"""{_PTS_CTE}
SELECT id, lat_e6, lon_e6,
       (u < 90000) AS has_coords,
       (u >= 97000) AS rejected
FROM pts"""


def q_extract_text_md5(spark, sf_dir):
    return _extracted(spark, sf_dir).select(
        "id", F.md5(F.encode("text", "UTF-8")).alias("text_md5")
    )


SQL_EXTRACT_TEXT_MD5 = f"""{_PTS_CTE}
SELECT id, md5({sql_page_text('id', 'event_type', 'props')}) AS text_md5
FROM pts"""


# ---------------------------------------------------------------- assignment


def q_assign_country(spark, sf_dir):
    """assign + the NEAREST-POLYGON fallback leg (round 5): unmatched
    (NO_MATCH) points additionally get the nearest polygon under the
    pinned floored-µdeg² metric — the reference's maritime-boundary
    assignment for ocean notes (functionsProcess_21:223 → maritime
    rows). Physical filter→kernel→union split keeps the Arrow volume to
    the ocean fraction; matched rows resolve JVM-side."""
    from ..operators.nearest import nearest_polygon

    assigned = assign_countries(
        spark, _extracted(spark, sf_dir), _index(), keep_cols=("lat_e6", "lon_e6")
    )
    fast = assigned.where(
        F.col("country_id").isNull() | (F.col("country_id") != -1)
    ).select(
        "id",
        "country_id",
        F.col("country_id").alias("nearest_country_id"),
        F.lit(None).cast("long").alias("nearest_d2"),
    )
    slow = nearest_polygon(
        spark, assigned.where(F.col("country_id") == -1), _index().pack
    ).select("id", "country_id", "nearest_country_id", "nearest_d2")
    return fast.unionByName(slow)


SQL_ASSIGN_COUNTRY = f"""{_PTS_CTE}
SELECT id, {sql_country_case()} AS country_id FROM pts"""

SQL_ASSIGN_NEAREST = f"""{_PTS_CTE},
base AS (SELECT id, lat_e6, lon_e6, {sql_country_case()} AS country_id FROM pts),
seg(cid, ax, ay, vx, vy, len2) AS (VALUES
  {sql_nearest_values()}),
nm AS (SELECT id, CAST(lon_e6 AS DOUBLE) AS px, CAST(lat_e6 AS DOUBLE) AS py
       FROM base WHERE country_id = -1),
segd AS (SELECT nm.id, seg.cid,
                MIN(LEAST({sql_seg_d2(-360e6)},
                          {sql_seg_d2(0.0)},
                          {sql_seg_d2(360e6)})) AS d2
         FROM nm CROSS JOIN seg GROUP BY 1, 2),
best AS (SELECT id, cid, CAST(FLOOR(d2) AS BIGINT) AS fd2,
                row_number() OVER (
                  PARTITION BY id
                  ORDER BY CAST(FLOOR(d2) AS BIGINT), cid) AS rn
         FROM segd)
SELECT base.id, base.country_id,
       CASE WHEN base.country_id = -1 THEN best.cid
            ELSE base.country_id END AS nearest_country_id,
       CASE WHEN base.country_id = -1 THEN best.fd2 END AS nearest_d2
FROM base LEFT JOIN best ON base.id = best.id AND best.rn = 1"""


def q_assign_country_distributed(spark, sf_dir):
    """The DISTRIBUTED prep + assign path: ring rows stay in a DataFrame,
    split/repair/cover run per-feature on executors (applyInPandas), and
    exact-PIP refinement is cell-local against clipped fragments — no
    driver ring collect, no global PolygonPack broadcast (VERDICT r2 #3).
    Must equal the same oracle as the driver-prep assign_country."""
    from ..operators.spatial_join import assign_countries_distributed
    from ..sources.polygons import prep_polygons_distributed, ring_rows_df

    cover = prep_polygons_distributed(spark, ring_rows_df(spark, world_polygons()), level=9)
    return assign_countries_distributed(
        spark, _extracted(spark, sf_dir), cover, level=9
    ).select("id", "country_id")


def q_assign_counts(spark, sf_dir):
    return (
        assign_countries(spark, _extracted(spark, sf_dir), _index())
        .groupBy("country_id")
        .agg(F.count("*").alias("n_pages"))
    )


SQL_ASSIGN_COUNTS = f"""{_PTS_CTE}
SELECT {sql_country_case()} AS country_id, count(*) AS n_pages
FROM pts GROUP BY 1"""


def q_checkpoint_restore(spark, sf_dir):
    """J6 semantics: a checkpoint supplies country for id%5==0 rows; the
    engine computes only the remainder and coalesces. Output must equal a
    full run (resume ≡ full-run invariant)."""
    ext = _extracted(spark, sf_dir)
    index = _index()
    full = assign_countries(spark, ext, index).select("id", "country_id")
    checkpoint = full.where(F.col("id") % 5 == 0)
    rest = ext.join(checkpoint.select("id"), "id", "left_anti")
    computed = assign_countries(spark, rest, index).select("id", "country_id")
    return checkpoint.unionByName(computed)


def q_incremental_scan(spark, sf_dir):
    """S2/P4: watermark-bounded incremental slice — only pages newer than
    the cutoff are assigned (snapshot-scan analog)."""
    ext = _extracted(spark, sf_dir).where(F.col("warc_ts") > F.lit("2024-01-05 00:00:00"))
    return assign_countries(spark, ext, _index()).select("id", "country_id")


SQL_INCREMENTAL_SCAN = f"""{_PTS_CTE}
SELECT id, {sql_country_case()} AS country_id FROM pts
WHERE ts > TIMESTAMP '2024-01-05 00:00:00'"""


# ---------------------------------------------------------------- tiles

_TILE_X = "CAST(LEAST(GREATEST(floor((lon_e6/1000000.0 + 180)/360 * {n}), 0), {n}-1) AS BIGINT)"
_TILE_Y = (
    "CAST(LEAST(GREATEST(floor((1 - ln(tan(radians(LEAST(GREATEST(lat_e6/1000000.0, -85.05112878), 85.05112878)))"
    " + 1/cos(radians(LEAST(GREATEST(lat_e6/1000000.0, -85.05112878), 85.05112878))))/pi())/2 * {n}), 0), {n}-1) AS BIGINT)"
)


def q_tiles_z4(spark, sf_dir):
    """Rolled up from z6 through the parent-merge path (proves the
    pyramid), compared against a direct z4 binning oracle. Strict
    superset since round 5b: alongside the additive cnt the gate now
    carries uniq_users — EXACT distinct contributors per tile, derived
    by MERGING the z6 tiles' bitmap id-sets upward (bitmap_or_agg =
    set union; operators/tiles.py::tile_distinct) while the oracle
    counts DISTINCT u directly per z4 tile. A user active in several z6
    children of one z4 tile is the case that distinguishes merge from
    re-scan — summing child distincts would double-count them, so a
    hash match here pins the mergeable-distinct pyramid end to end."""
    pts = (
        _extracted(spark, sf_dir)
        .where(F.col("has_coords"))
        .withColumn(
            "user_id",
            F.pmod(F.col("id") * F.lit(48271) + F.lit(11), F.lit(100000)),
        )
    )
    return (
        tile_distinct(pts, max_zoom=6, min_zoom=4, id_col="user_id")
        .where(F.col("z") == 4)
        .select("z", "x", "y", "cnt", F.col("uniq").alias("uniq_users"))
    )


SQL_TILES_Z4 = f"""{_PTS_CTE}
SELECT 4 AS z, {_TILE_X.format(n=16)} AS x, {_TILE_Y.format(n=16)} AS y, count(*) AS cnt,
       count(DISTINCT u) AS uniq_users
FROM pts WHERE u < 90000
GROUP BY 1, 2, 3"""


def q_tiles_by_year(spark, sf_dir):
    """A7: the WMS year-bucket dimension (prepareDatabase.sql:33-40)."""
    pts = (
        _extracted(spark, sf_dir)
        .where(F.col("has_coords"))
        .withColumn("year_ts", F.year("warc_ts").cast("long"))
    )
    return tile_counts(pts, max_zoom=3, min_zoom=3, extra_dims=("year_ts",)).select(
        "z", "x", "y", "year_ts", "cnt"
    )


SQL_TILES_BY_YEAR = f"""{_PTS_CTE}
SELECT 3 AS z, {_TILE_X.format(n=8)} AS x, {_TILE_Y.format(n=8)} AS y,
       EXTRACT(YEAR FROM ts) AS year_ts, count(*) AS cnt
FROM pts WHERE u < 90000
GROUP BY 1, 2, 3, 4"""


# ---------------------------------------------------------------- knn

_KNN_QUERIES = [(1, 35.0, -100.0), (2, 0.0, 60.0), (3, -5.0, 179.9)]


def q_tiles_incremental(spark, sf_dir):
    """Incremental tile maintenance (WMS trigger analog,
    prepareDatabase.sql:104-121): tiles published from the pre-cutoff
    corpus + delta tiles from the new batch, additively merged. The
    oracle bins the FULL corpus directly — merge(old, delta) ≡ full."""
    from ..operators.tiles import merge_tile_counts

    pts = _extracted(spark, sf_dir).where(F.col("has_coords"))
    cutoff = F.lit("2024-01-05 00:00:00")
    old = tile_counts(pts.where(F.col("warc_ts") <= cutoff), max_zoom=5, min_zoom=5)
    delta = tile_counts(pts.where(F.col("warc_ts") > cutoff), max_zoom=5, min_zoom=5)
    return merge_tile_counts(old, delta).select("z", "x", "y", "cnt")


SQL_TILES_INCREMENTAL = f"""{_PTS_CTE}
SELECT 5 AS z, {_TILE_X.format(n=32)} AS x, {_TILE_Y.format(n=32)} AS y, count(*) AS cnt
FROM pts WHERE u < 90000
GROUP BY 1, 2, 3"""


def q_tiles_vectorize(spark, sf_dir):
    """Raster→vector (the inverse of tile_counts): dissolve 4-connected
    z6 tiles sharing a heat class into labeled vector regions via the
    large-star/small-star connected-components loop
    (operators/tiles.py::dissolve_tiles). All-integer output; the
    degree-space bbox attachment (region_bbox_cols) is pytest-pinned
    against a numpy twin. Oracle resolves the same grid components with
    a recursive min-label closure."""
    from ..operators.tiles import dissolve_tiles

    pts = _extracted(spark, sf_dir).where(F.col("has_coords"))
    tiles = tile_counts(pts, max_zoom=6, min_zoom=6)
    return dissolve_tiles(tiles, z=6)


def _sql_tiles_vectorize() -> str:
    pts_rec = _PTS_CTE.replace("WITH pts", "WITH RECURSIVE pts", 1)
    return f"""{pts_rec},
tiles AS (
  SELECT {_TILE_X.format(n=64)} AS x, {_TILE_Y.format(n=64)} AS y, count(*) AS cnt
  FROM pts WHERE u < 90000 GROUP BY 1, 2
),
t AS (
  SELECT x, y, cnt, CAST(length(CAST(cnt AS VARCHAR)) AS BIGINT) AS bin,
         x * 64 + y AS node
  FROM tiles
),
e1 AS (
  SELECT a.node AS u, b.node AS v FROM t a JOIN t b ON b.x = a.x + 1 AND b.y = a.y AND b.bin = a.bin
  UNION ALL
  SELECT a.node, b.node FROM t a JOIN t b ON b.x = a.x AND b.y = a.y + 1 AND b.bin = a.bin
),
edges AS (SELECT u, v FROM e1 UNION SELECT v, u FROM e1),
reach AS (
  SELECT node, node AS comp FROM t
  UNION
  SELECT e.v AS node, r.comp FROM reach r JOIN edges e ON e.u = r.node
  WHERE r.comp < e.v
),
lab AS (SELECT node, min(comp) AS comp FROM reach GROUP BY 1)
SELECT l.comp AS region_id, t.bin, count(*) AS n_tiles,
       CAST(sum(t.cnt) AS BIGINT) AS pages,
       min(t.x) AS x_min, max(t.x) AS x_max, min(t.y) AS y_min, max(t.y) AS y_max
FROM t JOIN lab l ON l.node = t.node
GROUP BY 1, 2"""


def q_knn(spark, sf_dir):
    pts = _extracted(spark, sf_dir).where(F.col("has_coords"))
    # initial_radius=2: at this corpus density the provable 5th-NN bound
    # needs the 5×5 ring (2·cell_h ≈ 5.6°), so starting there converges
    # in ONE Spark job where the default radius-1 start always doubles
    return knn(spark, pts, _KNN_QUERIES, k=5, level=6, initial_radius=2).select(
        "query_id", F.col("rank").cast("long").alias("rank"), "id", "d2"
    )


SQL_KNN = f"""{_PTS_CTE},
q(query_id, qlat, qlon) AS (VALUES (1, 35000000, -100000000), (2, 0, 60000000), (3, -5000000, 179900000)),
d AS (
  SELECT q.query_id, pts.id,
         (pts.lat_e6 - q.qlat)*(pts.lat_e6 - q.qlat)
         + LEAST(ABS(pts.lon_e6 - q.qlon), 360000000 - ABS(pts.lon_e6 - q.qlon))
           * LEAST(ABS(pts.lon_e6 - q.qlon), 360000000 - ABS(pts.lon_e6 - q.qlon)) AS d2
  FROM pts, q WHERE pts.u < 90000
)
SELECT query_id, rank, id, d2 FROM (
  SELECT query_id, id, d2,
         row_number() OVER (PARTITION BY query_id ORDER BY d2, id) AS rank
  FROM d
) WHERE rank <= 5"""


def q_knn_bulk(spark, sf_dir):
    """kNN over a DATAFRAME of query points (every event id seeds one
    query via the synth coordinate formulas on id+777 — ≥10⁴ queries at
    sf0.01): join-based ring expansion with per-query radius/convergence
    as data (operators/knn.knn_df), matching the brute-force oracle."""
    from ..operators.knn import knn_df

    pts = _extracted(spark, sf_dir).where(F.col("has_coords"))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    queries = ev.select(
        F.col("event_id").alias("query_id"),
        (F.expr(_Q_LAT_E6).cast("double") / 1e6).alias("qlat"),
        (F.expr(_Q_LON_E6).cast("double") / 1e6).alias("qlon"),
    )
    return knn_df(spark, pts, queries, k=3, level=6).select(
        "query_id", "rank", "id", "d2"
    )


# unbanded query coordinates (every event id yields a query — no nulls)
_Q_LAT_E6 = "(((event_id + 777)*2246822519 + 13) % 170000001) - 85000000"
_Q_LON_E6 = "(((event_id + 777)*2654435761 + 7) % 360000001) - 180000000"

SQL_KNN_BULK = f"""{_PTS_CTE},
q AS (
  SELECT event_id AS query_id,
         {_Q_LAT_E6} AS qlat,
         {_Q_LON_E6} AS qlon
  FROM events
), d AS (
  SELECT q.query_id, pts.id,
         (pts.lat_e6 - q.qlat)*(pts.lat_e6 - q.qlat)
         + LEAST(ABS(pts.lon_e6 - q.qlon), 360000000 - ABS(pts.lon_e6 - q.qlon))
           * LEAST(ABS(pts.lon_e6 - q.qlon), 360000000 - ABS(pts.lon_e6 - q.qlon)) AS d2
  FROM pts, q WHERE pts.u < 90000
)
SELECT query_id, rank, id, d2 FROM (
  SELECT query_id, id, d2,
         row_number() OVER (PARTITION BY query_id ORDER BY d2, id) AS rank
  FROM d
) WHERE rank <= 3"""


# ------------------------------------------------------- dwithin join

# site dimension for the proximity-join gate: a deterministic worldwide
# lattice (exactly-representable x.5 coordinates so the SQL literals are
# bit-identical doubles)
_DW_SITES = [
    (i, float(((i * 37) % 140) - 70) + 0.5, float(((i * 73) % 360) - 180) + 0.5)
    for i in range(24)
]
_DW_RADIUS_M = 200000.0


def q_dwithin_join(spark, sf_dir):
    """ST_DWithin-style proximity join (operators/dwithin.py): pages
    within 200 km (great-circle) of any of 24 sites, via the
    cell-covered broadcast equi-join + exact haversine refine. The
    oracle is the brute-force sites×pages cross join with the identical
    haversine — proving the cell cover is a faithful superset AND the
    refine is exact (this gate also subsumes the old standalone
    `haversine` gate: the same distance expression is value-checked on
    every surviving pair)."""
    from ..operators.dwithin import dwithin_join

    pts = _extracted(spark, sf_dir).where(F.col("has_coords"))
    sites = spark.createDataFrame(_DW_SITES, "site_id long, lat double, lon double")
    return dwithin_join(pts, sites, _DW_RADIUS_M)


def _sql_dwithin() -> str:
    from ..functions.geodesy import haversine_sql

    vals = ", ".join(
        f"({i}, CAST({lat!r} AS DOUBLE), CAST({lon!r} AS DOUBLE))" for i, lat, lon in _DW_SITES
    )
    d = haversine_sql("(lat_e6/1000000.0)", "(lon_e6/1000000.0)", "s.slat", "s.slon")
    return f"""{_PTS_CTE},
sites(site_id, slat, slon) AS (VALUES {vals})
SELECT id, CAST(s.site_id AS BIGINT) AS site_id, CAST(floor({d}) AS BIGINT) AS dist_m
FROM pts, sites s WHERE u < 90000 AND {d} <= {_DW_RADIUS_M!r}"""


def q_haversine(spark, sf_dir):
    """F-family geo scalar: great-circle distance (meters, floored to an
    integer for cross-engine hashing) from every coord page to the
    Diamond centroid (0°N 60°E) — identical op order both engines."""
    from ..functions.geodesy import haversine_m

    pts = _extracted(spark, sf_dir).where(F.col("has_coords"))
    return pts.select(
        "id",
        F.floor(haversine_m(F.col("lat"), F.col("lon"), F.lit(0.0), F.lit(60.0)))
        .cast("long")
        .alias("dist_m"),
    )


def _sql_haversine() -> str:
    from ..functions.geodesy import haversine_sql

    d = haversine_sql("(lat_e6/1000000.0)", "(lon_e6/1000000.0)", "0.0", "60.0")
    return f"""{_PTS_CTE}
SELECT id, CAST(floor({d}) AS BIGINT) AS dist_m
FROM pts WHERE u < 90000"""


def q_assign_country_salted(spark, sf_dir):
    """The explicit shuffle+salt variant (assign_countries_partitioned) —
    same oracle as the broadcast path; pins that skew handling doesn't
    change semantics. Only coord-bearing pages (the variant's domain)."""
    from ..operators.spatial_join import assign_countries_partitioned

    ext = _extracted(spark, sf_dir).where(F.col("has_coords"))
    return assign_countries_partitioned(spark, ext, _index(), salt_buckets=4).select(
        "id", "country_id"
    )


SQL_ASSIGN_SALTED = f"""{_PTS_CTE}
SELECT id, {sql_country_case()} AS country_id FROM pts WHERE u < 90000"""


def q_assign_country_fused(spark, sf_dir):
    """The fused single-Arrow-pass kernel — same oracle as the
    declarative path (operators/fused.py)."""
    from ..operators.fused import fused_extract_assign

    return fused_extract_assign(spark, pages_df(spark, sf_dir), _index()).select(
        "id", "country_id"
    )


_GEOJSON_INDEX_CACHE: dict[str, object] = {}


def _index_geojson(spark):
    """The same world LOADED from a GeoJSON fixture instead of synthesized:
    features serialized to NDJSON (Wrapland re-fused into ONE
    antimeridian-crossing ring; Hotland given a duplicate vertex +
    explicit closure so the repair path runs), read back through the
    Spark NDJSON loader with repair + auto-split, then prepped. Assigning
    against this index must equal assigning against the synthetic twin —
    which is exactly what the shared oracle states."""
    key = spark.sparkContext.applicationId
    cached = _GEOJSON_INDEX_CACHE.get(key)
    if cached is not None:
        return cached

    import copy
    import os
    import shutil
    import tempfile

    import numpy as np

    from ..sources.geojson import load_polygons_geojson, world_to_geojson_lines

    polys = copy.deepcopy(world_polygons())
    for p in polys:
        if p["country_id"] == 1:  # exercise structural repair: dup vertex + closure
            r = p["rings"][0]
            p["rings"] = [np.vstack([r[:1], r[:1], r[1:], r[:1]])]
    lines = world_to_geojson_lines(polys, crossing_ids=(5,))
    d = tempfile.mkdtemp(prefix="world_geojson_")
    path = os.path.join(d, "world.jsonl")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    loaded, stats = load_polygons_geojson(spark, path)
    shutil.rmtree(d, ignore_errors=True)  # index built — fixture no longer needed
    assert any(s["antimeridian_split"] for s in stats), "fixture must exercise the split"
    index = prep_polygons(loaded, level=9)
    # single-slot per app: a harness that spins up many sessions must not
    # accumulate one level-9 polygon index per applicationId
    _GEOJSON_INDEX_CACHE.clear()
    _GEOJSON_INDEX_CACHE[key] = index
    return index


def q_assign_country_geojson(spark, sf_dir):
    return assign_countries(spark, _extracted(spark, sf_dir), _index_geojson(spark)).select(
        "id", "country_id"
    )


@lru_cache(maxsize=1)
def _index_midland_shrunk():
    """The boundary-refresh scenario: Midland (id 2) shrinks to a sliver
    (updateCountries.sh monthly-refresh analog)."""
    import copy

    from ..sources.synth import _rect

    polys2 = copy.deepcopy(world_polygons())
    for p in polys2:
        if p["country_id"] == 2:
            p["rings"] = [_rect(6, 47, 8, 49)]
    return prep_polygons(polys2, level=9)


def q_reassign_changed(spark, sf_dir):
    """J7 (updateCountries.sh:246-304): after a boundary refresh, re-join
    ONLY points whose cell intersects the changed polygon's old/new cover;
    everyone else keeps their checkpointed assignment. The invariant —
    incremental result ≡ full recompute on the new world — is exactly what
    the oracle states (full new-world assignment in SQL)."""
    from ..sources.checkpoint import reassign_changed_polygons

    ext = _extracted(spark, sf_dir)
    old_index, new_index = _index(), _index_midland_shrunk()
    old_assign = assign_countries(spark, ext, old_index).select("id", "country_id")
    return reassign_changed_polygons(spark, ext, old_assign, old_index, new_index, [2])


SQL_REASSIGN_CHANGED = f"""{_PTS_CTE}
SELECT id, {sql_country_case()
    .replace("BETWEEN 6000000 AND 15000000", "BETWEEN 6000000 AND 8000000")
    .replace("BETWEEN 47000000 AND 55000000", "BETWEEN 47000000 AND 49000000")} AS country_id
FROM pts"""


def q_cube_counts(spark, sf_dir):
    """CUBE aggregation coverage (grouping-sets family) over assignments:
    counts by (country_id, lang) with all subtotal combinations."""
    ext = _extracted(spark, sf_dir)
    assigned = assign_countries(spark, ext, _index(), keep_cols=("lang",))
    return (
        assigned.where(F.col("country_id").isNotNull())
        .cube("country_id", "lang")
        .agg(F.count("*").alias("n"))
    )


SQL_CUBE_COUNTS = f"""{_PTS_CTE},
a AS (
  SELECT id, {sql_country_case()} AS country_id,
         (['en','es','de','fr','pt','ja'])[(id % 6) + 1] AS lang
  FROM pts
)
SELECT country_id, lang, count(*) AS n FROM a
WHERE country_id IS NOT NULL
GROUP BY CUBE (country_id, lang)"""


def q_s2_cells(spark, sf_dir):
    """S2-style cell index (cube-face + Morton) — the alternate layout
    key (functions/cells_alt.py): per-cell page counts at level 10.
    The JVM Column, numpy, and SQL encoders are bit-identical twins."""
    from ..functions.cells_alt import s2_cell_col

    pts = _extracted(spark, sf_dir).where(F.col("has_coords"))
    return (
        pts.withColumn("s2_cell", s2_cell_col(F.col("lat"), F.col("lon"), 10))
        .groupBy("s2_cell")
        .agg(F.count("*").alias("n_pages"))
    )


def _sql_s2_cells() -> str:
    from ..functions.cells_alt import s2_sql

    cell = s2_sql("(lat_e6/1000000.0)", "(lon_e6/1000000.0)", 10)
    return f"""{_PTS_CTE}
SELECT {cell} AS s2_cell, count(*) AS n_pages
FROM pts WHERE u < 90000 GROUP BY 1"""


def q_s2_rollup(spark, sf_dir):
    """s2_cells + s2_rollup FOLDED into one gate row (driver 50-query
    cap): the level-10 per-cell counts AND their Morton-shift rollup to
    level 8, union-tagged by `lvl`. The oracle bins DIRECTLY at each
    level, so this simultaneously pins the fine encoder bit-for-bit and
    proves shift-rollup ≡ direct coarse encoding (SURVEY §2.8's
    cell_to_parent-style rollup)."""
    from ..functions.cells_alt import s2_cell_col, s2_parent_col

    pts = _extracted(spark, sf_dir).where(F.col("has_coords"))
    fine = pts.withColumn("c10", s2_cell_col(F.col("lat"), F.col("lon"), 10))
    g10 = (
        fine.groupBy(F.col("c10").alias("s2_cell"))
        .agg(F.count("*").alias("n_pages"))
        .select(F.lit(10).cast("long").alias("lvl"), "s2_cell", "n_pages")
    )
    g8 = (
        fine.withColumn("s2_cell", s2_parent_col(F.col("c10"), 10, 8))
        .groupBy("s2_cell")
        .agg(F.count("*").alias("n_pages"))
        .select(F.lit(8).cast("long").alias("lvl"), "s2_cell", "n_pages")
    )
    return g10.unionByName(g8)


def _sql_s2_rollup() -> str:
    from ..functions.cells_alt import s2_sql

    c10 = s2_sql("(lat_e6/1000000.0)", "(lon_e6/1000000.0)", 10)
    c8 = s2_sql("(lat_e6/1000000.0)", "(lon_e6/1000000.0)", 8)
    return f"""{_PTS_CTE}
SELECT CAST(10 AS BIGINT) AS lvl, {c10} AS s2_cell, count(*) AS n_pages
FROM pts WHERE u < 90000 GROUP BY 2
UNION ALL
SELECT CAST(8 AS BIGINT) AS lvl, {c8} AS s2_cell, count(*) AS n_pages
FROM pts WHERE u < 90000 GROUP BY 2"""


def q_hex_cells(spark, sf_dir):
    """H3-style hexagonal index (axial + cube rounding) — the alternate
    neighborhood key: per-hex page counts at res 6."""
    from ..functions.cells_alt import hex_cell_col

    pts = _extracted(spark, sf_dir).where(F.col("has_coords"))
    return (
        pts.withColumn("hex_cell", hex_cell_col(F.col("lat"), F.col("lon"), 6))
        .groupBy("hex_cell")
        .agg(F.count("*").alias("n_pages"))
    )


def _sql_hex_cells() -> str:
    from ..functions.cells_alt import hex_sql

    cell = hex_sql("(lat_e6/1000000.0)", "(lon_e6/1000000.0)", 6)
    return f"""{_PTS_CTE}
SELECT {cell} AS hex_cell, count(*) AS n_pages
FROM pts WHERE u < 90000 GROUP BY 1"""


def q_streaming_tiles(spark, sf_dir):
    """True Structured Streaming through the driver gate: pages parquet →
    readStream → extraction → event-time-windowed z4 tile counts
    (watermark + tumbling window), run to completion with AvailableNow
    into a memory sink; returns the settled result.

    watermark_delay is set longer than the data's time span so no row is
    dropped regardless of file-batch order — the streaming machinery
    (state store, window aggregation, watermark advance) all runs, and
    the result is deterministic ≡ the batch rollup, which is what the
    SQL oracle states. test_streaming_equals_batch pins the same
    invariant with a realistic delay."""
    import shutil
    import tempfile

    from ..streaming.incremental import streaming_tile_counts

    src = tempfile.mkdtemp(prefix="stream_pages_")
    pages = pages_df(spark, sf_dir)
    pages.write.mode("overwrite").parquet(src)
    stream = streaming_tile_counts(
        spark, src, pages.schema, z=4, window="1 hour", watermark_delay="3650 days"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("streaming_tiles_gate")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the memory sink (driver-resident) absorbed everything — drop the
    # full-corpus temp copy instead of leaking it per run
    shutil.rmtree(src, ignore_errors=True)
    return spark.table("streaming_tiles_gate").select(
        F.col("window_start").cast("timestamp").alias("window_start"), "x", "y", "cnt"
    )


SQL_STREAMING_TILES = f"""{_PTS_CTE}
SELECT date_trunc('hour', ts) AS window_start,
       {_TILE_X.format(n=16)} AS x, {_TILE_Y.format(n=16)} AS y, count(*) AS cnt
FROM pts WHERE u < 90000
GROUP BY 1, 2, 3"""


QUERIES: dict[str, tuple] = {
    "extract_coords": (q_extract_coords, SQL_EXTRACT_COORDS),
    "assign_country_salted": (q_assign_country_salted, SQL_ASSIGN_SALTED),
    "assign_country_fused": (q_assign_country_fused, SQL_ASSIGN_COUNTRY),
    "cube_counts": (q_cube_counts, SQL_CUBE_COUNTS),
    "extract_text_md5": (q_extract_text_md5, SQL_EXTRACT_TEXT_MD5),
    "assign_country": (q_assign_country, SQL_ASSIGN_NEAREST),
    "assign_country_distributed": (q_assign_country_distributed, SQL_ASSIGN_COUNTRY),
    "assign_country_geojson": (q_assign_country_geojson, SQL_ASSIGN_COUNTRY),
    "assign_counts": (q_assign_counts, SQL_ASSIGN_COUNTS),
    "checkpoint_restore": (q_checkpoint_restore, SQL_ASSIGN_COUNTRY),
    "incremental_scan": (q_incremental_scan, SQL_INCREMENTAL_SCAN),
    "tiles_z4": (q_tiles_z4, SQL_TILES_Z4),
    "tiles_by_year": (q_tiles_by_year, SQL_TILES_BY_YEAR),
    "tiles_incremental": (q_tiles_incremental, SQL_TILES_INCREMENTAL),
    "knn": (q_knn, SQL_KNN),
    "knn_bulk": (q_knn_bulk, SQL_KNN_BULK),
    "reassign_changed": (q_reassign_changed, SQL_REASSIGN_CHANGED),
    "streaming_tiles": (q_streaming_tiles, SQL_STREAMING_TILES),
    "tiles_vectorize": (q_tiles_vectorize, _sql_tiles_vectorize()),
    # s2_cells folded into s2_rollup (now union-tagged by lvl — the
    # level-10 encoder stays bit-checked); haversine folded into
    # dwithin_join (same distance expression value-checked per pair).
    # Both slots freed for the new ops under the driver's 50-query cap;
    # q_s2_cells/q_haversine remain as API surface + pytest coverage.
    "s2_rollup": (q_s2_rollup, _sql_s2_rollup()),
    "hex_cells": (q_hex_cells, _sql_hex_cells()),
    "dwithin_join": (q_dwithin_join, _sql_dwithin()),
}
