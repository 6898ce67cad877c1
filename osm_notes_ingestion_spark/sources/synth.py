"""Deterministic synthetic pages + polygon world, derived from testdata.

The Common-Crawl-style `pages` table (BASELINE.json input_hint:
url, warc_ts, html binary, text, lang) is derived 1:1 (or fanned out) from
the driver-generated `events` parquet via pure integer arithmetic, so the
SAME rows can be reconstructed by the DuckDB oracle from identical SQL
fragments. No randomness, no external data; identical at every
parallelism level.

Coordinate model (all integer microdegrees, 'e6'):
    u      = (id*48271 + 11) % 100000          -- uniform pseudo-key
    u <25k → point in the 'Hotland' rect        (25% — hot-polygon skew,
             mirrors the reference's USA-first priority tuning,
             sql/functionsProcess_31_organizeAreas.sql:14)
    u <40k → point in the 'Midland' rect        (15% — Germany analog)
    u <90k → global uniform lat∈[-85,85], lon∈[-180,180]
    u <97k → page has NO coordinates            (null assignment)
    else   → INVALID lat>90 embedded            (validation reject,
             reference bin/lib/functionsProcess.sh:2705+)

Polygon world: every edge sits at a half-microdegree offset so no
generated integer-µdeg point is ever exactly on a boundary — PIP
containment is then exactly equivalent to closed integer intervals, which
is what the DuckDB oracle evaluates.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPS = 5e-7  # half a microdegree

# ------------------------------------------------------------ SQL fragments
# Portable between Spark SQL and DuckDB (integer arithmetic + CASE only).


def sql_u(id_expr: str = "id") -> str:
    return f"(({id_expr} * 48271 + 11) % 100000)"


def sql_lat_e6(id_expr: str = "id") -> str:
    u = sql_u(id_expr)
    return (
        f"CASE WHEN {u} < 25000 THEN 25000000 + (({id_expr}*2246822519 + 13) % 24000000) "
        f"WHEN {u} < 40000 THEN 47000000 + (({id_expr}*2246822519 + 13) % 8000000) "
        f"WHEN {u} < 90000 THEN (({id_expr}*2246822519 + 13) % 170000001) - 85000000 "
        f"ELSE NULL END"
    )


def sql_lon_e6(id_expr: str = "id") -> str:
    u = sql_u(id_expr)
    return (
        f"CASE WHEN {u} < 25000 THEN -125000000 + (({id_expr}*2654435761 + 7) % 60000000) "
        f"WHEN {u} < 40000 THEN 6000000 + (({id_expr}*2654435761 + 7) % 9000000) "
        f"WHEN {u} < 90000 THEN (({id_expr}*2654435761 + 7) % 360000001) - 180000000 "
        f"ELSE NULL END"
    )


# lat embedded in html when the page is in the INVALID band (u >= 97000)
def sql_invalid_lat_e6(id_expr: str = "id") -> str:
    return f"(91000000 + ({id_expr} % 4000000))"


def sql_invalid_lon_e6(id_expr: str = "id") -> str:
    return f"((({id_expr}*2654435761 + 7) % 360000001) - 180000000)"


def sql_has_coords(id_expr: str = "id") -> str:
    return f"({sql_u(id_expr)} < 90000)"


def sql_country_case(lat: str = "lat_e6", lon: str = "lon_e6") -> str:
    """Ground-truth country assignment over integer-µdeg coordinates.

    CASE order = (priority, country_id) — the reference's
    first-match-by-priority semantics (get_country loop,
    sql/functionsProcess_21_createFunctionToGetCountry.sql:204-220).
    """
    return f"""CASE
      WHEN {lat} IS NULL THEN NULL
      WHEN {lon} BETWEEN -125000000 AND -65000000 AND {lat} BETWEEN 25000000 AND 49000000 THEN 1
      WHEN {lon} BETWEEN 6000000 AND 15000000 AND {lat} BETWEEN 47000000 AND 55000000 THEN 2
      WHEN ABS({lat}) + ABS({lon} - 60000000) <= 10000000 THEN 3
      WHEN {lon} BETWEEN -60000000 AND -30000000 AND {lat} BETWEEN -50000000 AND -20000000
           AND NOT ({lon} BETWEEN -50000000 AND -40000000 AND {lat} BETWEEN -40000000 AND -30000000) THEN 4
      WHEN ({lon} >= 170000000 OR {lon} <= -170000000) AND {lat} BETWEEN -30000000 AND 10000000 THEN 5
      WHEN {lat} >= 80000000 THEN 6
      WHEN {lon} BETWEEN -135000000 AND -55000000 AND {lat} BETWEEN 15000000 AND 59000000 THEN 7
      WHEN ABS({lat}) + ABS({lon} - 60000000) <= 18000000 THEN 8
      ELSE -1 END"""


def sql_page_text(id_expr: str = "id", et: str = "event_type", props: str = "props") -> str:
    """Ground-truth extracted text (pre-HTML-encoding). Contains <,>,&,",
    newline, JSON braces and (for id%7=0) non-ASCII — the reference's
    entity/CSV hazards (awk/extract_comment_texts.awk:65-160)."""
    return (
        f"('Doc #' || {id_expr} || chr(10) || '<' || {et} || '> & ' || {props} || "
        f"CASE WHEN {id_expr} % 7 = 0 THEN ' Côte d''Ivoire' ELSE '' END)"
    )


def sql_nearest_values() -> str:
    """VALUES rows (cid, ax, ay, vx, vy, len2) — every wraparound segment
    of every world ring in µdeg float64, literals emitted with repr()
    (shortest round-trip: DuckDB's correctly-rounded parse recovers the
    identical double). vx/vy/len2 precomputed in numpy so the oracle and
    operators/nearest.py share bit-identical segment constants."""
    rows = []
    for p in world_polygons():
        cid = p["country_id"]
        for ring in p["rings"]:
            v = np.asarray(ring, dtype=np.float64) * 1e6
            nxt = np.roll(v, -1, axis=0)
            for (ax, ay), (bx, by) in zip(v, nxt):
                if ax == bx and ay == by:
                    continue
                vx, vy = bx - ax, by - ay
                len2 = vx * vx + vy * vy
                rows.append(
                    f"({cid}, {float(ax)!r}, {float(ay)!r}, "
                    f"{float(vx)!r}, {float(vy)!r}, {float(len2)!r})"
                )
    return ",\n  ".join(rows)


def sql_seg_d2(shift: float) -> str:
    """Point-segment squared distance for one longitude shift, spelled in
    the EXACT IEEE operation sequence operators/nearest.py uses (see its
    exactness contract): t = clip((w.v)/len2, 0, 1); d2 = |w - t v|^2.
    Expects columns px, py (point µdeg doubles) and ax, ay, vx, vy, len2
    (segment constants). Subexpressions are textually inlined — repeated
    evaluation is deterministic, so the value is unchanged."""
    wx = f"((px + {float(shift)!r}) - ax)"
    wy = "(py - ay)"
    t = f"LEAST(GREATEST((({wx} * vx) + ({wy} * vy)) / len2, 0.0), 1.0)"
    dx = f"({wx} - ({t} * vx))"
    dy = f"({wy} - ({t} * vy))"
    return f"(({dx} * {dx}) + ({dy} * {dy}))"


# ------------------------------------------------------------ polygon world

# (country_id, name, priority); geometry built in world_polygons()
WORLD = [
    (1, "Hotland", 1),
    (2, "Midland", 1),
    (3, "Diamond", 2),
    (4, "Holey", 2),
    (5, "Wrapland", 2),
    (6, "Arctica", 3),
    (7, "Hotland EEZ", 5),
    (8, "Diamond EEZ", 6),
]


def _rect(lo_lon, lo_lat, hi_lon, hi_lat, grow=EPS) -> np.ndarray:
    """CCW rect with edges pushed out by half a µdeg."""
    a, b, c, d = lo_lon - grow, lo_lat - grow, hi_lon + grow, hi_lat + grow
    return np.array([[a, b], [c, b], [c, d], [a, d]], dtype=np.float64)


def _diamond(cx, cy, r, grow=EPS) -> np.ndarray:
    rr = r + grow
    return np.array([[cx - rr, cy], [cx, cy - rr], [cx + rr, cy], [cx, cy + rr]], dtype=np.float64)


def world_polygons() -> list[dict]:
    """The synthetic admin-0 world (8 'countries', exercises: hot skewed
    rects, slanted edges, hole, multipolygon antimeridian wrap, polar cap,
    overlapping land-vs-EEZ priorities)."""
    return [
        {"country_id": 1, "name": "Hotland", "priority": 1, "rings": [_rect(-125, 25, -65, 49)]},
        {"country_id": 2, "name": "Midland", "priority": 1, "rings": [_rect(6, 47, 15, 55)]},
        {"country_id": 3, "name": "Diamond", "priority": 2, "rings": [_diamond(60.0, 0.0, 10.0)]},
        {
            "country_id": 4,
            "name": "Holey",
            "priority": 2,
            # hole ring shrunk inward so integer points in [-50,-40]x[-40,-30]
            # are inside the hole (excluded by even-odd parity)
            "rings": [_rect(-60, -50, -30, -20), _rect(-50, -40, -40, -30)],
        },
        {
            "country_id": 5,
            "name": "Wrapland",
            "priority": 2,
            "rings": [_rect(170, -30, 180, 10), _rect(-180, -30, -170, 10)],
        },
        {"country_id": 6, "name": "Arctica", "priority": 3, "rings": [_rect(-180, 80, 180, 90)]},
        {"country_id": 7, "name": "Hotland EEZ", "priority": 5, "rings": [_rect(-135, 15, -55, 59)]},
        {"country_id": 8, "name": "Diamond EEZ", "priority": 6, "rings": [_diamond(60.0, 0.0, 18.0)]},
    ]


# ------------------------------------------------------------ pages builder


def pages_df(spark: SparkSession, sf_dir: str, fanout: int = 1) -> DataFrame:
    """Common-Crawl-style pages table derived from events.parquet.

    All construction is JVM-side expression work (whole-stage codegen);
    the html embeds coordinates in one of three formats (rotating by id%3)
    plus an entity-encoded text payload the extraction UDF must recover
    byte-identically (input_hint invariant).
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # small source files plan to 1-2 splits; without this the whole
    # downstream map-only pipeline (html synth → extraction → assignment)
    # runs on a fraction of the cluster. A real crawl table has thousands
    # of files and never needs it; a bootstrap from a small seed does.
    ev = ev.repartition(spark.sparkContext.defaultParallelism)
    if fanout > 1:
        ev = ev.withColumn("_i", F.explode(F.sequence(F.lit(0), F.lit(fanout - 1)))).withColumn(
            "id", F.col("event_id") * fanout + F.col("_i")
        )
    else:
        ev = ev.withColumn("id", F.col("event_id"))

    lat_e6 = F.expr(sql_lat_e6("id"))
    lon_e6 = F.expr(sql_lon_e6("id"))
    u = F.expr(sql_u("id"))
    # coordinates as rendered into the html (invalid band gets bad lat)
    render_lat = F.when(u >= 97000, F.expr(sql_invalid_lat_e6("id"))).otherwise(lat_e6)
    render_lon = F.when(u >= 97000, F.expr(sql_invalid_lon_e6("id"))).otherwise(lon_e6)
    lat_s = F.format_string("%.6f", render_lat.cast("double") / F.lit(1e6))
    lon_s = F.format_string("%.6f", render_lon.cast("double") / F.lit(1e6))

    text = F.expr(sql_page_text("id", "event_type", "props"))
    enc = text
    for src, dst in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&apos;")]:
        enc = F.replace(enc, F.lit(src), F.lit(dst))

    has_render = (u < 90000) | (u >= 97000)
    meta = F.when(
        has_render & (F.col("id") % 3 == 0),
        F.concat(F.lit('<meta name="geo.position" content="'), lat_s, F.lit(";"), lon_s, F.lit('">')),
    ).otherwise(F.lit(""))
    div = F.when(
        has_render & (F.col("id") % 3 == 1),
        F.concat(F.lit('<div data-lat="'), lat_s, F.lit('" data-lon="'), lon_s, F.lit('"></div>')),
    ).otherwise(F.lit(""))
    span = F.when(
        has_render & (F.col("id") % 3 == 2),
        F.concat(F.lit("<span>GPS: "), lat_s, F.lit(", "), lon_s, F.lit("</span>")),
    ).otherwise(F.lit(""))

    html = F.concat(
        F.lit("<html><head><title>page</title>"),
        meta,
        F.lit('</head><body><p class="c">'),
        enc,
        F.lit("</p>"),
        div,
        span,
        F.lit("</body></html>"),
    )

    langs = F.array([F.lit(x) for x in ["en", "es", "de", "fr", "pt", "ja"]])
    return ev.select(
        F.col("id"),
        F.concat(F.lit("https://example.org/page/"), F.col("id")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.element_at(langs, (F.col("id") % 6 + 1).cast("int")).alias("lang"),
    )
