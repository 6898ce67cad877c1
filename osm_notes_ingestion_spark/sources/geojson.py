"""GeoJSON boundary ingestion → the engine's polygon-dimension model.

Reference analog: the boundary import pipeline — Overpass GeoJSON pulled
per boundary id, converted with ogr2ogr and repaired before load
(bin/lib/functionsProcess.sh:1544-2054; ogr2ogr at :1841-1845; the
ST_MakeValid/Buffer(0) repair cascade at :1891-1989; the hand-written
Pacific antimeridian wrap at
sql/functionsProcess_21_createFunctionToGetCountry.sql:184-186).

Spark-first shape: features are read as NDJSON (one Feature per line —
the scalable layout for big boundary sets) through `spark.read.text` +
an Arrow-batched mapInPandas parser that explodes each feature into
(country_id, priority, name, ring_coords) rows; the driver then collects
the DIMENSION-sized result (admin-0 ≈ few hundred rows) and builds the
broadcastable `PolygonIndex` via the usual prep. A single-document
FeatureCollection file is also accepted (parsed driver-side — it is a
build artifact, not a fact table).

Ring pipeline per feature: structural repair (repair_rings — clean /
re-node / drop) then ANTIMERIDIAN AUTO-SPLIT (split_antimeridian): any
ring with an edge jumping more than 180° of longitude is unwrapped into
continuous lon space, clipped at lon=180 into west/east parts, and the
seam edges are pushed outward by half a microdegree so a point encoded
at exactly +180.0 or −180.0 (both encodings of the same meridian) stays
INTERIOR to the side that touches it — splitting must not turn interior
points into excluded boundary points. The parts are numerically disjoint
(west ≤ 180+ε, east ≥ −180−ε), so they stay in one even-odd ring group.
Polar-cap rings that legitimately span all longitudes (vertices stepping
around with small jumps) are untouched — no edge exceeds the threshold.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.geometry import repair_rings

SEAM_EPS = 5e-7  # half a microdegree — matches the synth world's edge offset

_RING_SCHEMA = T.StructType(
    [
        T.StructField("country_id", T.LongType(), False),
        T.StructField("priority", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("part", T.IntegerType(), False),
        T.StructField("ring", T.IntegerType(), False),
        T.StructField("lons", T.ArrayType(T.DoubleType()), False),
        T.StructField("lats", T.ArrayType(T.DoubleType()), False),
    ]
)


def _feature_ring_rows(feat: dict, id_prop: str, priority_prop: str, name_prop: str):
    props = feat.get("properties") or {}
    geom = feat.get("geometry") or {}
    gtype = geom.get("type")
    if gtype == "Polygon":
        parts = [geom.get("coordinates") or []]
    elif gtype == "MultiPolygon":
        parts = geom.get("coordinates") or []
    else:
        # NOT silently dropped: a boundary file full of LineStrings would
        # otherwise "load" zero polygons and assign -1 everywhere;
        # on_error='skip' surfaces it in stats, the default fails loudly
        raise ValueError(f"unsupported geometry type {gtype!r} for boundary feature")
    cid = int(props[id_prop])
    prio = int(props.get(priority_prop, 0))
    name = props.get(name_prop)
    for pi, rings in enumerate(parts):
        for ri, ring in enumerate(rings):
            if not ring:
                continue
            lons = [float(v[0]) for v in ring]
            lats = [float(v[1]) for v in ring]
            yield (cid, prio, name, pi, ri, lons, lats)


def read_geojson_features(
    spark: SparkSession,
    path: str,
    id_prop: str = "country_id",
    priority_prop: str = "priority",
    name_prop: str = "name",
    on_error: str = "fail",
) -> DataFrame:
    """NDJSON Features → one row per ring (distributed parse).

    Tolerates JSON-array framing noise (lines that are '[' / ']' or have
    trailing commas) so a pretty-printed feature-per-line array also
    loads. on_error: 'fail' raises on a malformed feature line (default —
    a corrupt boundary file should stop the build); 'skip' drops it and
    emits a sentinel row (country_id = -1, name = the first 120 chars of
    the bad line) so the loader's stats surface the skip count instead of
    losing it silently."""
    if on_error not in ("fail", "skip"):
        raise ValueError(f"unknown on_error {on_error!r}")
    lines = spark.read.text(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                s = (line or "").strip().rstrip(",")
                if not s or s in ("[", "]"):
                    continue
                try:
                    feat = json.loads(s)
                    rows.extend(_feature_ring_rows(feat, id_prop, priority_prop, name_prop))
                except (ValueError, KeyError, TypeError):
                    if on_error == "fail":
                        raise
                    rows.append((-1, 0, s[:120], 0, 0, [], []))
            yield pd.DataFrame(
                rows, columns=["country_id", "priority", "name", "part", "ring", "lons", "lats"]
            )

    return lines.mapInPandas(parse, schema=_RING_SCHEMA)


def split_antimeridian(
    rings: list[np.ndarray], seam_grow: float = SEAM_EPS
) -> tuple[list[np.ndarray], bool, bool]:
    """Auto-split rings that cross lon=±180. Returns
    (rings, did_split, unsplittable_crossing).

    `unsplittable_crossing` is True when a ring HAS a >180° jump edge but
    its unwrapped longitudinal span is >= 180° (e.g. a very wide
    territory+EEZ shape crossing both lon=0 and the seam the long way
    round): the unwrap heuristic cannot disambiguate it, the ring passes
    through UNSPLIT, and planar containment across the seam is wrong for
    it — callers must surface this (the loader records it per-feature and
    raises under on_error='fail') rather than treat it like a benign
    polar band.

    Per ring: if any edge jumps more than 180° of longitude, the ring is
    unwrapped (negative lons +360), clipped against x≤180 and x≥180
    (Sutherland–Hodgman per half-plane — parity-safe: any bridge segments
    a concave shape produces lie on the cut line as coincident
    anti-parallel pairs, contributing even crossing counts), and the east
    part is shifted back by 360. Cut vertices land exactly on ±180 and
    are then pushed outward by `seam_grow` so the seam meridian — under
    either numeric encoding — remains interior, mirroring the half-µdeg
    closed-interval convention of the polygon world. Non-crossing rings
    (including all-longitude polar bands with small per-edge steps) pass
    through untouched.
    """
    out: list[np.ndarray] = []
    did = False
    unsplittable = False
    for r in rings:
        lon = r[:, 0]
        jumps = np.abs(np.diff(np.append(lon, lon[0])))
        if not (jumps > 180.0).any():
            out.append(r)
            continue
        ulon = np.where(lon < 0, lon + 360.0, lon)
        # sanity: the unwrap (negative lons +360) is only meaningful for
        # shapes whose longitudinal extent is < 180° — a ring spanning
        # more (e.g. a full band mis-encoded with one jump edge, or a
        # shape crossing BOTH lon=0 and the seam the long way round)
        # would come out as garbage, so pass it through untouched — but
        # FLAGGED, because the jump edge stays in the planar index where
        # containment across the seam is wrong
        if float(ulon.max() - ulon.min()) >= 180.0:
            out.append(r)
            unsplittable = True
            continue
        # a genuine crossing has vertices strictly on BOTH sides of the
        # seam after unwrapping; a full-band rect like [-180..180] × lat
        # collapses to all-180 and must pass through, not degenerate
        if not ((ulon < 180.0).any() and (ulon > 180.0).any()):
            out.append(r)
            continue
        did = True
        ur = np.stack([ulon, r[:, 1]], axis=1)
        west = _clip_halfplane(ur, x0=180.0, keep_le=True)
        east = _clip_halfplane(ur, x0=180.0, keep_le=False)
        if west is not None:
            west[:, 0] = np.where(west[:, 0] == 180.0, 180.0 + seam_grow, west[:, 0])
            out.append(west)
        if east is not None:
            east[:, 0] -= 360.0
            east[:, 0] = np.where(east[:, 0] == -180.0, -180.0 - seam_grow, east[:, 0])
            out.append(east)
    return out, did, unsplittable


def _clip_halfplane(ring: np.ndarray, x0: float, keep_le: bool) -> np.ndarray | None:
    """Sutherland–Hodgman clip of a ring against x≤x0 (or x≥x0).

    Intersection vertices get x set EXACTLY to x0 (so the seam-grow pass
    can identify them by equality). Returns None if the clipped ring is
    degenerate (<3 distinct vertices).
    """

    def inside(x: float) -> bool:
        return x <= x0 if keep_le else x >= x0

    out: list[np.ndarray] = []
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        ia, ib = inside(a[0]), inside(b[0])
        if ia:
            out.append(a)
        if ia != ib:
            t = (x0 - a[0]) / (b[0] - a[0])
            out.append(np.array([x0, a[1] + t * (b[1] - a[1])]))
    if len(out) < 3:
        return None
    arr = np.asarray(out, dtype=np.float64)
    keep = np.ones(len(arr), dtype=bool)
    keep[1:] = ~(arr[1:] == arr[:-1]).all(axis=1)
    if (arr[0] == arr[-1]).all() and keep.sum() > 1:
        keep[-1] = False
    arr = arr[keep]
    if len(np.unique(arr, axis=0)) < 3:
        return None
    return arr


def load_polygons_geojson(
    spark: SparkSession,
    path: str,
    id_prop: str = "country_id",
    priority_prop: str = "priority",
    name_prop: str = "name",
    autosplit: bool = True,
    repair: bool = True,
    on_error: str = "fail",
) -> tuple[list[dict], list[dict]]:
    """GeoJSON (NDJSON features or a FeatureCollection file) →
    ([{country_id, priority, name, rings}], per-feature stats).

    Stats rows: {country_id, n_rings_in, n_rings_out, repair_method,
    antimeridian_split, unsplittable_crossing} — the loader twin of the
    reference's boundary
    import log (functionsProcess.sh:1891-1989 logs which repair step
    fired per boundary).

    Multiple features sharing one country_id merge into a single
    even-odd ring group: correct for DISJOINT parts (islands as separate
    Features — parity of disjoint rings is their union), but two
    OVERLAPPING features with the same id would parity-cancel in the
    overlap; de-duplicate upstream if your source emits those (admin-0
    sources emit one (Multi)Polygon feature per country).

    SIZE GUIDANCE: this function returns DRIVER-RESIDENT polygons (rings
    are collected) — right for admin-0-sized dimensions (~10² features)
    feeding `prep_polygons` + broadcast. For large dimensions (admin-2
    worldwide, parcels) do NOT collect: feed `read_geojson_features`
    (ring rows stay distributed) straight into
    `sources.polygons.prep_polygons_distributed` and assign with
    `operators.spatial_join.assign_countries_distributed` — split/
    repair/cover then run per-feature on executors and refinement is
    cell-local, with no driver geometry at any point.
    """
    # format detection by PARSING, not substring sniffing: try the first
    # non-empty line as standalone JSON — a Feature (or single-line FC)
    # decides the format; an unparseable first line means a multi-line
    # document → whole-file parse. (A name like "FeatureCollection
    # Export" inside an NDJSON feature must not misroute it.)
    doc = None
    local = path.removeprefix("file:")
    try:
        with open(local) as fh:
            first = ""
            for line in fh:
                s = line.strip().rstrip(",")
                if s and s not in ("[", "]"):
                    first = s
                    break
        try:
            head_obj = json.loads(first) if first else None
        except ValueError:
            head_obj = None
        if head_obj is None or (
            isinstance(head_obj, dict) and head_obj.get("type") == "FeatureCollection"
        ):
            try:
                with open(local) as fh:
                    doc = json.load(fh)
            except ValueError:
                doc = None  # not a JSON document → NDJSON path (+ on_error)
            if not (isinstance(doc, dict) and doc.get("type") == "FeatureCollection"):
                doc = None
    except OSError:
        pass  # non-local path (object store) → NDJSON via Spark below
    if doc is not None:
        # single-document collection: a build artifact, parsed driver-side
        raw_rows = []
        for feat in doc.get("features", []):
            try:
                raw_rows.extend(_feature_ring_rows(feat, id_prop, priority_prop, name_prop))
            except (ValueError, KeyError, TypeError):
                if on_error == "fail":
                    raise
                raw_rows.append((-1, 0, json.dumps(feat)[:120], 0, 0, [], []))
    else:
        raw_rows = [
            (r.country_id, r.priority, r.name, r.part, r.ring, list(r.lons), list(r.lats))
            for r in read_geojson_features(
                spark, path, id_prop, priority_prop, name_prop, on_error=on_error
            ).collect()
        ]

    skipped = [r for r in raw_rows if r[0] == -1 and not r[5]]
    raw_rows = [r for r in raw_rows if not (r[0] == -1 and not r[5])]

    by_feature: dict[int, dict] = {}
    for cid, prio, name, part, ring_i, lons, lats in sorted(
        raw_rows, key=lambda t: (t[0], t[3], t[4])
    ):
        entry = by_feature.setdefault(
            cid, {"country_id": cid, "priority": prio, "name": name, "rings": []}
        )
        entry["rings"].append(np.stack([np.asarray(lons), np.asarray(lats)], axis=1))

    polys: list[dict] = []
    stats: list[dict] = []
    for cid in sorted(by_feature):
        entry = by_feature[cid]
        rings = entry["rings"]
        n_in = len(rings)
        # SPLIT FIRST: a crossing ring's >180° jump edges self-intersect
        # other edges in planar lon space, so running the repair cascade
        # first would re-node the planar ARTIFACT and hand the splitter
        # corrupted geometry; the splitter needs only the raw jump edges
        did_split = False
        unsplittable = False
        if autosplit:
            rings, did_split, unsplittable = split_antimeridian(rings)
            if unsplittable and on_error == "fail":
                raise ValueError(
                    f"feature {cid!r}: ring crosses the antimeridian but its "
                    "unwrapped lon span is >= 180° — cannot be auto-split; "
                    "pre-split the geometry or load with on_error='skip' "
                    "(the feature will be flagged unsplittable_crossing=True)"
                )
        method = "none"
        if repair:
            rings, method = repair_rings(rings)
        stats.append(
            {
                "country_id": cid,
                "n_rings_in": n_in,
                "n_rings_out": len(rings),
                "repair_method": method,
                "antimeridian_split": did_split,
                "unsplittable_crossing": unsplittable,
            }
        )
        if not rings:
            continue
        polys.append({**entry, "rings": rings})
    for bad in skipped:
        stats.append(
            {
                "country_id": None,
                "n_rings_in": 0,
                "n_rings_out": 0,
                "repair_method": "skipped_parse_error",
                "antimeridian_split": False,
                "unsplittable_crossing": False,
                "bad_line_head": bad[2],
            }
        )
    return polys, stats


def _densify(ring: np.ndarray, max_dlon: float = 120.0) -> np.ndarray:
    """Insert intermediate vertices on edges whose lon span exceeds
    `max_dlon`, keeping the geometry identical (collinear points)."""
    out = []
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        out.append(a)
        span = abs(b[0] - a[0])
        if span > max_dlon:
            k = int(np.ceil(span / max_dlon))
            for j in range(1, k):
                out.append(a + (b - a) * (j / k))
    return np.asarray(out, dtype=np.float64)


def world_to_geojson_lines(polys: list[dict], crossing_ids: tuple[int, ...] = ()) -> list[str]:
    """Serialize a polygon world to NDJSON Feature lines (fixture writer).

    For ids in `crossing_ids`, pairs of rings that touch ±180 (an east
    part and a west part of the same shape) are re-fused into ONE
    antimeridian-CROSSING ring — the RFC-7946-violating-but-common
    encoding real EEZ data uses — so a loader round-trip exercises the
    auto-split. Fusing: the east part's lons get +360 (continuous space),
    the union bbox becomes one ring spanning the seam, then lons >180 are
    wrapped to negative — producing the raw jumpy encoding.
    """
    lines = []
    for p in polys:
        rings = [np.asarray(r, dtype=np.float64) for r in p["rings"]]
        if p["country_id"] in crossing_ids and len(rings) == 2:
            west = rings[0] if rings[0][:, 0].max() > 0 else rings[1]
            east = rings[1] if rings[0][:, 0].max() > 0 else rings[0]
            lo = float(west[:, 0].min())
            hi = float(east[:, 0].max()) + 360.0
            la0 = float(min(r[:, 1].min() for r in rings))
            la1 = float(max(r[:, 1].max() for r in rings))
            fused = np.array([[lo, la0], [hi, la0], [hi, la1], [lo, la1]])
            fused[:, 0] = np.where(fused[:, 0] > 180.0, fused[:, 0] - 360.0, fused[:, 0])
            rings = [fused]
        else:
            # full-longitude planar bands (polar caps): densify >180° edges
            # with intermediate vertices so the loader does NOT read them
            # as antimeridian crossings — the standard polar-cap encoding
            rings = [_densify(r) for r in rings]
        coords = [[[float(x), float(y)] for x, y in np.vstack([r, r[:1]])] for r in rings]
        feat = {
            "type": "Feature",
            "properties": {
                "country_id": int(p["country_id"]),
                "priority": int(p.get("priority", 0)),
                "name": p.get("name"),
            },
            "geometry": {"type": "Polygon", "coordinates": coords},
        }
        lines.append(json.dumps(feat))
    return lines
