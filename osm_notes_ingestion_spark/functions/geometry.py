"""Pure-numpy planar geometry: point-in-polygon + quadtree cell cover.

Replaces the reference's PostGIS surface (ST_Contains / GiST index /
ST_MakeValid-ST_Union repair cascade — bin/lib/functionsProcess.sh:1891-1989,
sql/functionsProcess_21_createFunctionToGetCountry.sql:204-220) with:

- `PolygonPack`: polygons flattened into contiguous numpy arrays; one pack
  for the whole polygon dimension, pickled into a Spark broadcast and
  shared by every Arrow batch on an executor (the analog of PostGIS
  prepared geometries cached per backend).
- `points_in_polygon`: vectorized even-odd (ray-casting) test — handles
  holes and multipolygon parts with no special casing because parity
  composes. Boundary convention (PINNED): a point exactly on any ring
  edge or vertex is NOT contained — PostGIS ST_Contains semantics
  (boundary excluded), computed deterministically with an explicit
  on-segment test in the same vectorized pass (tests pin vertex /
  horizontal-edge / vertical-edge fixtures). Synthetic fixtures still
  place vertices at half-microdegree offsets so integer-µdeg points
  exercise the interior/exterior paths, not the boundary rule.
- `cover_polygon`: recursive quadtree cover at a target geocell level,
  classifying each cell FULL (entirely inside → containment proven, no
  exact test needed at join time) or PARTIAL (boundary cell → exact PIP
  refinement). This is the engine's replacement for both the GiST index
  and the reference's 24-zone priority grid.

Polygon model: a "polygon" is a list of rings; each ring is an (N,2)
float64 array of (lon, lat) vertices (closed implicitly). Exterior vs
hole need not be distinguished (even-odd parity). Multipolygon = just
more rings. Antimeridian-straddling shapes must be pre-split into
east/west parts (rings never cross lon=±180), mirroring how the reference
hand-wraps its Pacific zone.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

FULL = 1
PARTIAL = 2
OUTSIDE = 0


def points_in_rings(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd PIP of many points against one polygon (list of rings).

    px, py: (M,) lon/lat arrays. Returns bool (M,).
    Vectorized over points AND edges: O(M * E) numpy ops, no Python loop
    over points. E (total edges per polygon) is small (≤ a few thousand
    for admin-0 shapes); M is the Arrow batch.

    Boundary convention (pinned, ST_Contains semantics): a point exactly
    on an edge or vertex is NOT contained. The signed-area term `t` of
    the crossing test doubles as the exact collinearity test (t == 0 on
    the supporting line), so the boundary mask costs no extra pass.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape[0], dtype=bool)
    on_edge = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        x1 = ring[:, 0]
        y1 = ring[:, 1]
        x2 = np.roll(x1, -1)
        y2 = np.roll(y1, -1)
        dx = (x2 - x1)[None, :]
        dy = (y2 - y1)[None, :]
        rx = px[:, None] - x1[None, :]
        ry = py[:, None] - y1[None, :]
        # signed area of (edge, point): t = rx*dy - ry*dx.
        # t == 0 ⟺ point on the edge's supporting line (exact for the
        # axis-aligned fixtures; float-exactness caveat only for slanted
        # edges, where the convention test uses representable points).
        t = rx * dy - ry * dx
        # half-open crossing rule (skips horizontal edges, counts each
        # vertex once); "px strictly left of the intersection" expressed
        # multiplication-only: sign(t) agrees with the edge direction.
        cond = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
        strike = cond & ((t < 0) == (dy > 0)) & (t != 0)
        inside ^= (strike.sum(axis=1) % 2).astype(bool)
        # boundary: collinear AND within the edge's bbox
        bx_lo = np.minimum(x1, x2)[None, :]
        bx_hi = np.maximum(x1, x2)[None, :]
        by_lo = np.minimum(y1, y2)[None, :]
        by_hi = np.maximum(y1, y2)[None, :]
        on = (
            (t == 0)
            & (px[:, None] >= bx_lo)
            & (px[:, None] <= bx_hi)
            & (py[:, None] >= by_lo)
            & (py[:, None] <= by_hi)
        )
        on_edge |= on.any(axis=1)
    return inside & ~on_edge


def segments_intersect_rect(
    rings: list[np.ndarray], lon_min: float, lat_min: float, lon_max: float, lat_max: float
) -> bool:
    """True if any ring edge intersects the axis-aligned rect (inclusive).

    Uses a Cohen–Sutherland-style outcode reject then exact separating-axis
    test for the remaining candidates.
    """
    for ring in rings:
        x1, y1 = ring[:, 0], ring[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        # trivially outside on one side → no intersection
        reject = (
            ((x1 < lon_min) & (x2 < lon_min))
            | ((x1 > lon_max) & (x2 > lon_max))
            | ((y1 < lat_min) & (y2 < lat_min))
            | ((y1 > lat_max) & (y2 > lat_max))
        )
        cand = ~reject
        if not cand.any():
            continue
        cx1, cy1, cx2, cy2 = x1[cand], y1[cand], x2[cand], y2[cand]
        # endpoint inside rect → intersects
        def _inside(x, y):
            return (x >= lon_min) & (x <= lon_max) & (y >= lat_min) & (y <= lat_max)

        if (_inside(cx1, cy1) | _inside(cx2, cy2)).any():
            return True
        # segment crosses rect without endpoints inside: test against the
        # 4 rect edges with cross-product orientation tests
        corners = np.array(
            [
                [lon_min, lat_min],
                [lon_max, lat_min],
                [lon_max, lat_max],
                [lon_min, lat_max],
            ]
        )
        dx, dy = cx2 - cx1, cy2 - cy1
        for i in range(4):
            ax, ay = corners[i]
            bx, by = corners[(i + 1) % 4]
            d1 = dx * (ay - cy1) - dy * (ax - cx1)
            d2 = dx * (by - cy1) - dy * (bx - cx1)
            ex, ey = bx - ax, by - ay
            d3 = ex * (cy1 - ay) - ey * (cx1 - ax)
            d4 = ex * (cy2 - ay) - ey * (cx2 - ax)
            if ((d1 * d2 <= 0) & (d3 * d4 <= 0)).any():
                return True
    return False


def classify_rect(rings: list[np.ndarray], bbox, lon_min, lat_min, lon_max, lat_max) -> int:
    """FULL / PARTIAL / OUTSIDE classification of a rect vs a polygon."""
    plon_min, plat_min, plon_max, plat_max = bbox
    if lon_max < plon_min or lon_min > plon_max or lat_max < plat_min or lat_min > plat_max:
        return OUTSIDE
    if segments_intersect_rect(rings, lon_min, lat_min, lon_max, lat_max):
        return PARTIAL
    # no edge crosses the rect → rect is uniformly inside or outside;
    # test the center point
    cx = np.array([(lon_min + lon_max) / 2.0])
    cy = np.array([(lat_min + lat_max) / 2.0])
    return FULL if points_in_rings(cx, cy, rings)[0] else OUTSIDE


def cover_polygon(rings: list[np.ndarray], level: int, coarse_level: int = 3):
    """Quadtree cover of a polygon at geocell `level`.

    Returns (full_cells, partial_cells) as int64 arrays of geocell ids.
    Recursion starts at `coarse_level` and splits PARTIAL cells until
    `level`; FULL cells found early are expanded to `level` children? No —
    FULL cells are emitted AT THE LEVEL THEY WERE PROVEN, then expanded
    lazily: we emit them at target level only if the expansion is small,
    otherwise we keep a mixed-resolution cover and the join side encodes
    points at every cover level present. To keep the join single-keyed we
    expand everything to `level` here; covers are built once at polygon
    prep (driver side, ~250 polygons) so the cost is irrelevant, and cover
    size at level ≤ 9 is bounded.
    """
    from .cells import MAX_LEVEL, cell_bounds, encode_xy

    if level > MAX_LEVEL:
        raise ValueError("level too deep")
    bbox = (
        min(float(r[:, 0].min()) for r in rings),
        min(float(r[:, 1].min()) for r in rings),
        max(float(r[:, 0].max()) for r in rings),
        max(float(r[:, 1].max()) for r in rings),
    )
    full: list[int] = []
    partial: list[int] = []

    def expand_full(x: int, y: int, lvl: int):
        shift = level - lvl
        if shift == 0:
            full.append(int(encode_xy(x, y, lvl)))
            return
        n = 1 << shift
        xs = (np.int64(x) << shift) + np.arange(n, dtype=np.int64)
        ys = (np.int64(y) << shift) + np.arange(n, dtype=np.int64)
        gx, gy = np.meshgrid(xs, ys)
        full.extend(encode_xy(gx.ravel(), gy.ravel(), level).tolist())

    def recurse(x: int, y: int, lvl: int):
        cell = int(encode_xy(x, y, lvl))
        lon_min, lat_min, lon_max, lat_max = (float(v) for v in cell_bounds(cell))
        cls = classify_rect(rings, bbox, lon_min, lat_min, lon_max, lat_max)
        if cls == OUTSIDE:
            return
        if cls == FULL:
            expand_full(x, y, lvl)
            return
        if lvl == level:
            partial.append(cell)
            return
        for dx in (0, 1):
            for dy in (0, 1):
                recurse((x << 1) | dx, (y << 1) | dy, lvl + 1)

    n0 = 1 << coarse_level
    for x in range(n0):
        for y in range(n0):
            recurse(x, y, coarse_level)
    return np.asarray(full, dtype=np.int64), np.asarray(partial, dtype=np.int64)


def _clip_ring_halfplane(ring: np.ndarray, axis: int, v: float, keep_le: bool) -> np.ndarray | None:
    """Sutherland–Hodgman clip of one ring against axis<=v (or >=v).

    Axis-generic twin of sources/geojson._clip_halfplane (which is the
    lon-only antimeridian variant). Intersection vertices get the clipped
    coordinate set EXACTLY to v; returns None when the clipped ring is
    degenerate (<3 distinct vertices).
    """

    def inside(c: float) -> bool:
        return c <= v if keep_le else c >= v

    out: list[np.ndarray] = []
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        ia, ib = inside(a[axis]), inside(b[axis])
        if ia:
            out.append(a)
        if ia != ib:
            t = (v - a[axis]) / (b[axis] - a[axis])
            p = a + t * (b - a)
            p[axis] = v
            out.append(p)
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


def clip_rings_box(
    rings: list[np.ndarray], lon_min: float, lat_min: float, lon_max: float, lat_max: float
) -> list[np.ndarray]:
    """Clip an even-odd ring group to an axis-aligned box, ring by ring.

    Parity contract: for any point STRICTLY inside the box and not on an
    original polygon edge, even-odd containment in the clipped group
    equals containment in the original group. Per ring, Sutherland–
    Hodgman yields the boundary of interior(ring) ∩ box (bridge segments
    from concave shapes lie on the box edge as coincident anti-parallel
    pairs, contributing even crossing counts — same argument as the
    antimeridian splitter); even-odd over independently-clipped rings
    XORs those intersections, which equals (XOR of ring interiors) ∩ box.
    Degenerate clipped rings (the polygon merely grazes the box) drop
    out — their interior ∩ box is empty.

    Used by the distributed polygon prep: each partial (boundary) cover
    cell carries only the polygon fragment inside its slightly-grown
    cell box, so per-cell refinement never ships whole-country geometry.
    The caller must grow the box so no refinement point can sit exactly
    on an introduced box edge (see polygons.CLIP_EPS).
    """
    out = rings
    for axis, v, keep_le in (
        (0, lon_max, True),
        (0, lon_min, False),
        (1, lat_max, True),
        (1, lat_min, False),
    ):
        nxt: list[np.ndarray] = []
        for r in out:
            c = _clip_ring_halfplane(np.asarray(r, dtype=np.float64), axis, v, keep_le)
            if c is not None:
                nxt.append(c)
        out = nxt
        if not out:
            break
    return out


@dataclass
class PolygonPack:
    """The whole polygon dimension flattened for broadcast + fast lookup.

    vertices: (V,2) float64 — all rings of all polygons concatenated
    ring_offsets: (R+1,) int64 into vertices
    poly_ring_offsets: (P+1,) int64 into ring_offsets
    ids / priorities / names: (P,)
    """

    vertices: np.ndarray
    ring_offsets: np.ndarray
    poly_ring_offsets: np.ndarray
    ids: np.ndarray
    priorities: np.ndarray
    names: list[str] = field(default_factory=list)

    @classmethod
    def build(cls, polys: list[dict]) -> "PolygonPack":
        """polys: [{'country_id', 'priority', 'name', 'rings': [ndarray...]}]"""
        verts = []
        ring_off = [0]
        poly_off = [0]
        ids, prios, names = [], [], []
        for p in polys:
            for ring in p["rings"]:
                verts.append(np.asarray(ring, dtype=np.float64))
                ring_off.append(ring_off[-1] + len(ring))
            poly_off.append(len(ring_off) - 1)
            ids.append(p["country_id"])
            prios.append(p.get("priority", 0))
            names.append(p.get("name", str(p["country_id"])))
        return cls(
            vertices=np.concatenate(verts) if verts else np.zeros((0, 2)),
            ring_offsets=np.asarray(ring_off, dtype=np.int64),
            poly_ring_offsets=np.asarray(poly_off, dtype=np.int64),
            ids=np.asarray(ids, dtype=np.int64),
            priorities=np.asarray(prios, dtype=np.int64),
            names=names,
        )

    def rings_of(self, poly_idx: int) -> list[np.ndarray]:
        r0, r1 = self.poly_ring_offsets[poly_idx], self.poly_ring_offsets[poly_idx + 1]
        return [
            self.vertices[self.ring_offsets[r] : self.ring_offsets[r + 1]] for r in range(r0, r1)
        ]

    def index_of_id(self) -> dict[int, int]:
        return {int(cid): i for i, cid in enumerate(self.ids)}

    def contains(self, poly_idx: int, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        return points_in_rings(np.asarray(lon), np.asarray(lat), self.rings_of(poly_idx))


def repair_rings(rings: list[np.ndarray]) -> tuple[list[np.ndarray], str]:
    """Polygon validity repair cascade — the engine twin of the reference's
    ST_MakeValid → ST_Collect → ST_Buffer(0) fallback chain
    (bin/lib/functionsProcess.sh:1891-1989, incl. the Austria/Taiwan
    special-casing rationale). Cascade: (1) structural cleanup — drop
    consecutive duplicate vertices, drop degenerate rings (<3 distinct
    points), strip explicit closure; (2) if a ring self-intersects,
    RE-NODE it: split at each self-crossing into simple rings whose
    even-odd union covers exactly the parity regions of the original —
    the same answer PostGIS ST_MakeValid('linework') gives for a bowtie
    (two triangles, crossing point on the boundary of both), NOT the
    over-inclusive convex hull; (3) only if re-noding fails to converge
    (pathological float geometry) fall back to the convex hull. Returns
    (repaired_rings, method), method ∈ {'clean', 'renode', 'hull',
    'dropped'} for the metrics table.
    """
    out: list[np.ndarray] = []
    used: set[str] = set()
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) >= 2 and np.array_equal(r[0], r[-1]):
            r = r[:-1]  # strip explicit closure (rings close implicitly)
        if len(r) >= 2:
            keep = np.ones(len(r), dtype=bool)
            keep[1:] = ~(r[1:] == r[:-1]).all(axis=1)
            r = r[keep]
        if len(np.unique(r, axis=0)) < 3:
            used.add("dropped")
            continue
        if _ring_self_intersects(r):
            parts = _renode_ring(r)
            if parts is not None:
                out.extend(parts)
                used.add("renode")
                continue
            r = _convex_hull(r)
            used.add("hull")
        out.append(r)
    # per-feature method = most severe action across rings (a single
    # last-writer-wins value mis-reported mixed repairs, which fed wrong
    # boundary_import counters)
    if not out:
        method = "dropped"
    elif "hull" in used:
        method = "hull"
    elif "renode" in used:
        method = "renode"
    elif "dropped" in used:
        method = "partial_drop"
    else:
        method = "clean"
    return out, method


def _renode_ring(ring: np.ndarray, max_splits: int = 256) -> list[np.ndarray] | None:
    """Split a self-crossing ring into simple rings at its crossings.

    At a proper crossing of edges (v_i→v_{i+1}) and (v_j→v_{j+1}) at
    point p, re-route v_i→p→v_{j+1} and v_j→p→v_{i+1}: the cycle splits
    into two cycles [v_0..v_i, p, v_{j+1}..] and [p, v_{i+1}..v_j].
    The directed-edge multiset is preserved up to subdivision at p, and
    even-odd ray parity depends only on that multiset — so the union of
    the split rings covers EXACTLY the parity regions of the original
    (ST_MakeValid linework semantics). Recurses until every part is
    simple; returns None if the split budget is exhausted (caller falls
    back to the hull).
    """
    work = [np.asarray(ring, dtype=np.float64)]
    done: list[np.ndarray] = []
    splits = 0
    while work:
        r = work.pop()
        # drop degenerate slivers produced by splitting
        if len(np.unique(np.round(r, 12), axis=0)) < 3:
            continue
        hit = _first_self_crossing(r)
        if hit is None:
            done.append(r)
            continue
        if splits >= max_splits:
            return None
        splits += 1
        i, j, p = hit
        a = np.vstack([r[: i + 1], p[None, :], r[j + 1 :]])
        b = np.vstack([p[None, :], r[i + 1 : j + 1]])
        work.extend([a, b])
    return done if done else None


def _first_self_crossing(ring: np.ndarray):
    """First properly-crossing non-adjacent edge pair → (i, j, point)."""
    n = len(ring)
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    for i in range(n):
        js = np.arange(i + 2, n if i > 0 else n - 1)
        if len(js) == 0:
            continue
        d1 = (x2[i] - x1[i]) * (y1[js] - y1[i]) - (y2[i] - y1[i]) * (x1[js] - x1[i])
        d2 = (x2[i] - x1[i]) * (y2[js] - y1[i]) - (y2[i] - y1[i]) * (x2[js] - x1[i])
        d3 = (x2[js] - x1[js]) * (y1[i] - y1[js]) - (y2[js] - y1[js]) * (x1[i] - x1[js])
        d4 = (x2[js] - x1[js]) * (y2[i] - y1[js]) - (y2[js] - y1[js]) * (x2[i] - x1[js])
        m = (d1 * d2 < 0) & (d3 * d4 < 0)
        if m.any():
            j = int(js[np.argmax(m)])
            jj = np.flatnonzero(js == j)[0]
            # intersection parameter along edge j's span of edge i's line
            t = d3[jj] / (d3[jj] - d4[jj])
            p = np.array([x1[i] + t * (x2[i] - x1[i]), y1[i] + t * (y2[i] - y1[i])])
            return i, j, p
    return None


def _ring_self_intersects(ring: np.ndarray) -> bool:
    """Exact O(E²) segment-pair test (build-time only, small rings)."""
    n = len(ring)
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    for i in range(n):
        js = np.arange(i + 2, n if i > 0 else n - 1)
        if len(js) == 0:
            continue
        d1 = (x2[i] - x1[i]) * (y1[js] - y1[i]) - (y2[i] - y1[i]) * (x1[js] - x1[i])
        d2 = (x2[i] - x1[i]) * (y2[js] - y1[i]) - (y2[i] - y1[i]) * (x2[js] - x1[i])
        d3 = (x2[js] - x1[js]) * (y1[i] - y1[js]) - (y2[js] - y1[js]) * (x1[i] - x1[js])
        d4 = (x2[js] - x1[js]) * (y2[i] - y1[js]) - (y2[js] - y1[js]) * (x2[i] - x1[js])
        if ((d1 * d2 < 0) & (d3 * d4 < 0)).any():
            return True
    return False


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain (pure numpy/python, build-time)."""
    p = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    def half(points):
        h = []
        for q in points:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (q[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (q[0] - h[-2][0])
            ) <= 0:
                h.pop()
            h.append(tuple(q))
        return h
    lower = half(p)
    upper = half(p[::-1])
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)


def _point_segment_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distances of pts (M,2) to segment a→b, vectorized."""
    ab = b - a
    denom = float(ab @ ab)
    if denom == 0.0:
        return np.hypot(pts[:, 0] - a[0], pts[:, 1] - a[1])
    t = np.clip(((pts - a) @ ab) / denom, 0.0, 1.0)
    proj = a + t[:, None] * ab
    return np.hypot(pts[:, 0] - proj[:, 0], pts[:, 1] - proj[:, 1])


def _dp_keep_mask(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker keep-mask for an OPEN polyline (endpoints kept).

    Iterative stack (no recursion-depth limit); the DP invariant — every
    dropped vertex lies within `tol` of the kept polyline — is what the
    simplification tests pin."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        d = _point_segment_dist(pts[i + 1 : j], pts[i], pts[j])
        k = int(np.argmax(d))
        if d[k] > tol:
            k += i + 1
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_ring(ring: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker simplification of a CLOSED ring (not stored
    closed; the closing edge is implicit, as everywhere in this engine).

    Anchoring: plain DP needs fixed endpoints; a ring has none. We pin
    vertex 0 and the vertex farthest from it — both are extreme points
    the simplification must keep anyway — and simplify the two arcs
    independently. Guarantee (tested): every ORIGINAL vertex lies within
    `tol` of the simplified ring's closest edge. Degenerate results
    (<3 distinct vertices — the ring collapsed at this tolerance) return
    the 2-point spine; callers treating rings as areas should drop them
    (simplify_polys does).

    tol is in coordinate units (degrees here). tol=0 removes exactly the
    collinear vertices (d > 0 strictly)."""
    if len(ring) < 3:
        return ring
    d0 = np.hypot(ring[:, 0] - ring[0, 0], ring[:, 1] - ring[0, 1])
    m = int(np.argmax(d0))
    if m == 0:  # all vertices coincide
        return ring[:1]
    arc1 = ring[: m + 1]
    arc2 = np.concatenate([ring[m:], ring[:1]])  # wrap back to vertex 0
    k1 = _dp_keep_mask(arc1, tol)
    k2 = _dp_keep_mask(arc2, tol)
    keep = np.zeros(len(ring), dtype=bool)
    keep[: m + 1] |= k1
    keep[m:] |= k2[:-1]
    keep[0] |= k2[-1]
    return ring[keep]


def simplify_polys(polys: list[dict], tol: float) -> list[dict]:
    """Tolerance-bounded polygon-dimension shrink (opt-in, build-time).

    Returns new poly dicts with every ring Douglas-Peucker-simplified at
    `tol`; rings that collapse below 3 vertices (area ≲ tol²) are
    dropped, and polygons losing all rings are dropped. The trade is
    explicit and quantified: assignment/overlap answers can differ from
    the full-resolution dimension only for points within `tol` degrees
    of a boundary — in exchange the broadcast pack and the per-point
    refine cost shrink by the vertex-count ratio. The reference ships
    full-resolution boundaries and pays for it in its grid tuning
    (sql/functionsProcess_31_organizeAreas_2DGrid.sql); at 10^12 points
    a 10× smaller pack is usually worth a ~100 m boundary fuzz
    (tol=1e-3 deg)."""
    out = []
    for p in polys:
        rings = [simplify_ring(np.asarray(r, dtype=np.float64), tol) for r in p["rings"]]
        rings = [r for r in rings if len(r) >= 3]
        if rings:
            out.append({**p, "rings": rings})
    return out
