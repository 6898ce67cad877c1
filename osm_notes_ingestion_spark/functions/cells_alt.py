"""Alternate geocell encodings: S2-style (cube-face + Morton) and
H3-style (hexagonal axial) — the two index families named by the north
rule, alongside the default equirectangular quadtree (functions/cells.py).

Why three index families: the quadtree is the engine's join key (its
covers are exact closed-form rectangles, which makes the polygon-cover
builder and the full-cell containment proof trivial); the S2-style id is
the better *layout* key at 100 TB (cube faces avoid the quadtree's
polar cell-aspect blowup, and the Morton curve gives locality for
Iceberg min-max file skipping on ALL axes, not just row-major x); the
hex id is the better *neighborhood* key (6 equidistant neighbors — kNN
ring expansion visits ~25% fewer cells for the same guarantee).

Every encoder has THREE twins computing bit-identical ids:
  numpy  — driver-side cover building / Arrow UDF interior use;
  Column — JVM whole-stage-codegen hot path (no Python per row);
  SQL    — DuckDB oracle fragment (same operations in the same order,
           so IEEE-754 doubles agree bit-for-bit across engines).

Reference analog: the 24-zone grid (sql/functionsProcess_21_
createFunctionToGetCountry.sql:60-201) is ONE hand-tuned level of ONE
projection; these are hierarchical and exchangeable.

S2-style deviations from real S2 (documented, deliberate): linear s/t
(no quadratic area-equalizing transform) and Morton instead of Hilbert —
both keep the same face/locality structure with far simpler cross-engine
determinism.

Layout (int64): level bits 55..59 | face bits 52..54 | morton bits 0..51
(level ≤ 26 ⇒ i,j < 2^26 ⇒ morton < 2^52).

H3-style: pointy-top axial (q, r) on the equirectangular plane with
cube-rounding; id = (res << 58) | ((q+OFF) << 29) | (r+OFF).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# ------------------------------------------------------------ S2-style

S2_LEVEL_SHIFT = 55
S2_FACE_SHIFT = 52

# magic-number bit spread: 26-bit int → even bit positions of 52 bits
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_np(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    for sh, mask in _SPREAD:
        v = (v | (v << sh)) & np.int64(mask)
    return v


def s2_face_uv(lat: np.ndarray, lon: np.ndarray):
    """(face, u, v): gnomonic cube-face projection of the unit sphere.

    face = dominant |axis| of (x, y, z); u, v per the S2 face convention
    (axis order chosen so every face is right-handed)."""
    latr = np.radians(np.asarray(lat, dtype=np.float64))
    lonr = np.radians(np.asarray(lon, dtype=np.float64))
    x = np.cos(latr) * np.cos(lonr)
    y = np.cos(latr) * np.sin(lonr)
    z = np.sin(latr)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (un, ud, vn, vd) in _S2_FACE_AXES.items():
        m = face == f
        u[m] = _pick(x, y, z, un, m) / _pick(x, y, z, ud, m)
        v[m] = _pick(x, y, z, vn, m) / _pick(x, y, z, vd, m)
    return face, u, v


# face → (u_num, u_den, v_num, v_den) as axis names; den is the face axis
_S2_FACE_AXES = {
    0: ("y", "x", "z", "x"),
    1: ("-x", "y", "z", "y"),
    2: ("-x", "z", "-y", "z"),
    3: ("z", "-x", "y", "-x"),
    4: ("z", "-y", "-x", "-y"),
    5: ("-y", "-z", "-x", "-z"),
}


def _pick(x, y, z, name, m):
    base = {"x": x, "y": y, "z": z}[name.lstrip("-")][m]
    return -base if name.startswith("-") else base


def s2_encode(lat: np.ndarray, lon: np.ndarray, level: int) -> np.ndarray:
    """S2-style cell id (numpy)."""
    face, u, v = s2_face_uv(lat, lon)
    n = 1 << level
    i = np.clip(np.floor((u + 1.0) / 2.0 * n).astype(np.int64), 0, n - 1)
    j = np.clip(np.floor((v + 1.0) / 2.0 * n).astype(np.int64), 0, n - 1)
    morton = _spread_np(i) | (_spread_np(j) << 1)
    return (np.int64(level) << S2_LEVEL_SHIFT) | (face << S2_FACE_SHIFT) | morton


def _spread_col(c: Column) -> Column:
    for sh, mask in _SPREAD:
        c = (c.bitwiseOR(F.shiftleft(c, sh))).bitwiseAND(F.lit(mask))
    return c


def s2_cell_col(lat: Column, lon: Column, level: int) -> Column:
    """JVM-side S2-style encode — same operations, same order as numpy."""
    latr = F.radians(lat)
    lonr = F.radians(lon)
    x = F.cos(latr) * F.cos(lonr)
    y = F.cos(latr) * F.sin(lonr)
    z = F.sin(latr)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    face = (
        F.when((ax >= ay) & (ax >= az), F.when(x >= 0, 0).otherwise(3))
        .otherwise(
            F.when(ay >= az, F.when(y >= 0, 1).otherwise(4)).otherwise(
                F.when(z >= 0, 2).otherwise(5)
            )
        )
        .cast("long")
    )
    axis = {"x": x, "y": y, "z": z}

    def pick(name):
        b = axis[name.lstrip("-")]
        return -b if name.startswith("-") else b

    u = F.lit(None).cast("double")
    v = F.lit(None).cast("double")
    for f, (un, ud, vn, vd) in _S2_FACE_AXES.items():
        u = F.when(face == f, pick(un) / pick(ud)).otherwise(u)
        v = F.when(face == f, pick(vn) / pick(vd)).otherwise(v)
    n = 1 << level
    i = F.least(F.greatest(F.floor((u + F.lit(1.0)) / F.lit(2.0) * F.lit(float(n))), F.lit(0)), F.lit(n - 1)).cast("long")
    j = F.least(F.greatest(F.floor((v + F.lit(1.0)) / F.lit(2.0) * F.lit(float(n))), F.lit(0)), F.lit(n - 1)).cast("long")
    morton = _spread_col(i).bitwiseOR(F.shiftleft(_spread_col(j), 1))
    return (
        F.lit(level << S2_LEVEL_SHIFT).cast("long")
        + F.shiftleft(face, S2_FACE_SHIFT).cast("long")
        + morton
    )


def s2_sql(lat: str, lon: str, level: int) -> str:
    """DuckDB fragment computing the identical S2-style id."""

    def spread(e: str) -> str:
        for sh, mask in _SPREAD:
            e = f"((({e}) | (({e}) << {sh})) & {mask})"
        return e

    x = f"(cos(radians({lat})) * cos(radians({lon})))"
    y = f"(cos(radians({lat})) * sin(radians({lon})))"
    z = f"(sin(radians({lat})))"
    face = (
        f"(CASE WHEN abs({x}) >= abs({y}) AND abs({x}) >= abs({z}) THEN CASE WHEN {x} >= 0 THEN 0 ELSE 3 END "
        f"WHEN abs({y}) >= abs({z}) THEN CASE WHEN {y} >= 0 THEN 1 ELSE 4 END "
        f"ELSE CASE WHEN {z} >= 0 THEN 2 ELSE 5 END END)"
    )
    ax = {"x": x, "y": y, "z": z}

    def pick(name):
        b = ax[name.lstrip("-")]
        return f"(-{b})" if name.startswith("-") else b

    u_cases = " ".join(
        f"WHEN {f} THEN {pick(un)} / {pick(ud)}" for f, (un, ud, _vn, _vd) in _S2_FACE_AXES.items()
    )
    v_cases = " ".join(
        f"WHEN {f} THEN {pick(vn)} / {pick(vd)}" for f, (_un, _ud, vn, vd) in _S2_FACE_AXES.items()
    )
    n = 1 << level
    u = f"(CASE {face} {u_cases} END)"
    v = f"(CASE {face} {v_cases} END)"
    i = f"CAST(least(greatest(floor(({u} + 1.0) / 2.0 * {float(n)}), 0), {n - 1}) AS BIGINT)"
    j = f"CAST(least(greatest(floor(({v} + 1.0) / 2.0 * {float(n)}), 0), {n - 1}) AS BIGINT)"
    return (
        f"(CAST({level << S2_LEVEL_SHIFT} AS BIGINT) + ({face} * {1 << S2_FACE_SHIFT}) "
        f"+ ({spread(i)} | ({spread(j)} << 1)))"
    )


def s2_parent_col(cell: Column, from_level: int, to_level: int) -> Column:
    """JVM-side S2-style cell_to_parent: i,j halve per level ⇒ Morton
    shifts by 2 per level; face is preserved. floor(u·2^L)>>Δ ==
    floor(u·2^(L−Δ)), so parent ids are EXACTLY the ids direct encoding
    at the coarser level would produce (tested/oracle-proven)."""
    d = from_level - to_level
    if d < 0:
        raise ValueError("to_level must be <= from_level")
    face = F.shiftright(cell, S2_FACE_SHIFT).bitwiseAND(F.lit(7))
    morton = cell.bitwiseAND(F.lit((1 << S2_FACE_SHIFT) - 1))
    return (
        F.lit(to_level << S2_LEVEL_SHIFT).cast("long")
        + F.shiftleft(face, S2_FACE_SHIFT).cast("long")
        + F.shiftright(morton, 2 * d).cast("long")
    )


# ------------------------------------------------------------ H3-style hex

HEX_RES_SHIFT = 58
HEX_Q_SHIFT = 29
HEX_OFF = 1 << 27  # keeps axial coords non-negative in the packed id
# Field-width bound: |q| ≈ 33.5·2^res for in-range lat/lon, and the q/r
# fields hold HEX_OFF±2^27 ≈ ±1.34e8 — so res ≥ 21 would overflow into
# the neighboring field and silently corrupt ids. Guarded everywhere.
HEX_MAX_RES = 20
_SQRT3_3 = 0.5773502691896258  # sqrt(3)/3, fixed constant both engines


def _check_hex_res(res: int) -> None:
    if not 0 <= res <= HEX_MAX_RES:
        raise ValueError(f"hex res must be in [0, {HEX_MAX_RES}], got {res}")


def _hex_size(res: int) -> float:
    """Hex edge length in degrees at a resolution: 4° at res 0, /2 per res
    (aperture-4-style hierarchy; real H3 uses aperture 7)."""
    return 4.0 / (1 << res)


def hex_encode(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """Pointy-top axial hex binning with cube rounding (numpy)."""
    _check_hex_res(res)
    s = _hex_size(res)
    X = np.asarray(lon, dtype=np.float64)
    Y = np.asarray(lat, dtype=np.float64)
    q = (_SQRT3_3 * X - Y / 3.0) / s
    r = (2.0 * Y / 3.0) / s
    rq, rr = _cube_round_np(q, r)
    return (np.int64(res) << HEX_RES_SHIFT) | ((rq + HEX_OFF) << HEX_Q_SHIFT) | (rr + HEX_OFF)


def _cube_round_np(q, r):
    x, z = q, r
    y = -x - z
    rx, ry, rz = np.round(x), np.round(y), np.round(z)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_cell_col(lat: Column, lon: Column, res: int) -> Column:
    """JVM-side hex encode — same ops/order as numpy (round = half-even
    in numpy vs half-up in Spark `round`; use rint-equivalent `bround`)."""
    _check_hex_res(res)
    s = _hex_size(res)
    q = (F.lit(_SQRT3_3) * lon - lat / F.lit(3.0)) / F.lit(s)
    r = (F.lit(2.0) * lat / F.lit(3.0)) / F.lit(s)
    x, z = q, r
    y = -x - z
    rx, ry, rz = F.bround(x), F.bround(y), F.bround(z)
    dx, dy, dz = F.abs(rx - x), F.abs(ry - y), F.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = (~fix_x) & (dz > dy)
    rx2 = F.when(fix_x, -ry - rz).otherwise(rx)
    rz2 = F.when(fix_z, -rx2 - ry).otherwise(rz)
    return (
        F.lit(res << HEX_RES_SHIFT).cast("long")
        + (rx2.cast("long") + F.lit(HEX_OFF)) * F.lit(1 << HEX_Q_SHIFT).cast("long")
        + (rz2.cast("long") + F.lit(HEX_OFF))
    )


def hex_sql(lat: str, lon: str, res: int) -> str:
    """DuckDB fragment computing the identical hex id (round half-even)."""
    _check_hex_res(res)
    s = _hex_size(res)
    q = f"(({_SQRT3_3!r} * {lon} - {lat} / 3.0) / {s!r})"
    r = f"((2.0 * {lat} / 3.0) / {s!r})"
    x, z = q, r
    y = f"(-{x} - {z})"
    rx, ry, rz = (f"round_even({e}, 0)" for e in (x, y, z))
    dx, dy, dz = (f"abs({a} - {b})" for a, b in ((rx, x), (ry, y), (rz, z)))
    fix_x = f"({dx} > {dy} AND {dx} > {dz})"
    rx2 = f"(CASE WHEN {fix_x} THEN -{ry} - {rz} ELSE {rx} END)"
    fix_z = f"(NOT {fix_x} AND {dz} > {dy})"
    rz2 = f"(CASE WHEN {fix_z} THEN -{rx2} - {ry} ELSE {rz} END)"
    return (
        f"(CAST({res << HEX_RES_SHIFT} AS BIGINT) "
        f"+ (CAST({rx2} AS BIGINT) + {HEX_OFF}) * {1 << HEX_Q_SHIFT} "
        f"+ (CAST({rz2} AS BIGINT) + {HEX_OFF}))"
    )


def hex_k_ring(cell: int, k: int) -> np.ndarray:
    """All hex cells within hex-grid distance k (numpy; kNN building block).
    6-neighbor axial expansion: |dq| ≤ k, |dr| ≤ k, |dq+dr| ≤ k."""
    res = int(cell >> HEX_RES_SHIFT)
    q = ((cell >> HEX_Q_SHIFT) & ((1 << 29) - 1)) - HEX_OFF
    r = (cell & ((1 << 29) - 1)) - HEX_OFF
    dq = np.arange(-k, k + 1, dtype=np.int64)
    gq, gr = np.meshgrid(dq, dq)
    m = np.abs(gq + gr) <= k
    qq, rr = q + gq[m], r + gr[m]
    return (np.int64(res) << HEX_RES_SHIFT) | ((qq + HEX_OFF) << HEX_Q_SHIFT) | (rr + HEX_OFF)
