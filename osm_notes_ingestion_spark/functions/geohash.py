"""Classic geohash (Niemeyer base32) — the third cell-index family next
to the quadtree geocell (functions/cells.py) and the S2-style / hex ids
(functions/cells_alt.py). Users of PostGIS-backed pipelines (the
reference stores its notes in PostGIS, where ST_GeoHash is the stock
cell key for external exchange) expect it as an output/partition key.

All three twins share one integer formulation — total bits T = 5·len,
lon takes ceil(T/2) bits, lat floor(T/2); the interleaved Morton word
is built with the same magic-mask spread the S2 encoder uses, then cut
into 5-bit base32 digits. Encoding is pure fixed-point arithmetic, so
the JVM Column twin stays inside whole-stage codegen (no UDF), the
numpy twin vectorizes, and the DuckDB fragment lets oracle SQL pin the
values bit-for-bit.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from .cells_alt import _SPREAD, _spread_col, _spread_np

B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
MAX_PRECISION = 12  # 30 lon bits — the spread masks' 32-bit input limit


def _check(precision: int) -> tuple[int, int, int]:
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(f"precision must be 1..{MAX_PRECISION}, got {precision}")
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    return total, lon_bits, lat_bits


def geohash_np(lat: np.ndarray, lon: np.ndarray, precision: int = 9) -> np.ndarray:
    """Vectorized encode → array of strings."""
    total, lon_bits, lat_bits = _check(precision)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    x = np.clip(
        np.floor((lon + 180.0) / 360.0 * (1 << lon_bits)).astype(np.int64), 0, (1 << lon_bits) - 1
    )
    y = np.clip(
        np.floor((lat + 90.0) / 180.0 * (1 << lat_bits)).astype(np.int64), 0, (1 << lat_bits) - 1
    )
    if total % 2 == 0:  # even T: lon owns the MSB -> lon on odd positions
        word = (_spread_np(x) << 1) | _spread_np(y)
    else:  # odd T: lon LSB must land at bit 0 -> lon on even positions
        word = (_spread_np(y) << 1) | _spread_np(x)
    out = np.empty(len(lat), dtype=object)
    chars = np.array(list(B32))
    digits = [(word >> (5 * (precision - 1 - i))) & 31 for i in range(precision)]
    for row in range(len(lat)):
        out[row] = "".join(chars[d[row]] for d in digits)
    return out


def geohash_col(lat: Column, lon: Column, precision: int = 9) -> Column:
    """JVM-side encode — identical arithmetic, no Python in the row path."""
    total, lon_bits, lat_bits = _check(precision)
    x = (
        F.least(
            F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))), F.lit(0)),
            F.lit((1 << lon_bits) - 1),
        )
    ).cast("long")
    y = (
        F.least(
            F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))), F.lit(0)),
            F.lit((1 << lat_bits) - 1),
        )
    ).cast("long")
    if total % 2 == 0:
        word = F.shiftleft(_spread_col(x), 1).bitwiseOR(_spread_col(y))
    else:
        word = F.shiftleft(_spread_col(y), 1).bitwiseOR(_spread_col(x))
    alphabet = F.array(*[F.lit(c) for c in B32])
    return F.concat(
        *[
            F.element_at(
                alphabet,
                (F.shiftrightunsigned(word, 5 * (precision - 1 - i)).bitwiseAND(F.lit(31)) + 1).cast("int"),
            )
            for i in range(precision)
        ]
    )


def geohash_sql(lat: str, lon: str, precision: int = 9) -> str:
    """DuckDB fragment computing the identical geohash string."""
    total, lon_bits, lat_bits = _check(precision)

    def spread(e: str) -> str:
        for sh, mask in _SPREAD:
            e = f"((({e}) | (({e}) << {sh})) & {mask})"
        return e

    x = (
        f"LEAST(GREATEST(CAST(FLOOR((({lon}) + 180.0) / 360.0 * {float(1 << lon_bits)!r}) AS BIGINT), 0), "
        f"{(1 << lon_bits) - 1})"
    )
    y = (
        f"LEAST(GREATEST(CAST(FLOOR((({lat}) + 90.0) / 180.0 * {float(1 << lat_bits)!r}) AS BIGINT), 0), "
        f"{(1 << lat_bits) - 1})"
    )
    if total % 2 == 0:
        word = f"(({spread(x)} << 1) | {spread(y)})"
    else:
        word = f"(({spread(y)} << 1) | {spread(x)})"
    digits = [
        f"substr('{B32}', CAST((({word} >> {5 * (precision - 1 - i)}) & 31) AS INTEGER) + 1, 1)"
        for i in range(precision)
    ]
    return "(" + " || ".join(digits) + ")"


def _unspread_np(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread_np: gather the even bit positions back."""
    v = v.astype(np.int64) & 0x5555555555555555
    # standard magic-mask compaction (inverse masks, reversed shifts)
    v = (v | (v >> 1)) & 0x3333333333333333
    v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
    v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
    v = (v | (v >> 16)) & 0x00000000FFFFFFFF
    return v


_B32_INDEX = {c: i for i, c in enumerate(B32)}


def _cells_of(hashes) -> tuple[np.ndarray, np.ndarray, int, int, int]:
    """geohash strings (equal length) → (x, y, precision, lon_bits,
    lat_bits) integer cells."""
    hashes = list(hashes)
    precision = len(hashes[0])
    if any(len(h) != precision for h in hashes):
        raise ValueError("all geohashes in a batch must share a precision")
    total, lon_bits, lat_bits = _check(precision)
    word = np.zeros(len(hashes), dtype=np.int64)
    for i, h in enumerate(hashes):
        w = 0
        for ch in h:
            w = (w << 5) | _B32_INDEX[ch]
        word[i] = w
    if total % 2 == 0:
        x = _unspread_np(word >> 1)
        y = _unspread_np(word)
    else:
        x = _unspread_np(word)
        y = _unspread_np(word >> 1)
    return x, y, precision, lon_bits, lat_bits


def geohash_decode_np(hashes) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """geohash strings → (lat_min, lon_min, lat_max, lon_max) cell bbox
    in degrees (the cell center is the midpoint)."""
    x, y, _, lon_bits, lat_bits = _cells_of(hashes)
    lon_w = 360.0 / (1 << lon_bits)
    lat_w = 180.0 / (1 << lat_bits)
    lon_min = x * lon_w - 180.0
    lat_min = y * lat_w - 90.0
    return lat_min, lon_min, lat_min + lat_w, lon_min + lon_w


def geohash_neighbors_np(hashes) -> np.ndarray:
    """(N, ≤8) object array of each hash's neighbors (the classic 8-cell
    ring): longitude wraps at the antimeridian, latitude rows beyond the
    poles are omitted (polar cells have fewer than 8 neighbors).
    Computed by integer cell arithmetic + re-encode — no per-character
    border tables, so it inherits the encoder's pinned correctness."""
    x, y, precision, lon_bits, lat_bits = _cells_of(hashes)
    nx, ny = 1 << lon_bits, 1 << lat_bits
    total = 5 * precision
    chars = np.array(list(B32))
    out = np.empty(len(x), dtype=object)
    for i in range(len(x)):
        ns = []
        for dy in (-1, 0, 1):
            yy = int(y[i]) + dy
            if yy < 0 or yy >= ny:
                continue
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                xx = (int(x[i]) + dx) % nx
                if total % 2 == 0:
                    word = (int(_spread_np(np.array([xx]))[0]) << 1) | int(
                        _spread_np(np.array([yy]))[0]
                    )
                else:
                    word = (int(_spread_np(np.array([yy]))[0]) << 1) | int(
                        _spread_np(np.array([xx]))[0]
                    )
                ns.append("".join(chars[(word >> (5 * (precision - 1 - k))) & 31] for k in range(precision)))
        out[i] = ns
    return out
