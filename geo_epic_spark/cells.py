"""Discrete global grid cell index — the engine's spatial key.

A lat/lon lattice at a configurable resolution plays the role H3 res-9 /
S2 level-13 play in the north rule (neither native lib is available in this
container, and a rectangular lattice matches the reference's own grids: the
1-km climate lattice at 0.00901 deg, `geoEpic/weather/download_daily.py:62-70`,
and raster pixel centers, `geoEpic/utils/raster_utils.py:238-247`).

Identity: ``cell_id = row * 2^32 + col`` with
``row = floor((lat + 90) / res)``, ``col = floor((lon + 180) / res)``.

Everything here is expressed three ways with identical arithmetic:
  * Spark ``Column`` expressions (JVM-side, codegen-friendly — the hot path),
  * numpy (oracles and fixture generation),
  * ANSI-SQL strings (DuckDB correctness oracles).
No UDFs: encode / k-ring / bbox-cover are pure integer arithmetic, so the
spatial prefilter join stays inside whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

#: reference climate-grid resolution, `weather/download_daily.py:62` ("1 km").
RES_1KM = 0.00901

_SHIFT = 2**32


# ---------------------------------------------------------------------------
# Spark Column expressions
# ---------------------------------------------------------------------------

def cell_row(lat: Column, res: float) -> Column:
    return F.floor((lat + F.lit(90.0)) / F.lit(res)).cast("long")


def cell_col(lon: Column, res: float) -> Column:
    return F.floor((lon + F.lit(180.0)) / F.lit(res)).cast("long")


def cell_id(lon: Column, lat: Column, res: float) -> Column:
    """Encode a point to its cell id (pure arithmetic, no UDF)."""
    return cell_row(lat, res) * F.lit(_SHIFT) + cell_col(lon, res)


def cell_center(cid: Column, res: float) -> tuple[Column, Column]:
    """(lon, lat) of a cell's center."""
    row = (cid / F.lit(_SHIFT)).cast("long")
    col = cid - row * F.lit(_SHIFT)
    lon = (col.cast("double") + F.lit(0.5)) * F.lit(res) - F.lit(180.0)
    lat = (row.cast("double") + F.lit(0.5)) * F.lit(res) - F.lit(90.0)
    return lon, lat


def k_ring(cid: Column, k: int) -> Column:
    """array<long> of all cells within Chebyshev distance ``k`` (the
    (2k+1)^2 block). Analog of neighbor expansion for kNN fallback —
    replaces the reference's BallTree probe (`utils/raster_utils.py:16-30`).
    Pure ``sequence``/``transform`` — stays JVM-side.
    """
    row = (cid / F.lit(_SHIFT)).cast("long")
    col = cid - row * F.lit(_SHIFT)
    drs = F.sequence(F.lit(-k), F.lit(k))
    dcs = F.sequence(F.lit(-k), F.lit(k))
    return F.flatten(
        F.transform(
            drs,
            lambda dr: F.transform(dcs, lambda dc: (row + dr) * F.lit(_SHIFT) + (col + dc)),
        )
    )


def ring_shell(cid: Column, k: int) -> Column:
    """array<long> of cells at Chebyshev distance exactly ``k`` (the shell),
    used by iterative kNN expansion so ring r+1 doesn't re-probe ring r."""
    if k == 0:
        return F.array(cid)
    row = (cid / F.lit(_SHIFT)).cast("long")
    col = cid - row * F.lit(_SHIFT)
    rng = F.sequence(F.lit(-k), F.lit(k))
    top = F.transform(rng, lambda dc: (row - k) * F.lit(_SHIFT) + (col + dc))
    bot = F.transform(rng, lambda dc: (row + k) * F.lit(_SHIFT) + (col + dc))
    mid = F.sequence(F.lit(-k + 1), F.lit(k - 1))
    lft = F.transform(mid, lambda dr: (row + dr) * F.lit(_SHIFT) + (col - k))
    rgt = F.transform(mid, lambda dr: (row + dr) * F.lit(_SHIFT) + (col + k))
    return F.concat(top, bot, lft, rgt)


def cover_bbox(
    lon_min: Column, lat_min: Column, lon_max: Column, lat_max: Column, res: float
) -> Column:
    """array<long> of every cell intersecting the bbox — the covering-set
    prefilter for PIP joins (analog of the reference's bbox prefilter before
    exact geometry tests, `utils/crop_csb.py:23-35`)."""
    r0, r1 = cell_row(lat_min, res), cell_row(lat_max, res)
    c0, c1 = cell_col(lon_min, res), cell_col(lon_max, res)
    return F.flatten(
        F.transform(
            F.sequence(r0, r1),
            lambda r: F.transform(F.sequence(c0, c1), lambda c: r * F.lit(_SHIFT) + c),
        )
    )


def cover_polygon(xs: Column, ys: Column, res: float) -> Column:
    """Covering set of a polygon given vertex arrays (bbox superset)."""
    return cover_bbox(
        F.array_min(xs), F.array_min(ys), F.array_max(xs), F.array_max(ys), res
    )


# ---------------------------------------------------------------------------
# numpy mirror (oracles, fixtures)
# ---------------------------------------------------------------------------

def np_cell_id(lon: np.ndarray, lat: np.ndarray, res: float) -> np.ndarray:
    row = np.floor((np.asarray(lat) + 90.0) / res).astype(np.int64)
    col = np.floor((np.asarray(lon) + 180.0) / res).astype(np.int64)
    return row * _SHIFT + col


def np_cell_center(cid: np.ndarray, res: float) -> tuple[np.ndarray, np.ndarray]:
    cid = np.asarray(cid, dtype=np.int64)
    row = cid // _SHIFT
    col = cid - row * _SHIFT
    return (col + 0.5) * res - 180.0, (row + 0.5) * res - 90.0


# ---------------------------------------------------------------------------
# ANSI-SQL emitters (DuckDB oracle parity — identical arithmetic)
# ---------------------------------------------------------------------------

def sql_cell_id(lon_expr: str, lat_expr: str, res: float) -> str:
    return (
        f"(CAST(floor(({lat_expr} + 90.0) / {res!r}) AS BIGINT) * 4294967296"
        f" + CAST(floor(({lon_expr} + 180.0) / {res!r}) AS BIGINT))"
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) spatial layout key — expressed the same three ways
# ---------------------------------------------------------------------------

# bit-spread magic masks: put a 16-bit value's bits into the even positions
# of a 32-bit word in 4 shift/mask rounds (classic Morton encoding)
_MORTON_ROUNDS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_col(x: Column) -> Column:
    for sh, mask in _MORTON_ROUNDS:
        x = (x.bitwiseOR(F.shiftleft(x, sh))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(lon: Column, lat: Column, bits: int = 16) -> Column:
    """Morton/Z-order key: quantize lon/lat to a 2^bits x 2^bits grid and
    interleave the bits (lat odd positions, lon even) — the
    locality-preserving sort/partition key for laying out a planetary image
    table (Iceberg/Delta Z-ORDER semantics: rows close on Earth land in the
    same parquet row groups, so a bbox query prunes to a contiguous key
    range instead of scattering over every file).

    Pure integer Column arithmetic (4 shift/mask rounds per axis) — stays
    inside whole-stage codegen, zero UDFs, and is reproduced digit-for-digit
    by ``sql_zorder_key`` / ``np_zorder_key``. ``bits`` <= 16 (a 32-bit key;
    ~600 m cells at 16 — layout keys don't need more)."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    n = 1 << bits
    qr = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))),
        F.lit(n - 1),
    ).cast("long")
    qc = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))),
        F.lit(n - 1),
    ).cast("long")
    return _spread_col(qc).bitwiseOR(F.shiftleft(_spread_col(qr), 1))


def np_zorder_key(lon: np.ndarray, lat: np.ndarray, bits: int = 16) -> np.ndarray:
    n = 1 << bits
    qr = np.minimum(
        np.floor((np.asarray(lat) + 90.0) / 180.0 * float(n)), n - 1
    ).astype(np.int64)
    qc = np.minimum(
        np.floor((np.asarray(lon) + 180.0) / 360.0 * float(n)), n - 1
    ).astype(np.int64)

    def spread(x):
        for sh, mask in _MORTON_ROUNDS:
            x = (x | (x << sh)) & mask
        return x

    return spread(qc) | (spread(qr) << 1)


def sql_zorder_key(lon_expr: str, lat_expr: str, bits: int = 16) -> str:
    n = 1 << bits

    def spread(e: str) -> str:
        for sh, mask in _MORTON_ROUNDS:
            e = f"(({e} | ({e} << {sh})) & {mask})"
        return e

    qr = f"CAST(least(floor(({lat_expr} + 90.0) / 180.0 * {float(n)!r}), {n - 1}) AS BIGINT)"
    qc = f"CAST(least(floor(({lon_expr} + 180.0) / 360.0 * {float(n)!r}), {n - 1}) AS BIGINT)"
    return f"({spread(qc)} | ({spread(qr)} << 1))"


# ---------------------------------------------------------------------------
# Hexagonal cells (H3-style axial index, planar) — the same three dialects
# ---------------------------------------------------------------------------

#: sqrt(3)/3 and 2/3 as explicit double literals so every engine computes
#: the identical fractional axial coordinates (no library sqrt at plan time)
_SQRT3_3 = 0.5773502691896257
_TWO_3 = 0.6666666666666666
_ONE_3 = 0.3333333333333333
_HEX_OFF = 2**20  # keeps axial coords positive before packing


def _hex_frac(lon: Column, lat: Column, size: float) -> tuple[Column, Column]:
    q = (lon * F.lit(_SQRT3_3) - lat * F.lit(_ONE_3)) / F.lit(size)
    r = (lat * F.lit(_TWO_3)) / F.lit(size)
    return q, r


def hex_cell_id(lon: Column, lat: Column, size: float) -> Column:
    """Pointy-top hexagonal cell id (H3-style axial index, planar degrees):
    fractional axial coords -> cube rounding -> packed (r, q) long.

    Rounding uses floor(x + 0.5) explicitly (dialect-identical), and the
    cube constraint x+y+z=0 is restored by recomputing the axis with the
    largest rounding error — all comparisons on the same doubles in every
    engine, so assignment is bit-reproducible (`sql_hex_cell_id` mirror).
    """
    q, r = _hex_frac(lon, lat, size)
    y = -q - r
    rq = F.floor(q + F.lit(0.5))
    ry = F.floor(y + F.lit(0.5))
    rr = F.floor(r + F.lit(0.5))
    dq = F.abs(rq.cast("double") - q)
    dy = F.abs(ry.cast("double") - y)
    dr = F.abs(rr.cast("double") - r)
    fq = F.when((dq > dy) & (dq > dr), -ry - rr).otherwise(rq)
    fr = F.when(~((dq > dy) & (dq > dr)) & (dr > dy), -rq - ry).otherwise(rr)
    return (fr + F.lit(_HEX_OFF)) * F.lit(_SHIFT) + (fq + F.lit(_HEX_OFF))


def sql_hex_cell_id(lon_expr: str, lat_expr: str, size: float) -> str:
    """DuckDB mirror of `hex_cell_id` — identical literals, identical
    operation order, identical tie-breaks."""
    q = f"(({lon_expr}) * {_SQRT3_3!r} - ({lat_expr}) * {_ONE_3!r}) / {size!r}"
    r = f"(({lat_expr}) * {_TWO_3!r}) / {size!r}"
    y = f"(-({q}) - ({r}))"
    rq, ry, rr = (f"floor(({e}) + 0.5)" for e in (q, y, r))
    dq = f"abs({rq} - ({q}))"
    dy = f"abs({ry} - ({y}))"
    dr = f"abs({rr} - ({r}))"
    big_q = f"({dq} > {dy} AND {dq} > {dr})"
    fq = f"(CASE WHEN {big_q} THEN -{ry} - {rr} ELSE {rq} END)"
    fr = f"(CASE WHEN NOT {big_q} AND {dr} > {dy} THEN -{rq} - {ry} ELSE {rr} END)"
    return (f"(CAST({fr} AS BIGINT) + {_HEX_OFF}) * {_SHIFT}"
            f" + (CAST({fq} AS BIGINT) + {_HEX_OFF})")


def np_hex_cell_id(lon: np.ndarray, lat: np.ndarray, size: float) -> np.ndarray:
    q = (lon * _SQRT3_3 - lat * _ONE_3) / size
    r = (lat * _TWO_3) / size
    y = -q - r
    rq, ry, rr = np.floor(q + 0.5), np.floor(y + 0.5), np.floor(r + 0.5)
    dq, dy, dr = np.abs(rq - q), np.abs(ry - y), np.abs(rr - r)
    big_q = (dq > dy) & (dq > dr)
    fq = np.where(big_q, -ry - rr, rq)
    fr = np.where(~big_q & (dr > dy), -rq - ry, rr)
    return (fr.astype(np.int64) + _HEX_OFF) * _SHIFT + (fq.astype(np.int64) + _HEX_OFF)


def hex_center(cid: Column, size: float) -> tuple[Column, Column]:
    """Planar center (lon, lat) of a hex cell id."""
    fr = (cid / F.lit(_SHIFT)).cast("long") - F.lit(_HEX_OFF)
    fq = (cid % F.lit(_SHIFT)) - F.lit(_HEX_OFF)
    # inverse of the axial transform: x = s*sqrt(3)*(q + r/2), y = s*3/2*r
    lon = F.lit(size) * F.lit(1.7320508075688772) * (
        fq.cast("double") + fr.cast("double") / F.lit(2.0))
    lat = F.lit(size) * F.lit(1.5) * fr.cast("double")
    return lon, lat


def hex_ring(cid: Column, k: int) -> Column:
    """array<long> of hex cells within axial distance ``k`` (the hex k-ring,
    incl. the cell itself) — the neighbor-expansion primitive for hex-grid
    kNN, mirroring `k_ring` on the square lattice. Hex distance between
    axial cells is (|dq| + |dr| + |dq+dr|) / 2."""
    fr = (cid / F.lit(_SHIFT)).cast("long")
    fq = cid % F.lit(_SHIFT)
    out = []
    for dq in range(-k, k + 1):
        for dr in range(-k, k + 1):
            if (abs(dq) + abs(dr) + abs(dq + dr)) // 2 <= k:
                out.append((fr + F.lit(dr)) * F.lit(_SHIFT) + (fq + F.lit(dq)))
    return F.array(*out)
