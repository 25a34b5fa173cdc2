"""Planar cell indexes: quadtree Morton ("S2-style") and hex axial ("H3-style").

The reference relies on ArcGIS's hidden spatial index for every
``SelectLayerByLocation`` / ``SpatialJoin`` call (e.g. IB-Tool2.py:670,
882, 1410).  In Spark there is no spatial index, so the engine makes the
index *explicit*: every geometry gets an int64 cell key, spatial
predicates become cell equi-joins (which Catalyst plans natively as
broadcast/sort-merge joins) followed by an exact numpy refine.

Both index families operate in the planar projected CRS the reference
uses (EPSG 25832/25833 meters — IB-Tool2_Config.txt:12); no geodesy.

Quadkey layout (primary join/tile key)
--------------------------------------
``id = (res << 58) | morton52(ix, iy)`` where ``ix, iy`` are the
column/row of the cell in a ``2^res × 2^res`` grid over the configured
square extent.  ``res <= 26`` so the id stays a positive int64.
Parent/tile derivation is pure bit math → stays JVM-side
(whole-stage-codegen) in Spark.

Hex layout (density clustering key)
-----------------------------------
Axial coordinates (q, r) of a pointy-top hex grid with cell size
``extent / 2^res``; packed as ``(res << 58) | ((q + 2^28) << 29) |
(r + 2^28)``.  Used by the density/raster layer where hex k-rings give
the isotropic neighborhoods the reference's circular PointDensity
kernel (IB-Tool2.py:799-801) assumes.

Every function has a vectorized-numpy form (for kernels / the
pure-pandas oracle) and, where hot, a Spark Column form built from
built-in functions only.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

try:  # Column builders only needed on the driver
    from pyspark.sql import Column
    from pyspark.sql import functions as F
except ImportError:  # pragma: no cover - kernels usable without Spark
    Column = None
    F = None

_RES_SHIFT = 58
_MORTON_MASK = (1 << _RES_SHIFT) - 1
_HEX_OFF = 1 << 28
_HEX_BITS = 29
_HEX_MASK = (1 << _HEX_BITS) - 1
MAX_RES = 26


@dataclass(frozen=True)
class GridConfig:
    """Square scene extent the cell grids are anchored to.

    Default covers [0, 131072) m — a 2^17 m box so every resolution has
    a power-of-two cell size in meters (res 10 → 128 m, res 13 → 16 m).
    """

    x0: float = 0.0
    y0: float = 0.0
    extent: float = 131072.0

    def cell_size(self, res: int) -> float:
        return self.extent / (1 << res)


DEFAULT_GRID = GridConfig()


# ---------------------------------------------------------------------------
# Morton (quadtree) — numpy
# ---------------------------------------------------------------------------

def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 26 bits of each uint64 so they occupy even positions."""
    v = v.astype(np.uint64)
    v &= np.uint64(0x3FFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _unpart1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x3FFFFFF)
    return v


def xy_to_colrow(x, y, res: int, grid: GridConfig = DEFAULT_GRID):
    """Clip coordinates into the grid and return integer (col, row)."""
    n = 1 << res
    cs = grid.cell_size(res)
    ix = np.clip(np.floor((np.asarray(x, dtype=np.float64) - grid.x0) / cs), 0, n - 1)
    iy = np.clip(np.floor((np.asarray(y, dtype=np.float64) - grid.y0) / cs), 0, n - 1)
    return ix.astype(np.int64), iy.astype(np.int64)


def encode(x, y, res: int, grid: GridConfig = DEFAULT_GRID) -> np.ndarray:
    """Vectorized quadkey encode: (x, y) arrays → int64 cell ids."""
    ix, iy = xy_to_colrow(x, y, res, grid)
    m = _part1by1(ix.astype(np.uint64)) | (_part1by1(iy.astype(np.uint64)) << np.uint64(1))
    return ((np.uint64(res) << np.uint64(_RES_SHIFT)) | m).astype(np.int64)


def encode_colrow(ix, iy, res: int) -> np.ndarray:
    ix = np.asarray(ix, dtype=np.uint64)
    iy = np.asarray(iy, dtype=np.uint64)
    m = _part1by1(ix) | (_part1by1(iy) << np.uint64(1))
    return ((np.uint64(res) << np.uint64(_RES_SHIFT)) | m).astype(np.int64)


def decode_colrow(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """int64 cell ids → (col, row, res)."""
    c = np.asarray(cell, dtype=np.uint64)
    res = (c >> np.uint64(_RES_SHIFT)).astype(np.int64)
    m = c & np.uint64(_MORTON_MASK)
    ix = _unpart1by1(m).astype(np.int64)
    iy = _unpart1by1(m >> np.uint64(1)).astype(np.int64)
    return ix, iy, res


def cell_bbox(cell, grid: GridConfig = DEFAULT_GRID):
    """Cell ids → (minx, miny, maxx, maxy) arrays."""
    ix, iy, res = decode_colrow(cell)
    cs = grid.extent / (1 << res[0]) if np.ndim(res) else grid.cell_size(int(res))
    # vectorized over possibly-mixed res:
    cs = grid.extent / (np.int64(1) << res).astype(np.float64)
    minx = grid.x0 + ix * cs
    miny = grid.y0 + iy * cs
    return minx, miny, minx + cs, miny + cs


def parent(cell, parent_res: int) -> np.ndarray:
    """Coarsen cell ids to ``parent_res`` (the tile id derivation)."""
    c = np.asarray(cell, dtype=np.uint64)
    res = (c >> np.uint64(_RES_SHIFT)).astype(np.int64)
    m = c & np.uint64(_MORTON_MASK)
    shift = (2 * (res - parent_res)).astype(np.uint64)
    pm = m >> shift
    return ((np.uint64(parent_res) << np.uint64(_RES_SHIFT)) | pm).astype(np.int64)


def k_ring_offsets(k: int) -> np.ndarray:
    """(dx, dy) offsets of the square k-ring neighborhood, incl. center."""
    d = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(d, d)
    return np.stack([dx.ravel(), dy.ravel()], axis=1)


def k_ring(cell: int, k: int, grid: GridConfig = DEFAULT_GRID) -> np.ndarray:
    """Square k-ring of one cell id → int64 array (clipped to the grid)."""
    ix, iy, res = decode_colrow(np.asarray([cell]))
    n = 1 << int(res[0])
    offs = k_ring_offsets(k)
    cx = ix[0] + offs[:, 0]
    cy = iy[0] + offs[:, 1]
    ok = (cx >= 0) & (cx < n) & (cy >= 0) & (cy < n)
    return encode_colrow(cx[ok], cy[ok], int(res[0]))


# ---------------------------------------------------------------------------
# Morton (quadtree) — Spark Column builders (pure built-ins, codegen-able)
# ---------------------------------------------------------------------------

def _part1by1_col(c: "Column") -> "Column":
    c = c.bitwiseAND(F.lit(0x3FFFFFF))
    c = (c.bitwiseOR(F.shiftleft(c, 16))).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    c = (c.bitwiseOR(F.shiftleft(c, 8))).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    c = (c.bitwiseOR(F.shiftleft(c, 4))).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    c = (c.bitwiseOR(F.shiftleft(c, 2))).bitwiseAND(F.lit(0x3333333333333333))
    c = (c.bitwiseOR(F.shiftleft(c, 1))).bitwiseAND(F.lit(0x5555555555555555))
    return c


def encode_col(x: "Column", y: "Column", res: int, grid: GridConfig = DEFAULT_GRID) -> "Column":
    """Quadkey encode as a pure Column expression (no Python in the hot path).

    Mirrors :func:`encode` bit-for-bit — pinned by tests against the
    numpy kernel so the JVM path and the oracle path cannot drift.
    """
    n = 1 << res
    cs = grid.cell_size(res)
    ix = F.least(F.greatest(F.floor((x - F.lit(grid.x0)) / F.lit(cs)), F.lit(0)), F.lit(n - 1)).cast("long")
    iy = F.least(F.greatest(F.floor((y - F.lit(grid.y0)) / F.lit(cs)), F.lit(0)), F.lit(n - 1)).cast("long")
    m = _part1by1_col(ix).bitwiseOR(F.shiftleft(_part1by1_col(iy), 1))
    return F.lit(res << _RES_SHIFT).bitwiseOR(m).alias("cell")


def parent_col(cell: "Column", child_res: int, parent_res: int) -> "Column":
    """Tile id from cell id — pure bit math, JVM-side."""
    m = cell.bitwiseAND(F.lit(_MORTON_MASK))
    pm = F.shiftrightunsigned(m, 2 * (child_res - parent_res))
    return F.lit(parent_res << _RES_SHIFT).bitwiseOR(pm)


# ---------------------------------------------------------------------------
# Hex axial ("H3-style") — numpy kernels (used inside pandas UDFs)
# ---------------------------------------------------------------------------

_SQRT3 = np.sqrt(3.0)


def hex_encode(x, y, res: int, grid: GridConfig = DEFAULT_GRID) -> np.ndarray:
    """Pointy-top hex axial encode: (x, y) arrays → packed int64 ids."""
    size = grid.cell_size(res)
    px = (np.asarray(x, dtype=np.float64) - grid.x0) / size
    py = (np.asarray(y, dtype=np.float64) - grid.y0) / size
    qf = (_SQRT3 / 3.0) * px - (1.0 / 3.0) * py
    rf = (2.0 / 3.0) * py
    q, r = _axial_round(qf, rf)
    qq = (q + _HEX_OFF).astype(np.uint64) & np.uint64(_HEX_MASK)
    rr = (r + _HEX_OFF).astype(np.uint64) & np.uint64(_HEX_MASK)
    return (
        (np.uint64(res) << np.uint64(_RES_SHIFT))
        | (qq << np.uint64(_HEX_BITS))
        | rr
    ).astype(np.int64)


def _axial_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cube-rounding of fractional axial coords (standard hex rounding)."""
    sf = -qf - rf
    q = np.rint(qf)
    r = np.rint(rf)
    s = np.rint(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def hex_decode(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Packed hex ids → (q, r, res)."""
    c = np.asarray(cell, dtype=np.uint64)
    res = (c >> np.uint64(_RES_SHIFT)).astype(np.int64)
    q = ((c >> np.uint64(_HEX_BITS)) & np.uint64(_HEX_MASK)).astype(np.int64) - _HEX_OFF
    r = (c & np.uint64(_HEX_MASK)).astype(np.int64) - _HEX_OFF
    return q, r, res


def hex_center(cell, grid: GridConfig = DEFAULT_GRID) -> tuple[np.ndarray, np.ndarray]:
    q, r, res = hex_decode(cell)
    size = grid.extent / (np.int64(1) << res).astype(np.float64)
    x = grid.x0 + size * _SQRT3 * (q + r / 2.0)
    y = grid.y0 + size * 1.5 * r
    return x, y


_HEX_DIRS = np.array(
    [(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], dtype=np.int64
)


def hex_k_ring(cell: int, k: int) -> np.ndarray:
    """All hex cells within grid-distance k of ``cell`` (incl. itself)."""
    q0, r0, res = hex_decode(np.asarray([cell]))
    out = []
    for dq in range(-k, k + 1):
        lo = max(-k, -dq - k)
        hi = min(k, -dq + k)
        for dr in range(lo, hi + 1):
            out.append((q0[0] + dq, r0[0] + dr))
    arr = np.array(out, dtype=np.int64)
    qq = (arr[:, 0] + _HEX_OFF).astype(np.uint64) & np.uint64(_HEX_MASK)
    rr = (arr[:, 1] + _HEX_OFF).astype(np.uint64) & np.uint64(_HEX_MASK)
    return (
        (np.uint64(int(res[0])) << np.uint64(_RES_SHIFT))
        | (qq << np.uint64(_HEX_BITS))
        | rr
    ).astype(np.int64)


def hex_k_ring_offsets(k: int) -> np.ndarray:
    """(dq, dr) axial offsets within distance k (incl. origin)."""
    out = []
    for dq in range(-k, k + 1):
        lo = max(-k, -dq - k)
        hi = min(k, -dq + k)
        for dr in range(lo, hi + 1):
            out.append((dq, dr))
    return np.array(out, dtype=np.int64)
