"""Hierarchical cell index (H3/S2-style, engine-layer requirement).

No h3 wheel exists in the environment (SURVEY.md §7), so the index is our
own: quantize to a grid at a given resolution, then interleave bits into a
Morton (Z-order) code.  Properties mirroring H3/S2:

* hierarchical — the parent cell at resolution r-1 is ``cell >> 2`` (bit
  prefix), so coarse↔fine navigation is integer shifts;
* locality — Z-order keeps most spatial neighbors numerically close, which
  makes range-partitioning by cell_id a decent spatial partitioner;
* neighbor rings are pure integer arithmetic (no lookup tables).

Both a Spark-column and a numpy implementation are provided; tests assert
they agree exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# World bounds for the geographic index (lat/lon degrees).
LAT0, LON0 = -90.0, -180.0
LAT_SPAN, LON_SPAN = 180.0, 360.0
MAX_RES = 20  # 2^20 cells per axis max


def _spread_bits_col(v: Column) -> Column:
    """Spread the low 21 bits of v so there is a zero bit between each
    (standard Morton bit-twiddling, closed form)."""
    x = v.cast("long")
    x = x.bitwiseOR(F.shiftleft(x, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x3333333333333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return x


def _spread_bits_np(v: np.ndarray) -> np.ndarray:
    x = v.astype(np.int64)
    x = (x | (x << 16)) & 0x0000FFFF0000FFFF
    x = (x | (x << 8)) & 0x00FF00FF00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0F
    x = (x | (x << 2)) & 0x3333333333333333
    x = (x | (x << 1)) & 0x5555555555555555
    return x


def morton_col(ix: Column, iy: Column) -> Column:
    return _spread_bits_col(ix).bitwiseOR(F.shiftleft(_spread_bits_col(iy), 1))


def morton_np(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return _spread_bits_np(ix) | (_spread_bits_np(iy) << 1)


def geo_cell_col(lat: Column, lon: Column, res: int) -> Column:
    """Morton cell id of a lat/lon point at resolution ``res``
    (2^res × 2^res grid over the globe).  Parent at res-1 = cell >> 2.
    Both index edges are clamped: a coordinate below the domain (wrapped
    or dirty data) would give a NEGATIVE index whose bit interleave is
    not prefix-hierarchical and can collide with a legitimate cell."""
    n = float(1 << res)
    ix = F.greatest(
        F.least(
            F.floor((lon - F.lit(LON0)) / F.lit(LON_SPAN / n)).cast("long"),
            F.lit((1 << res) - 1),
        ),
        F.lit(0).cast("long"),
    )
    iy = F.greatest(
        F.least(
            F.floor((lat - F.lit(LAT0)) / F.lit(LAT_SPAN / n)).cast("long"),
            F.lit((1 << res) - 1),
        ),
        F.lit(0).cast("long"),
    )
    return morton_col(ix, iy)


def geo_cell_np(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    n = float(1 << res)
    hi = (1 << res) - 1
    ix = np.clip(np.floor((lon - LON0) / (LON_SPAN / n)).astype(np.int64), 0, hi)
    iy = np.clip(np.floor((lat - LAT0) / (LAT_SPAN / n)).astype(np.int64), 0, hi)
    return morton_np(ix, iy)


def parent_cell(cell: Column, levels: int = 1) -> Column:
    """Coarsen a Morton cell by ``levels`` resolutions (prefix semantics)."""
    return F.shiftrightunsigned(cell, 2 * levels)


# ---------------------------------------------------------------------------
# planar quantization used by the pair-join blocking (not hierarchical —
# just bucketing at cell_size = max join radius; ring of ±1 covers the radius)
# ---------------------------------------------------------------------------

def grid_cell_cols(x: Column, y: Column, cell_size: float) -> tuple[Column, Column]:
    cx = F.floor(x / F.lit(cell_size)).cast("long")
    cy = F.floor(y / F.lit(cell_size)).cast("long")
    return cx, cy


def assign_grid_cells(
    df: DataFrame,
    cell_size: float,
    x_col: str = "x",
    y_col: str = "y",
    prefix: str = "c",
) -> DataFrame:
    cx, cy = grid_cell_cols(F.col(x_col), F.col(y_col), cell_size)
    return df.withColumn(f"{prefix}x", cx).withColumn(f"{prefix}y", cy)


RING_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def explode_ring(
    df: DataFrame,
    cx_col: str = "cx",
    cy_col: str = "cy",
    out_x: str = "rcx",
    out_y: str = "rcy",
    span: int = 1,
) -> DataFrame:
    """Stamp each row onto its (2·span+1)² neighbor cells.

    Output has one row per (input row, neighbor cell); joining the other side
    on exact cell equality then finds every pair within cell_size·span.
    """
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in range(-span, span + 1)
            for dy in range(-span, span + 1)
        ]
    )
    return (
        df.withColumn("_off", F.explode(offsets))
        .withColumn(out_x, F.col(cx_col) + F.col("_off.dx"))
        .withColumn(out_y, F.col(cy_col) + F.col("_off.dy"))
        .drop("_off")
    )
