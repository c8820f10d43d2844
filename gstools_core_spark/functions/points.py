"""Deterministic point derivation from integer keys.

Used to turn any integer-keyed table (documents.doc_id, events.event_id, …)
into a reproducible 2-D point cloud — mirroring the reference bench's
Uniform(-10,10) cloud (reference benches/main.rs:177-180) — with arithmetic
that Spark and DuckDB evaluate bitwise-identically (integer mul/mod, then one
division; never pow, never engine-specific hash).

The same SQL text is used by the Spark side (via ``F.expr``) and the DuckDB
oracle, so the derived doubles agree to the last bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# LCG-style multipliers (public-domain constants: MINSTD 48271 / GFSR 69621)
AX, BX, MX = 48271, 11, 2000
AY, BY, MY = 69621, 7, 2000


# NOTE: the integer expression is CAST to DOUBLE *before* the division so
# DuckDB (whose bare `100.0` literal is DECIMAL, giving exact decimal
# arithmetic) performs the same two double roundings Spark does — the
# derived coordinates must be bitwise identical across engines.

def sql_x(key: str = "doc_id") -> str:
    """x in [-10, 9.99] on a 0.01 lattice."""
    return f"(CAST(({key} * {AX} + {BX}) % {MX} AS DOUBLE) / 100.0 - 10.0)"


def sql_y(key: str = "doc_id") -> str:
    return f"(CAST(({key} * {AY} + {BY}) % {MY} AS DOUBLE) / 100.0 - 10.0)"


def sql_lat(key: str = "doc_id") -> str:
    """lat in [-60, 59.9] (bounded away from poles for ring-join safety)."""
    return f"(CAST(({key} * {AX} + {BX}) % 1200 AS DOUBLE) / 10.0 - 60.0)"


def sql_lon(key: str = "doc_id") -> str:
    """lon in [-170, 169.9]."""
    return f"(CAST(({key} * {AY} + {BY}) % 3400 AS DOUBLE) / 10.0 - 170.0)"


def x_col(key: str = "doc_id") -> Column:
    return F.expr(sql_x(key))


def y_col(key: str = "doc_id") -> Column:
    return F.expr(sql_y(key))


def lat_col(key: str = "doc_id") -> Column:
    return F.expr(sql_lat(key))


def lon_col(key: str = "doc_id") -> Column:
    return F.expr(sql_lon(key))


def with_xy(df: DataFrame, key: str, id_col: str = "id") -> DataFrame:
    """Project an integer-keyed table to (id, x, y)."""
    return df.select(
        F.col(key).cast("long").alias(id_col),
        x_col(key).alias("x"),
        y_col(key).alias("y"),
    )


def with_latlon(df: DataFrame, key: str, id_col: str = "id") -> DataFrame:
    return df.select(
        F.col(key).cast("long").alias(id_col),
        lat_col(key).alias("lat"),
        lon_col(key).alias("lon"),
    )


# third axis for 3-D point clouds (L'Ecuyer MINSTD-family multiplier)
AZ, BZ, MZ = 40692, 3, 2000


def sql_z(key: str = "doc_id") -> str:
    """z in [-10, 9.99] on a 0.01 lattice (3-D blocking gate query)."""
    return f"(CAST(({key} * {AZ} + {BZ}) % {MZ} AS DOUBLE) / 100.0 - 10.0)"


def z_col(key: str = "doc_id") -> Column:
    return F.expr(sql_z(key))
