"""Portable (cross-engine) string hashing.

``xxhash64`` is Spark-only; the correctness gate runs the same query in
DuckDB, so hash-dependent operators (minhash, simhash) use an md5-derived
integer both engines compute bitwise-identically:

    h(s) = int(md5(utf8(s))[:15 hex], 16)          — 60 bits, nonnegative
    h2(s) = int(md5(utf8(s))[15:30 hex], 16)       — next 60 bits

Spark: conv(substring(md5(s), ...), 16, 10) → long.
DuckDB: CAST(concat('0x', substr(md5(s), ...)) AS BIGINT).

md5 is ~5-10× slower than xxhash64 but still JVM-side / vectorized and a
rounding error next to the shuffle it feeds; operators accept
``hash_fn="xx"`` to switch back when differential testability isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash(c: Column, lo: int = 1, n: int = 15) -> Column:
    """Nonnegative < 2^(4n) integer from md5 hex digits [lo, lo+n)."""
    return F.conv(F.substring(F.md5(F.encode(c, "UTF-8")), lo, n), 16, 10).cast(
        "long"
    )


def portable_hash2(c: Column) -> Column:
    """Second independent 60-bit value (hex digits 16..30)."""
    return portable_hash(c, lo=16, n=15)


def sql_portable_hash(expr: str, lo: int = 1, n: int = 15) -> str:
    """DuckDB expression computing the same integer."""
    return f"CAST(concat('0x', substr(md5({expr}), {lo}, {n})) AS BIGINT)"


def sql_portable_hash2(expr: str) -> str:
    return sql_portable_hash(expr, lo=16, n=15)
