"""Order-insensitive set fingerprinting shared by checkpoint lineage and
the connected-components fixpoint test.

The triple (count, bit_xor(hash), decimal_sum(hash)) identifies a multiset
of hashes independent of row order:

* XOR alone is blind to even-multiplicity swaps — a duplicated key K
  replaced by a duplicated K' cancels in both — so the SUM component
  covers multiplicity;
* the sum accumulates as decimal(28,0): ANSI mode would THROW on a
  sum(long) overflow, and 28 digits cannot overflow below ~10^9 rows of
  extreme hashes per group (practically ~10^19 typical rows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_fingerprint_aggs(h: Column) -> list[Column]:
    """The three fingerprint aggregates over a hash column, aliased
    (n, h, s) — use in ``agg``/``groupBy().agg`` and read the row(s)."""
    return [
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(h).alias("h"),
        F.sum(h.cast("decimal(28,0)")).alias("s"),
    ]
