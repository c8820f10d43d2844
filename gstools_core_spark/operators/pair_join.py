"""Distributed all-pairs-within-radius self-join (the variogram's theta join).

The reference enumerates all O(n²/2) pairs in a triangular nested loop
(variogram.rs:377-382, 510-515).  At 100 TB that is not a loop but a join, and
a naive theta join (dist < r) would execute as a broadcast nested-loop join.
We rewrite it into an EQUI-join on spatial blocks:

1. quantize points to a grid with cell_size = max_dist → (cx, cy);
2. stamp the LEFT side onto its 3×3 neighbor-cell ring (explode ×9);
3. equi-join on the ring cell == right cell (hash shuffle join — Catalyst
   partial-partitions it, AQE splits skewed cells);
4. keep ``a.id < b.id`` (work-halving symmetry, mirroring the reference's
   triangular loop) and ``dist < max_dist`` (exact predicate).

Every unordered pair within max_dist appears exactly once: point b's cell is
always inside point a's ring when dist < cell_size, cells are unique, and the
id ordering dedupes the two orientations.

Skew: hot cells (the north rule's dense pages) are handled by (a) AQE skew
join splitting — the join is a plain shuffle equi-join, so AQE can split
oversized partitions — and (b) an optional explicit pre-repartition by
(cell, salt) for the pathological single-hot-cell case.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gstools_core_spark.functions import distance as D


def pair_join(
    points: DataFrame,
    max_dist: float,
    id_col: str = "id",
    coords: Sequence[str] = ("x", "y"),
    payload_cols: Sequence[str] = ("val",),
    haversine: bool = False,
    max_abs_lat: float = 89.0,
    salt_partitions: int | None = None,
) -> DataFrame:
    """Return one row per unordered pair (a, b) with dist(a,b) < max_dist.

    Output columns: a_<id>, b_<id>, dist, a_<payload>, b_<payload> …

    For ``haversine=True`` coords must be ("lat", "lon") in degrees and
    ``max_dist`` is a central angle in RADIANS (variogram.rs:107-118); the
    blocking grid is sized in degrees with a sec(lat) safety factor on
    longitude, so points must satisfy |lat| <= max_abs_lat.
    """
    import math

    if haversine:
        lat_c, lon_c = coords
        cell_lat = math.degrees(max_dist)
        # a pair within central angle θ has |Δlon| ≤ θ·sec(|lat|+θ)
        cell_lon = cell_lat / max(math.cos(math.radians(min(max_abs_lat, 89.0)) + max_dist), 1e-6)
        cx_a = F.floor(F.col(lat_c) / F.lit(cell_lat)).cast("long")
        cy_a = F.floor(F.col(lon_c) / F.lit(cell_lon)).cast("long")
    else:
        cx_a = F.floor(F.col(coords[0]) / F.lit(max_dist)).cast("long")
        cy_a = F.floor(F.col(coords[1]) / F.lit(max_dist)).cast("long")

    base_cols = [F.col(id_col), *[F.col(c) for c in coords], *[F.col(c) for c in payload_cols]]
    pts = points.select(*base_cols, cx_a.alias("cx"), cy_a.alias("cy"))

    # left: stamped onto 3x3 ring
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = (
        pts.withColumn("_off", F.explode(offsets))
        .select(
            *[F.col(c).alias(f"a_{c}") for c in [id_col, *coords, *payload_cols]],
            (F.col("cx") + F.col("_off.dx")).alias("jcx"),
            (F.col("cy") + F.col("_off.dy")).alias("jcy"),
        )
    )
    right = pts.select(
        *[F.col(c).alias(f"b_{c}") for c in [id_col, *coords, *payload_cols]],
        F.col("cx").alias("jcx"),
        F.col("cy").alias("jcy"),
    )

    if salt_partitions:
        # explicit co-partitioning before the join; AQE still splits skew
        left = left.repartition(salt_partitions, "jcx", "jcy")
        right = right.repartition(salt_partitions, "jcx", "jcy")

    joined = left.join(right, on=["jcx", "jcy"], how="inner").where(
        F.col(f"a_{id_col}") < F.col(f"b_{id_col}")
    )

    if haversine:
        dist = D.haversine(
            F.col(f"a_{coords[0]}"), F.col(f"a_{coords[1]}"),
            F.col(f"b_{coords[0]}"), F.col(f"b_{coords[1]}"),
        )
    else:
        dist = D.euclid(
            [F.col(f"a_{c}") for c in coords], [F.col(f"b_{c}") for c in coords]
        )

    out_cols = [
        F.col(f"a_{id_col}"),
        F.col(f"b_{id_col}"),
        dist.alias("dist"),
        *[F.col(f"a_{c}") for c in coords],
        *[F.col(f"b_{c}") for c in coords],
        *[F.col(f"a_{c}") for c in payload_cols],
        *[F.col(f"b_{c}") for c in payload_cols],
    ]
    return joined.select(*out_cols).where(F.col("dist") < F.lit(max_dist))
