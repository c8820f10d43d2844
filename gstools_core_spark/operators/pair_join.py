"""Distributed all-pairs-within-radius self-join (the variogram's theta join).

The reference enumerates all O(n²/2) pairs in a triangular nested loop
(variogram.rs:377-382, 510-515).  At 100 TB that is not a loop but a join, and
a naive theta join (dist < r) would execute as a broadcast nested-loop join.
We rewrite it into an EQUI-join on spatial blocks:

1. quantize points to a grid with cell_size = max_dist → (cx, cy);
2. stamp the LEFT side onto a HALF-STENCIL of its neighbor ring — the center
   plus 4 of the 8 directions {E, NE, N, NW} (explode ×5, not ×9: the half
   set H and −H partition the 8 directions, so each unordered neighbor cell
   pair is generated exactly once);
3. equi-join on the stamped cell == right cell (hash shuffle join — AQE
   splits skewed cells);
4. same-cell matches keep ``a.id < b.id`` (work-halving symmetry, mirroring
   the reference's triangular loop); cross-cell matches are already unique;
5. exact predicate ``dist < max_dist``; ids canonicalized to a_id < b_id.

Every unordered pair within max_dist appears exactly once: point b's cell is
inside point a's 3×3 ring when dist < cell_size, and exactly one of
(cell_b − cell_a) ∈ H ∪ {0} or (cell_a − cell_b) ∈ H holds.

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
    salt_hot: int | None = None,
    hot_threshold: int = 50_000,
) -> DataFrame:
    """Return one row per unordered pair (a, b) with dist(a,b) < max_dist.

    Output columns: a_<id>, b_<id>, dist, a_<payload>, b_<payload> …

    For ``haversine=True`` coords must be ("lat", "lon") in degrees and
    ``max_dist`` is a central angle in RADIANS (variogram.rs:107-118); the
    blocking grid is sized in degrees with a sec(lat) safety factor on
    longitude, so points must satisfy |lat| <= max_abs_lat.

    ``salt_hot=S`` enables EXPLICIT hot-cell salting (north rule): cells
    whose point count exceeds ``hot_threshold`` get their join key extended
    with a salt — the stamped (left) side takes ``pmod(xxhash64(id), S)``,
    the right side is replicated across all S salts — splitting one hot
    cell's pair work across S reducers.  Each pair is still produced exactly
    once (the left row's salt selects one of the S replicas).  Cold cells
    pay nothing (salt 0, no replication).
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

    # left: stamped onto the half-stencil {center, E, NE, N, NW}
    half = [(0, 0), (1, 0), (1, 1), (0, 1), (-1, 1)]
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in half
        ]
    )
    left = (
        pts.withColumn("_off", F.explode(offsets))
        .select(
            *[F.col(c).alias(f"a_{c}") for c in [id_col, *coords, *payload_cols]],
            (F.col("cx") + F.col("_off.dx")).alias("jcx"),
            (F.col("cy") + F.col("_off.dy")).alias("jcy"),
            ((F.col("_off.dx") == 0) & (F.col("_off.dy") == 0)).alias("_same_cell"),
        )
    )
    right = pts.select(
        *[F.col(c).alias(f"b_{c}") for c in [id_col, *coords, *payload_cols]],
        F.col("cx").alias("jcx"),
        F.col("cy").alias("jcy"),
    )

    join_keys = ["jcx", "jcy"]
    if salt_hot:
        hot = (
            pts.groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > hot_threshold)
            .collect()
        )
        hot_keys = [f"{r['cx']},{r['cy']}" for r in hot]
        if hot_keys:
            key_str = F.concat_ws(",", F.col("jcx"), F.col("jcy"))
            left = left.withColumn(
                "jsalt",
                F.when(
                    key_str.isin(hot_keys),
                    F.pmod(F.xxhash64(F.col(f"a_{id_col}")), F.lit(salt_hot)),
                )
                .otherwise(F.lit(0))
                .cast("long"),
            )
            right = (
                right.withColumn(
                    "_salts",
                    F.when(
                        key_str.isin(hot_keys), F.sequence(F.lit(0), F.lit(salt_hot - 1))
                    ).otherwise(F.array(F.lit(0))),
                )
                .withColumn("jsalt", F.explode("_salts"))
                .withColumn("jsalt", F.col("jsalt").cast("long"))
                .drop("_salts")
            )
            join_keys = ["jcx", "jcy", "jsalt"]

    if salt_partitions:
        # explicit co-partitioning before the join; AQE still splits skew
        left = left.repartition(salt_partitions, *join_keys)
        right = right.repartition(salt_partitions, *join_keys)

    # same-cell matches appear in both orientations → keep a < b there;
    # cross-cell matches are generated exactly once by the half-stencil
    joined = left.join(right, on=join_keys, how="inner").where(
        ~F.col("_same_cell") | (F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
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

    # canonicalize: output pair always has a_id < b_id (swap sides if needed)
    swap = F.col(f"a_{id_col}") > F.col(f"b_{id_col}")

    def pick(col: str, side: str) -> F.Column:
        other = "b" if side == "a" else "a"
        return F.when(swap, F.col(f"{other}_{col}")).otherwise(F.col(f"{side}_{col}")).alias(f"{side}_{col}")

    out_cols = [
        pick(id_col, "a"),
        pick(id_col, "b"),
        dist.alias("dist"),
        *[pick(c, "a") for c in coords],
        *[pick(c, "b") for c in coords],
        *[pick(c, "a") for c in payload_cols],
        *[pick(c, "b") for c in payload_cols],
    ]
    return joined.select(*out_cols).where(F.col("dist") < F.lit(max_dist))
