"""Distributed all-pairs-within-radius self-join (the variogram's theta join).

The reference enumerates all O(n²/2) pairs in a triangular nested loop
(variogram.rs:377-382, 510-515).  At 100 TB that is not a loop but a join, and
a naive theta join (dist < r) would execute as a broadcast nested-loop join.
We rewrite it into an EQUI-join on spatial blocks:

1. quantize points to a grid with cell width >= max_dist per dimension;
2. stamp the LEFT side onto a HALF-STENCIL of its neighbor hypercube — the
   center plus the lexicographically-positive offsets of {-1,0,1}^d (explode
   ×((3^d−1)/2 + 1); d=2 → ×5, d=3 → ×14): the positive set H and −H
   partition the nonzero offsets, so each unordered neighbor cell pair is
   generated exactly once;
3. equi-join on the stamped cell == right cell (hash shuffle join — AQE
   splits skewed cells);
4. same-cell matches keep ``a.id < b.id`` (work-halving symmetry, mirroring
   the reference's triangular loop); cross-cell matches are already unique;
5. exact predicate ``dist < max_dist``; ids canonicalized to a_id < b_id.

Every unordered pair within max_dist appears exactly once: point b's cell is
inside point a's neighbor hypercube when dist < cell width, and exactly one
of (cell_b − cell_a) ∈ H ∪ {0} or (cell_a − cell_b) ∈ H holds.

Haversine blocking (lat/lon degrees, max_dist a central angle in radians):

* latitude cells of width degrees(max_dist) — |Δlat| ≤ θ for any pair;
* longitude cells WRAP at ±180°: the circle is tiled with
  n_lon = floor(360 / w_req) cells where w_req = degrees(θ)/cos(φmax + θ)
  bounds |Δlon| for any pair whose great-circle arc stays below latitude
  φmax + θ (the arc between two points at |lat| ≤ φmax cannot climb higher
  than φmax + θ).  The stamped lon index is taken mod n_lon, so antimeridian
  pairs land in adjacent cells.  φmax is DERIVED FROM THE DATA (one max(|lat|)
  aggregate) unless the caller supplies ``max_abs_lat``.  When the secant
  bound degenerates (near-polar data or huge θ → n_lon < 3, where modular
  adjacency would double-generate pairs) longitude blocking is disabled
  entirely — a single planet-wide lon cell, still exact, just unpruned.

Skew: hot cells (the north rule's dense pages) are handled by (a) AQE skew
join splitting — the join is a plain shuffle equi-join, so AQE can split
oversized partitions — and (b) optional explicit salting: hot cells are
detected with a count aggregate and flagged onto both join sides via a
BROADCAST join (no driver-side key list, no plan-size blowup), the stamped
side takes a hash salt and the right side replicates across all salts.
"""

from __future__ import annotations

import itertools
import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gstools_core_spark.functions import distance as D


def half_stencil(d: int) -> list[tuple[int, ...]]:
    """Center + lexicographically-positive neighbor offsets of {-1,0,1}^d.

    H = {o ≠ 0 : first nonzero component of o is +1} satisfies H ∪ −H =
    all nonzero offsets (disjoint), so stamping the left side on {0} ∪ H
    generates each unordered neighbor-cell pair exactly once.
    """
    zero = (0,) * d
    return [zero] + [
        o for o in itertools.product((-1, 0, 1), repeat=d) if o > zero
    ]


def haversine_grid(
    max_dist: float, lat_bound: float
) -> tuple[float, int, float]:
    """Blocking grid for haversine pairs → (cell_lat_deg, n_lon, lon_width_deg).

    ``n_lon == 1`` means longitude blocking is disabled (single cell).
    The secant bound cos(φmax + θ) is evaluated at the maximum latitude the
    connecting great-circle arc can reach; when it is ≤ 0 (poles reachable)
    or the required width exceeds 120° (n_lon < 3, modular adjacency unsafe)
    we fall back to one lon cell.  NO clamp on ``lat_bound``: capping it at
    89° silently under-sized lon cells for data in (89°, 90°) — near-polar
    bounds flow into the cosine and degrade to the (sound) single-cell
    fallback on their own.
    """
    cell_lat = math.degrees(max_dist)
    phi = math.radians(abs(lat_bound)) + max_dist
    denom = math.cos(phi)
    if denom <= 1e-9:
        return cell_lat, 1, 360.0
    w_req = cell_lat / denom  # degrees of longitude
    n_lon = int(360.0 // w_req)
    if n_lon < 3:
        return cell_lat, 1, 360.0
    return cell_lat, n_lon, 360.0 / n_lon


def geo_cell_exprs(
    lat_col: str, lon_col: str, cell_lat: float, n_lon: int, lon_w: float
) -> list[Column]:
    """Blocking-cell index Columns for the wrapped haversine grid — the ONE
    definition of geo blocking cells (pair join, geo kNN, geo kriging all
    share it; the lon==180.0 seam clamp lives only here)."""
    cells = [F.floor(F.col(lat_col) / F.lit(cell_lat)).cast("long")]
    if n_lon > 1:
        cy = F.floor((F.col(lon_col) + F.lit(180.0)) / F.lit(lon_w)).cast("long")
        # lon == 180.0 exactly lands in cell n_lon → clamp to the seam cell
        cells.append(F.least(cy, F.lit(n_lon - 1)))
    return cells


def top_hot_cells(
    counts: DataFrame,
    keys: Sequence[str],
    threshold: float,
    cap: int | None,
) -> DataFrame:
    """Cells whose ``_hot_n`` count exceeds ``threshold``, bounded at the
    top-``cap`` by count with a DETERMINISTIC tie-break on the cell keys —
    the ONE recipe behind every hot-set selection (pair_join salting,
    kriging salting, auto grouping's keep-fine).  Any change to the
    tie-break or cap semantics happens here and nowhere else."""
    hot = counts.where(F.col("_hot_n") > threshold)
    if cap is not None:
        hot = hot.orderBy(F.col("_hot_n").desc(), *keys).limit(cap)
    return hot


def pair_join(
    points: DataFrame,
    max_dist: float,
    id_col: str = "id",
    coords: Sequence[str] = ("x", "y"),
    payload_cols: Sequence[str] = ("val",),
    haversine: bool = False,
    max_abs_lat: float | None = None,
    salt_partitions: int | None = None,
    salt_hot: int | None = None,
    hot_threshold: int = 50_000,
    hot_cap: int | None = None,
) -> DataFrame:
    """Return one row per unordered pair (a, b) with dist(a,b) < max_dist.

    Output columns: a_<id>, b_<id>, dist, a_<payload>, b_<payload> …

    Euclid path blocks on ALL coordinates (2-D, 3-D, … — dense-z data keeps
    full pruning).  For ``haversine=True`` coords must be ("lat", "lon") in
    degrees and ``max_dist`` is a central angle in RADIANS
    (variogram.rs:107-118); ``max_abs_lat`` optionally supplies the data's
    latitude bound (skipping the max(|lat|) aggregate), and longitude cells
    wrap at the antimeridian (see module docstring).

    ``salt_hot=S`` enables EXPLICIT hot-cell salting (north rule): cells
    whose point count exceeds ``hot_threshold`` get their join key extended
    with a salt — the stamped (left) side takes ``pmod(xxhash64(id), S)``,
    the right side is replicated across all S salts — splitting one hot
    cell's pair work across S reducers.  Each pair is still produced exactly
    once (the left row's salt selects one of the S replicas).  Cold cells
    pay nothing (salt 0, no replication).  ``hot_cap`` bounds the broadcast
    hot set at the top-``hot_cap`` cells by count (see the inline note);
    the pair output is identical under any cap — only which cells get the
    salt treatment changes.
    """
    wrap_n: int | None = None
    if haversine:
        lat_c, lon_c = coords
        if max_abs_lat is None:
            # one cheap column-pruned aggregate; never silently clamp the
            # secant factor (the round-1 lon-degeneracy bug)
            row = points.agg(F.max(F.abs(F.col(lat_c)))).first()
            max_abs_lat = float(row[0]) if row and row[0] is not None else 0.0
        cell_lat, n_lon, lon_w = haversine_grid(max_dist, max_abs_lat)
        cell_exprs = geo_cell_exprs(lat_c, lon_c, cell_lat, n_lon, lon_w)
        if n_lon > 1:
            wrap_n = n_lon
    else:
        cell_exprs = [
            F.floor(F.col(c) / F.lit(max_dist)).cast("long") for c in coords
        ]

    d = len(cell_exprs)
    # underscore prefix: must never collide with user coordinate/payload
    # names (api.py names its coords c0, c1, ...)
    cell_names = [f"_bc{k}" for k in range(d)]
    jkeys = [f"jc{k}" for k in range(d)]

    base_cols = [F.col(id_col), *[F.col(c) for c in coords], *[F.col(c) for c in payload_cols]]
    pts = points.select(
        *base_cols, *[e.alias(n) for e, n in zip(cell_exprs, cell_names)]
    )

    offsets = F.array(
        *[
            F.struct(*[F.lit(o[k]).alias(f"d{k}") for k in range(d)])
            for o in half_stencil(d)
        ]
    )

    def stamped(k: int) -> Column:
        e = F.col(cell_names[k]) + F.col(f"_off.d{k}")
        if wrap_n is not None and k == d - 1:
            e = F.pmod(e, F.lit(wrap_n))  # antimeridian wrap on the lon axis
        return e

    same_cell = None
    for k in range(d):
        t = F.col(f"_off.d{k}") == 0
        same_cell = t if same_cell is None else same_cell & t

    left = (
        pts.withColumn("_off", F.explode(offsets))
        .select(
            *[F.col(c).alias(f"a_{c}") for c in [id_col, *coords, *payload_cols]],
            *[stamped(k).alias(jkeys[k]) for k in range(d)],
            same_cell.alias("_same_cell"),
        )
    )
    right = pts.select(
        *[F.col(c).alias(f"b_{c}") for c in [id_col, *coords, *payload_cols]],
        *[F.col(cell_names[k]).alias(jkeys[k]) for k in range(d)],
    )

    join_keys = list(jkeys)
    if salt_hot:
        # hot-cell detection stays distributed: the (tiny) hot-cell table is
        # broadcast onto both sides — no driver collect, no isin literal
        # list.  kriging.salt_cogroup_keys carries the cogroup sibling of
        # this recipe — semantic fixes here must be mirrored there.
        # hot_cap bounds the broadcast: only the top-hot_cap cells by count
        # get salted — on a heavy-tailed density the above-threshold set is
        # unbounded while the cells that matter are the few biggest;
        # unsalted hot-tail cells are still split by AQE skew-join
        hot = top_hot_cells(
            pts.groupBy(*cell_names).agg(F.count(F.lit(1)).alias("_hot_n")),
            cell_names,
            hot_threshold,
            hot_cap,
        )
        hot = hot.select(
            *[F.col(cell_names[k]).alias(jkeys[k]) for k in range(d)],
            F.lit(True).alias("_hot"),
        )
        left = (
            left.join(F.broadcast(hot), join_keys, "left")
            .withColumn(
                "jsalt",
                F.when(
                    F.col("_hot"),
                    F.pmod(F.xxhash64(F.col(f"a_{id_col}")), F.lit(salt_hot)),
                )
                .otherwise(F.lit(0))
                .cast("long"),
            )
            .drop("_hot")
        )
        right = (
            right.join(F.broadcast(hot), join_keys, "left")
            .withColumn(
                "_salts",
                F.when(
                    F.col("_hot"), F.sequence(F.lit(0), F.lit(salt_hot - 1))
                ).otherwise(F.array(F.lit(0))),
            )
            .withColumn("jsalt", F.explode("_salts"))
            .withColumn("jsalt", F.col("jsalt").cast("long"))
            .drop("_salts", "_hot")
        )
        join_keys = join_keys + ["jsalt"]

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

    def pick(col: str, side: str) -> Column:
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
