"""Distributed connected components for dedup-cluster resolution.

Near-duplicate candidate pairs (minhash/simhash/ngram) form a similarity
graph; web-scale dedup keeps one document per CONNECTED COMPONENT, not per
directly-linked pair.  The reference has no graph layer — this is the
engine-layer extension the pipeline needs at 10^12 documents.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14).  Each round is a
window-min + projection over the edge list (2 shuffles), no driver-side
adjacency; converges in O(log² n) rounds on any graph (observed: a handful)
to a forest of depth-1 stars rooted at each component's minimum id —
unlike naive min-label propagation whose round count is the graph DIAMETER
(a 10^6-long url-chain would need 10^6 shuffles; this needs ~20).

Convergence is detected by an order-insensitive edge-set fingerprint
(count + bit_xor of xxhash64(a,b) + decimal sum of the same hash) — one
tiny aggregate per round, no driver collect of edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor LARGER than u to min(Γ(u) ∪ {u})."""
    bidir = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    w = Window.partitionBy("u")
    m = F.least(F.min("v").over(w), F.col("u"))
    return (
        bidir.withColumn("m", m)
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges toward the larger endpoint; connect all smaller
    neighbors and the center itself to the minimum."""
    oriented = e.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    )
    w = Window.partitionBy("u")
    m = F.min("v").over(w)  # all v < u here, so min(N ∪ {u}) = min(v)
    with_m = oriented.withColumn("m", m)
    out = with_m.select(F.col("v").alias("a"), F.col("m").alias("b")).union(
        with_m.select(F.col("u").alias("a"), F.col("m").alias("b"))
    )
    return out.where(F.col("a") != F.col("b")).distinct()


def _fingerprint(e: DataFrame) -> tuple:
    """Order-insensitive edge-set fingerprint for fixpoint detection —
    the shared (count, xor, decimal-sum) triple from
    functions/fingerprint.py (same recipe as checkpoint lineage; XOR alone
    would be blind to even-multiplicity swaps across rounds)."""
    from gstools_core_spark.functions.fingerprint import hash_fingerprint_aggs

    row = e.agg(*hash_fingerprint_aggs(F.xxhash64(F.col("a"), F.col("b")))).first()
    return (row["n"], row["h"], str(row["s"]))


def connected_components(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    the smallest node id in its connected component.  Ids may be any
    ORDERABLE type (long doc ids, url strings, …) — the contraction only
    needs min/comparison, so no cast is applied.

    Isolated nodes never appear in an edge list — union the full node set
    downstream with component = own id (see queries.q_dedup_components).
    """
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).where(
        F.col("a") != F.col("b")
    )

    # localCheckpoint TRUNCATES LINEAGE each round: with persist() alone the
    # logical plan doubles per round (each star references e twice) and
    # Catalyst re-optimizes the whole history — measured 3 s/round exploding
    # to 40 s by round 4.  Local (executor-memory) checkpointing is the
    # standard iterative-algorithm form; a fault-tolerant run would point
    # sparkContext.setCheckpointDir at the job's durable store instead.
    e = e.localCheckpoint(eager=True)
    prev = _fingerprint(e)
    for _ in range(max_rounds):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _fingerprint(e2)
        e = e2
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")

    # fixpoint = depth-1 stars: every non-root node has exactly one edge to
    # its component root; roots appear only on the b side
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
    )
    comp = e.groupBy("a").agg(F.min("b").alias("component"))
    out = nodes.join(
        comp, nodes["node"] == comp["a"], "left"
    ).select(
        F.col("node"), F.coalesce(F.col("component"), F.col("node")).alias("component")
    )
    return out
