"""Similarity search over embedding columns (array<float>).

Three paths, increasingly scale-friendly:

* ``cosine_topk_sql`` — pure-DataFrame brute force (posexplode → equi-join on
  component index → partial+final sum).  Oracle-checkable; O(Q·B·d) shuffle.
* ``cosine_topk`` — broadcast the base matrix (numpy) and run one BLAS
  matmul per Arrow batch of queries via ``mapInPandas``.  The scale path
  when the base fits in executor memory (the usual ANN-index assumption).
* ``lsh_ann`` — random-hyperplane LSH: sign-bit sketches → bucket equi-join
  candidates → exact cosine verify → top-k.  Approximate, no broadcast of
  the full base, bucket join scales with collision counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _norm_col(vec):
    return F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk_sql(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    query_id: str = "qid",
    base_id: str = "bid",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k as pure relational ops → (qid, bid, cos_sim, rank).

    Self-pairs (same id) are excluded.  Ties broken by base id.
    """
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.posexplode(F.col(vec_col)).alias("idx", "qv"),
        _norm_col(F.col(vec_col)).alias("qn"),
    ).withColumn("qv", F.col("qv").cast("double"))
    b = base.select(
        F.col(base_id).alias("bid"),
        F.posexplode(F.col(vec_col)).alias("idx", "bv"),
        _norm_col(F.col(vec_col)).alias("bn"),
    ).withColumn("bv", F.col("bv").cast("double"))
    dots = (
        q.join(b, "idx")
        .where(F.col("qid") != F.col("bid"))
        .groupBy("qid", "bid", "qn", "bn")
        .agg(F.sum(F.col("qv") * F.col("bv")).alias("dot"))
        .withColumn("cos_sim", F.col("dot") / (F.col("qn") * F.col("bn")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("bid").asc())
    return (
        dots.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "bid", "cos_sim", "rank")
    )


def cosine_topk(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    query_id: str = "qid",
    base_id: str = "bid",
    vec_col: str = "embedding",
) -> DataFrame:
    """Broadcast-base brute-force cosine top-k: one numpy matmul per Arrow
    batch of queries.  Exact; requires the base matrix to fit in memory
    (otherwise use lsh_ann)."""
    spark = queries.sparkSession
    base_pdf = base.select(F.col(base_id).alias("bid"), F.col(vec_col).alias("v")).toPandas()
    B = np.stack(base_pdf["v"].to_numpy()).astype(np.float64)
    B = B / np.linalg.norm(B, axis=1, keepdims=True)
    bids = base_pdf["bid"].to_numpy(np.int64)
    bc = spark.sparkContext.broadcast((B, bids))
    kk = k

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Bm, bid_arr = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            Q = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            sims = Q @ Bm.T  # (nq, nb)
            qids = pdf["qid"].to_numpy(np.int64)
            # exclude self-match by id
            self_mask = qids[:, None] == bid_arr[None, :]
            sims = np.where(self_mask, -np.inf, sims)
            nb = sims.shape[1]
            take = min(kk, nb)
            part = np.argpartition(-sims, take - 1, axis=1)[:, :take]
            rows = []
            for qi in range(len(qids)):
                cand = part[qi]
                order = sorted(
                    [( -sims[qi, c], bid_arr[c]) for c in cand if np.isfinite(sims[qi, c])]
                )
                for rank, (negs, bid_v) in enumerate(order[:kk], start=1):
                    rows.append((int(qids[qi]), int(bid_v), float(-negs), rank))
            yield pd.DataFrame(rows, columns=["qid", "bid", "cos_sim", "rank"])

    q = queries.select(F.col(query_id).alias("qid"), F.col(vec_col).alias("v"))
    return q.mapInPandas(gen, "qid long, bid long, cos_sim double, rank int")


def _assign_clusters(df: DataFrame, id_name: str, vec_col: str, centroids: np.ndarray, n_probe: int):
    """mapInPandas: nearest ``n_probe`` centroid ids per vector (cosine)."""
    C = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    npb = n_probe

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            sims = V @ C.T
            order = np.argsort(-sims, axis=1)[:, :npb]
            rows = {
                id_name: np.repeat(pdf[id_name].to_numpy(np.int64), npb),
                "cluster": order.reshape(-1).astype(np.int64),
                "probe_rank": np.tile(np.arange(npb, dtype=np.int64), len(pdf)),
            }
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, f"{id_name} long, cluster long, probe_rank long")


def ivf_ann(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    query_id: str = "qid",
    base_id: str = "bid",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    iters: int = 3,
) -> DataFrame:
    """IVF-style approximate cosine top-k — the classic inverted-file index
    built with plain DataFrame ops:

    1. spherical k-means coarse quantizer, fully deterministic: centroids
       initialized from the ``n_clusters`` smallest base ids, Lloyd updates
       via (assign with broadcast centroids → posexplode → groupBy(cluster,
       component) avg), centroids collected each round (n_clusters×dim —
       tiny driver state);
    2. base vectors land in exactly one cluster (inverted lists);
    3. each query probes its ``n_probe`` nearest centroids (explode) and
       reranks EXACTLY inside the probed lists: equi-join on cluster id →
       cosine → per-query top-k window.  n_probe = n_clusters ⇒ exact.
    """
    spark = queries.sparkSession
    b = base.select(F.col(base_id).alias("bid"), F.col(vec_col).alias("v")).persist()

    # deterministic init: the n_clusters smallest base ids
    init = (
        b.orderBy("bid").limit(n_clusters).toPandas()
    )
    centroids = np.stack(init["v"].to_numpy()).astype(np.float64)

    for _ in range(iters):
        assigned = _assign_clusters(b, "bid", "v", centroids, n_probe=1)
        comp = (
            assigned.join(b, "bid")
            .select("cluster", F.posexplode(F.col("v")).alias("idx", "x"))
            .groupBy("cluster", "idx")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new_c = centroids.copy()
        for r in comp:
            new_c[r["cluster"], r["idx"]] = r["m"]
        centroids = new_c

    lists = _assign_clusters(b, "bid", "v", centroids, n_probe=1).join(b, "bid")
    probes = _assign_clusters(
        queries.select(F.col(query_id).alias("qid"), F.col(vec_col).alias("q_v")).withColumnRenamed("q_v", "v"),
        "qid", "v", centroids, n_probe=n_probe,
    )
    qv = queries.select(F.col(query_id).alias("qid"), F.col(vec_col).alias("q_v"))
    dot = F.aggregate(
        F.zip_with(F.col("q_v"), F.col("v"), lambda a, bb: a.cast("double") * bb.cast("double")),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    scored = (
        probes.join(lists.select("cluster", "bid", "v"), "cluster")
        .join(qv, "qid")
        .where(F.col("qid") != F.col("bid"))
        .withColumn("cos_sim", dot / (_norm_col(F.col("q_v")) * _norm_col(F.col("v"))))
        .select("qid", "bid", "cos_sim")
        .distinct()
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("bid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "bid", "cos_sim", "rank")
    )


def hyperplane_sketch(
    df: DataFrame, vec_col: str, dim: int, n_bits: int = 16, seed: int = 19031977
) -> DataFrame:
    """Append an n_bits sign sketch w.r.t. deterministic random hyperplanes."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_bits, dim))
    sk = None
    for b in range(n_bits):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(v)) for v in planes[b]]),
                lambda x, p: x.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        sk = term if sk is None else sk.bitwiseOR(term)
    return df.withColumn("sketch", sk)


def lsh_ann(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    dim: int,
    query_id: str = "qid",
    base_id: str = "bid",
    vec_col: str = "embedding",
    n_bits: int = 16,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: candidates share a sketch bucket in ≥1 of
    ``n_tables`` hyperplane tables; exact cosine on candidates only."""
    q_sk, b_sk = queries, base
    pairs = None
    for t in range(n_tables):
        qs = hyperplane_sketch(q_sk, vec_col, dim, n_bits, seed=19031977 + t).select(
            F.col(query_id).alias("qid"), F.col("sketch")
        )
        bs = hyperplane_sketch(b_sk, vec_col, dim, n_bits, seed=19031977 + t).select(
            F.col(base_id).alias("bid"), F.col("sketch")
        )
        p = qs.join(bs, "sketch").select("qid", "bid")
        pairs = p if pairs is None else pairs.unionByName(p)
    cands = pairs.distinct().where(F.col("qid") != F.col("bid"))

    qv = queries.select(F.col(query_id).alias("qid"), F.col(vec_col).alias("q_v"))
    bv = base.select(F.col(base_id).alias("bid"), F.col(vec_col).alias("b_v"))
    dot = F.aggregate(
        F.zip_with(F.col("q_v"), F.col("b_v"), lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        cands.join(qv, "qid")
        .join(bv, "bid")
        .withColumn("cos_sim", dot / (_norm_col(F.col("q_v")) * _norm_col(F.col("b_v"))))
        .drop("q_v", "b_v")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("bid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "bid", "cos_sim", "rank")
    )
