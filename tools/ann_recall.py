"""Recall@k vs probe-count for the approximate ANN paths at bench scale.

The IVF/LSH operators carry recall pytests at 10k vectors (a quality
GATE); this script records recall@10 at the 200k-vector bench size as an
ARTIFACT — a table in BENCH.md — so the approx-path quality at scale is a
committed number, not just a threshold.

Protocol: 200k synthesized 64-d vectors with PLANTED cluster structure
(1,000 hash-derived centers + 0.15σ noise — the same data model as the
recall pytest; real embedding corpora are clustered, and on structureless
uniform vectors coarse quantization is provably near-useless: measured
IVF recall@10 0.51 even at n_probe=16 on uniform 20k), 500 queries (every
400th id), exact ground truth from the broadcast-matmul brute force.  Every method is asked for k+1 neighbors;
self-pairs are dropped and the per-query list re-truncated to k at the
driver (500×11 rows) so methods that include/exclude self-matches compare
on identical footing.  recall@k = |approx∩exact| / |exact| summed over
queries.  Wall times are single-JVM one-shot — indicative only (see
BENCH.md's host-noise protocol); recall values are deterministic.

Run:  python tools/ann_recall.py            (~3 min, updates BENCH.md)
      SPARK_GRAFT_ANN_N=20000 python tools/ann_recall.py  (quick)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN = "<!-- ann-recall:begin -->"
END = "<!-- ann-recall:end -->"


def _topk_sets(df, k: int) -> dict[int, set[int]]:
    """(qid, bid, cos_sim) rows → per-query top-k bid set, self dropped,
    ties broken (cos_sim desc, bid asc) — the engine-wide rank rule."""
    pdf = df.select("qid", "bid", "cos_sim").toPandas()
    pdf = pdf[pdf["qid"] != pdf["bid"]]
    pdf = pdf.sort_values(["qid", "cos_sim", "bid"], ascending=[True, False, True])
    out: dict[int, set[int]] = {}
    for qid, grp in pdf.groupby("qid", sort=False):
        out[int(qid)] = set(grp["bid"].head(k).astype(int))
    return out


def _recall(approx: dict[int, set[int]], exact: dict[int, set[int]]) -> float:
    hit = sum(len(approx.get(q, set()) & s) for q, s in exact.items())
    total = sum(len(s) for s in exact.values())
    return hit / total if total else float("nan")


def _clustered_embeddings(spark, n: int, dim: int, n_centers: int):
    """Planted-cluster vectors, fully distributed: center j's coordinates
    and each point's noise are hash-derived uniforms, so every task
    synthesizes its own id range deterministically."""
    from pyspark.sql import functions as F

    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    cid = F.pmod(F.xxhash64(F.col("id"), F.lit(0)), F.lit(n_centers))
    u = lambda *cols: (  # noqa: E731 — hash-uniform in [-1, 1)
        F.pmod(F.xxhash64(*cols), F.lit(100_000)) / 50_000.0 - 1.0
    )
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda kk: (u(cid, kk) + 0.15 * u(F.col("id"), kk, F.lit(1))).cast(
            "float"
        ),
    )
    return df.select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def main() -> dict:
    from gstools_core_spark.operators.similarity import (
        cosine_topk,
        ivf_ann,
        lsh_ann,
    )
    from gstools_core_spark.session import get_session

    n = int(os.environ.get("SPARK_GRAFT_ANN_N", "200000"))
    k = 10
    dim = 64
    spark = get_session("ann-recall", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                        shuffle_partitions=64, memory_gb=48)
    emb = _clustered_embeddings(spark, n, dim, n_centers=max(10, n // 200)) \
        .localCheckpoint(eager=True)
    q = emb.where(emb.vec_id % (n // 500) == 0)

    t0 = time.time()
    exact = _topk_sets(
        cosine_topk(q, emb, k + 1, query_id="vec_id", base_id="vec_id"), k
    )
    t_exact = time.time() - t0
    print(f"exact ground truth: {t_exact:.1f}s", file=sys.stderr, flush=True)

    rows = []
    for n_probe in (1, 2, 4, 8, 16):
        t0 = time.time()
        got = _topk_sets(
            ivf_ann(q, emb, k + 1, query_id="vec_id", base_id="vec_id",
                    vec_col="embedding", n_probe=n_probe),
            k,
        )
        rows.append((f"IVF n_probe={n_probe}", _recall(got, exact), time.time() - t0))
        print(f"{rows[-1]}", file=sys.stderr, flush=True)
    for n_tables in (2, 4, 8):
        t0 = time.time()
        got = _topk_sets(
            lsh_ann(q, emb, k + 1, dim=dim, query_id="vec_id", base_id="vec_id",
                    vec_col="embedding", n_bits=16, n_tables=n_tables,
                    impl="arrow"),
            k,
        )
        rows.append((f"LSH 16-bit n_tables={n_tables}", _recall(got, exact), time.time() - t0))
        print(f"{rows[-1]}", file=sys.stderr, flush=True)
    spark.stop()

    lines = [
        BEGIN,
        "",
        f"### ANN recall@{k} at bench scale ({n:,} × {dim}-d planted-cluster "
        f"vectors, {n // 200} centers, 500 queries; `tools/ann_recall.py`)",
        "",
        f"Ground truth: broadcast-matmul exact top-{k} "
        f"({t_exact:.1f}s one-shot).  Recall values are deterministic; "
        "times are single-JVM one-shot (indicative).  LSH rows use the "
        "Arrow matmul sketch path (`impl='arrow'`); on STRUCTURELESS "
        "uniform vectors coarse quantization degrades as theory predicts "
        "(measured at 20k uniform: IVF n_probe=16 recall 0.51, LSH ~0) — "
        "clustered data is the realistic embedding-corpus model and the "
        "recall pytest's.  When IVF reads 1.0 at every probe count, the "
        "noise scale keeps each query's true top-k inside its own planted "
        "cluster and Lloyd cells never split those clusters — on such "
        "corpora n_probe=1 is the production setting, and the uniform "
        "measurement above is the opposite bracket.",
        "",
        "| method | recall@10 | wall (s) |",
        "|---|---|---|",
    ]
    for name, rec, dt in rows:
        lines.append(f"| {name} | {rec:.3f} | {dt:.1f} |")
    lines += ["", END]
    block = "\n".join(lines)

    if n >= 200_000:
        bench_md = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md"
        )
        old = open(bench_md).read()
        # subn, not "BEGIN in text": a surviving BEGIN with a damaged END
        # matches nothing and would silently drop the run — append instead
        text, n_sub = re.subn(
            re.escape(BEGIN) + r".*?" + re.escape(END), block, old, flags=re.S
        )
        if not n_sub:
            text = old.rstrip() + "\n\n" + block + "\n"
        with open(bench_md, "w") as f:
            f.write(text)
    else:
        # quick SPARK_GRAFT_ANN_N runs must NOT silently replace the
        # committed 200k-vector table (the BENCH_QUERIES.json clobber
        # lesson); print the block instead
        print(block, file=sys.stderr)

    result = {"n": n, "k": k, "rows": [(r[0], round(r[1], 4)) for r in rows]}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
