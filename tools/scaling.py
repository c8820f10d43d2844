"""Scaling-efficiency evidence: run the headline job at local[8] and
local[32] (the sandbox substitution for N vs 4N executors per BASELINE.md)
and write BENCH.md with throughputs + efficiency.

Measurement protocol (this host is a shared VM with bursty neighbors and
within-JVM degradation across successive queries):
* one query per FRESH JVM (subprocess) — no cross-query heap pollution;
* best of ``reps`` runs per (query, parallelism) — rides out neighbor bursts;
* HEAVY workload sizes so compute dominates the ~8 s fixed overhead
  (codegen compile, scheduling, scan) that strong scaling cannot touch.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
QUERIES = ("variogram", "krige")
REPS = 2


def run_bench_query(cpus: int, sf_dir: str, query: str) -> float:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_QUERIES=query,
        SPARK_GRAFT_BENCH_HEAVY="1",
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)["queries"][query]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n, four_n = 8, 32
    import duckdb

    n_rows = duckdb.sql(
        f"select count(*) from read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]

    results: dict[int, dict[str, float]] = {n: {}, four_n: {}}
    for q in QUERIES:
        for cpus in (n, four_n):
            best = min(run_bench_query(cpus, sf_dir, q) for _ in range(REPS))
            results[cpus][q] = best
            print(f"{q} @ local[{cpus}]: {best:.2f}s", flush=True)

    t_n = sum(results[n].values())
    t_4n = sum(results[four_n].values())
    thr_n = n_rows * len(QUERIES) / t_n
    thr_4n = n_rows * len(QUERIES) / t_4n
    eff = (thr_4n / thr_n) / (four_n / n)

    lines = [
        "# BENCH — scaling evidence (sandbox substitution for N vs 4N executors)",
        "",
        f"Same job, same input ({sf_dir}, {n_rows} rows), two parallelism levels.",
        "Protocol: one query per fresh JVM, best of "
        f"{REPS} runs (shared-VM noise), HEAVY workload sizes "
        "(variogram rmax=2.5 → ~700M candidate pairs; ordinary kriging, 50% "
        "conditioning, max_cond=512) so compute dominates fixed overhead.",
        "",
        "| parallelism | variogram s | krige s | total s | pages/sec |",
        "|---|---|---|---|---|",
        f"| local[{n}] (N) | {results[n]['variogram']:.2f} | {results[n]['krige']:.2f} | {t_n:.2f} | {thr_n:.0f} |",
        f"| local[{four_n}] (4N) | {results[four_n]['variogram']:.2f} | {results[four_n]['krige']:.2f} | {t_4n:.2f} | {thr_4n:.0f} |",
        "",
        f"**Scaling efficiency (N→4N): {eff:.3f}**  (target ≥ 0.8 per BASELINE.json)",
        "",
        "Caveats: local mode shares one JVM heap, one OS page cache and one",
        "Python-worker pool across 'executors'; the per-query fixed cost",
        "(codegen compile ~2s, scheduling, scan setup) is identical at both",
        "levels and bounds strong scaling from above at this input size —",
        "on a real 4N-executor cluster the same plan shapes (ring equi-join,",
        "map-side partial agg, per-cell cogroup) shard by cell keys with no",
        "shared-driver bottleneck.",
    ]
    (REPO / "BENCH.md").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
