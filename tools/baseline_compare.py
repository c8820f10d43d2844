"""Single-node baseline comparison → BASELINE_COMPARE.md.

The reference crate cannot be compiled here (no crates.io access for its
ndarray/rayon deps), so the single-node native baseline is this repo's
vectorized numpy kernels (kernels.py — BLAS/SIMD-backed, the same role the
Rust plays for GSTools, and golden-vector-identical to it).  Alongside the
timings, the DESIGN comparison that actually matters at scale:

* reference variogram: each bin rescans ALL O(n²) pairs; the parallel axis
  is bins (variogram.rs:505-509) → work Θ(b·n²), parallelism capped at b.
* this engine: cell-blocked ring join → candidate work Θ(n²·(3r/L)²),
  one pass over candidates for all bins, parallelism unbounded (cells).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from gstools_core_spark import kernels as K  # noqa: E402


def lcg_points(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.int64)
    x = ((k * 48271 + 11) % 2000) / 100.0 - 10.0
    y = ((k * 69621 + 7) % 2000) / 100.0 - 10.0
    return np.vstack([x, y])


def lcg_vals(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.int64)
    return (((k * 31 + 7) % 1000) / 100.0)[None, :]


def time_numpy_variogram(n: int, edges) -> float:
    """Single-node all-pairs variogram, chunked over the i axis so buffers
    stay cache/RAM friendly (this microVM faults huge fresh allocations
    at host mercy — O(n²) materialization is unusable above ~5k points)."""
    pos, f = lcg_points(n), lcg_vals(n)
    edges = np.asarray(edges, dtype=np.float64)
    nb = len(edges) - 1
    t0 = time.time()
    gamma = np.zeros(nb)
    counts = np.zeros(nb, dtype=np.int64)
    chunk = 256
    for s in range(0, n - 1, chunk):
        e = min(s + chunk, n - 1)
        # pairs (i in [s,e), j > i): build a (e-s, n) block, mask j<=i
        dx = pos[0, s:e, None] - pos[0, None, :]
        dy = pos[1, s:e, None] - pos[1, None, :]
        dist = np.sqrt(dx * dx + dy * dy)
        jj = np.arange(n)[None, :]
        ii = np.arange(s, e)[:, None]
        valid = (jj > ii) & (dist >= edges[0]) & (dist < edges[-1])
        d = dist[valid]
        fd = (f[0, s:e, None] - f[0, None, :])[valid]
        bi = np.searchsorted(edges, d, side="right") - 1
        gamma += np.bincount(bi, weights=fd * fd, minlength=nb)[:nb]
        counts += np.bincount(bi, minlength=nb)[:nb]
    _ = K.normalize(gamma, counts)
    return time.time() - t0


def time_numpy_summate(n: int, m: int) -> float:
    pos = lcg_points(n)
    rng = np.random.default_rng(1)
    cov, z1, z2 = rng.normal(size=(2, m)), rng.normal(size=m), rng.normal(size=m)
    t0 = time.time()
    K.summate(cov, z1, z2, pos)
    return time.time() - t0


def time_numpy_krige(c: int, t: int) -> float:
    rng = np.random.default_rng(2)
    mat = np.eye(c) + 0.01 * rng.normal(size=(c, c))
    vecs = rng.normal(size=(c, t))
    cond = rng.normal(size=c)
    t0 = time.time()
    K.calc_field_krige_and_variance(mat, vecs, cond)
    return time.time() - t0


def spark_bench(queries: str) -> dict:
    import os

    env = dict(os.environ, SPARK_GRAFT_BENCH_QUERIES=queries)
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")], env=env,
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)["queries"]


def main():
    rows = []

    # variogram: native reference shape + engine bench shape
    t_np_2k = time_numpy_variogram(2000, np.linspace(0, 20, 30))
    t_np_20k = time_numpy_variogram(20000, [0.0, 0.1, 0.2, 0.3, 0.4, 0.5])
    t_np_sum = time_numpy_summate(100_000, 1000)
    t_np_krige = time_numpy_krige(500, 10_000)

    sp = spark_bench("variogram,krige,summate")

    rows.append(("variogram 2k pts × 29 bins (reference bench shape)", f"{t_np_2k:.2f}", "—", "kernel-only; below Spark's fixed overhead — single-node wins at toy sizes"))
    rows.append(("variogram 20k pts × 5 bins", f"{t_np_20k:.2f}", "—", "all-pairs single-node: O(n²) pair scan"))
    rows.append(("variogram 100k pts × 5 bins (sf0.1)", f"≈{t_np_20k * 25:.0f} (O(n²) extrapolation)", f"{sp['variogram']:.2f}", "engine: blocked join touches only in-radius candidates"))
    rows.append(("ordinary kriging 100k targets, 10k cond (sf0.1, assembly+solve)", "n/a in reference (kernel expects pre-inverted global matrix)", f"{sp['krige']:.2f}", "engine owns neighborhood assembly + solve per cell"))
    rows.append(("krige kernel 500×10k (reference bench shape)", f"{t_np_krige:.2f}", "—", "pure matmul; reference-equivalent kernel reused inside each cell"))
    rows.append(("summate 100k pos × 1000 modes", f"{t_np_sum:.2f}", f"{sp['summate']:.2f}", "embarrassingly parallel; Spark pays Arrow transfer, wins as n grows / cluster"))

    md = [
        "# BASELINE_COMPARE — single-node reference proxy vs the engine",
        "",
        "The Rust reference cannot be compiled in this sandbox (its",
        "ndarray/rayon deps need crates.io, unreachable), so the single-node",
        "baseline is this repo's **numpy kernels** — vectorized, BLAS-backed,",
        "golden-vector-identical to the Rust (tests/test_kernels_golden.py),",
        "playing the same hot-kernel role the Rust crate plays for GSTools.",
        "",
        "| workload | single-node numpy s | Spark local[32] s | note |",
        "|---|---|---|---|",
    ]
    for r in rows:
        md.append("| " + " | ".join(r) + " |")
    md += [
        "",
        "## Design comparison (what matters at 100 TB)",
        "",
        "| | reference (Rust) | this engine (Spark) |",
        "|---|---|---|",
        "| pair enumeration | every bin rescans all O(n²) pairs (variogram.rs:505-531) | cell-blocked ring equi-join: only candidates within max lag |",
        "| parallel axis | bins → parallelism ≤ #bins | cells/pairs → unbounded |",
        "| memory | dense in-RAM arrays, single address space | shuffle + spill, 10^12 rows feasible |",
        "| kriging | kernel only — global pre-inverted matrix supplied by caller (O(n³) upstream) | per-neighborhood Gram assembly + solve, distributed by cell |",
        "| crossover | fastest below ~10⁴ points | faster from ~10⁵ points on one box; only option beyond RAM |",
        "",
        f"Raw numbers: numpy 1-core: variogram(2k,29bins)={t_np_2k:.2f}s,",
        f"variogram(20k,5bins)={t_np_20k:.2f}s, summate(100k×1k)={t_np_sum:.2f}s,",
        f"krige_kernel(500×10k)={t_np_krige:.2f}s; Spark(local[32], sf0.1):",
        f"variogram={sp['variogram']:.2f}s, krige={sp['krige']:.2f}s, summate={sp['summate']:.2f}s.",
    ]
    (REPO / "BASELINE_COMPARE.md").write_text("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
