"""Spark-free control for the kriging scaling shortfall: the HEAVY krige
kernel is ~400 bordered 1025×1025 solves (dgesv, ~500 RHS).  This probe
runs the IDENTICAL numpy solve in P independent single-threaded processes
(BLAS pinned to 1 thread, like the engine's workers) and reports aggregate
solves/sec at each P — no JVM, no shuffle, no Python-worker pool, no
scheduler.  If aggregate throughput does not scale ~P here, the engine's
sub-linear 2→8 kriging rows are a host ceiling (shared memory
subsystem / neighbor steal), not a plan or framework defect.

Run: python tools/blas_scaling_probe.py          (P = 1, 2, 4, 8)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

N = 1024  # bordered system size (HEAVY krige max_cond)
NRHS = 500  # targets per cell at the HEAVY sizing
SOLVES_PER_PROC = 6


def _worker(q, mode: str):
    # BLAS single-thread pin BEFORE numpy import — same rule as session.py
    for var in (
        "OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS",
    ):
        os.environ[var] = "1"
    import numpy as np

    rng = np.random.default_rng(7)
    if mode == "solve":
        A = rng.normal(size=(N + 1, N + 1))
        A = A @ A.T + (N + 1) * np.eye(N + 1)  # SPD-ish: no pivot pathologies
        B = rng.normal(size=(N + 1, NRHS))
        t0 = time.time()
        for _ in range(SOLVES_PER_PROC):
            np.linalg.solve(A, B)
        q.put(time.time() - t0)
        return
    # mode == 'cell': the FULL per-cell kriging kernel shape — pairwise
    # distances (hypot), gaussian covariance (exp), bordered assembly,
    # dgesv, weighted reductions — i.e. what each Spark worker actually
    # runs per blocking cell.  The elementwise passes stream ~50 MB of
    # matrix traffic per cell, so this mode is the bandwidth-sensitivity
    # probe; 'solve' isolates the cache-blocked DGEMM part.
    C_pts = rng.uniform(-1, 1, size=(N, 2))
    T = rng.uniform(-1, 1, size=(NRHS, 2))
    cv = rng.normal(size=N)
    t0 = time.time()
    for _ in range(SOLVES_PER_PROC):
        dxx = np.hypot(
            C_pts[:, 0:1] - C_pts[None, :, 0], C_pts[:, 1:2] - C_pts[None, :, 1]
        )
        dxt = np.hypot(
            C_pts[:, 0:1] - T[None, :, 0], C_pts[:, 1:2] - T[None, :, 1]
        )
        C = np.exp(-(dxx / 0.3) ** 2) + 0.01 * np.eye(N)
        V = np.exp(-(dxt / 0.3) ** 2)
        A = np.zeros((N + 1, N + 1))
        A[:N, :N] = C
        A[N, :N] = 1.0
        A[:N, N] = 1.0
        B = np.vstack([V, np.ones((1, NRHS))])
        W = np.linalg.solve(A, B)
        (W[:N] * cv[:, None]).sum(axis=0)
        np.einsum("ij,ij->j", W[:N], V)
    q.put(time.time() - t0)


def run(p: int, mode: str) -> tuple[float, list[float]]:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(q, mode)) for _ in range(p)]
    t0 = time.time()
    for pr in procs:
        pr.start()
    for pr in procs:
        pr.join()
    wall = time.time() - t0
    per = [q.get() for _ in range(p)]
    return wall, per


def main():
    result = {"n": N, "nrhs": NRHS}
    for mode in ("solve", "cell"):
        out = {}
        for p in (1, 2, 4, 8):
            wall, per = run(p, mode)
            # throughput from the TIMED loops only — the outer wall also
            # counts process spawn + numpy import (~1.3 s), which would
            # mask any concurrency effect at these sizes
            thr = sum(SOLVES_PER_PROC / t for t in per)
            out[p] = {
                "wall_s": round(wall, 2),
                "per_s": round(thr, 3),
                "per_proc_s": [round(x, 3) for x in per],
            }
            print(
                f"{mode} P={p}: aggregate {thr:.2f}/s "
                f"(per-proc loop {min(per):.2f}-{max(per):.2f}s for "
                f"{SOLVES_PER_PROC} iterations)",
                flush=True,
            )
        result[mode] = {
            "levels": out,
            "eff_2_to_8": round((out[8]["per_s"] / out[2]["per_s"]) / 4.0, 3),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
