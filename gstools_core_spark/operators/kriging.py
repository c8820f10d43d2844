"""Distributed kriging: Gram-matrix assembly + solve per neighborhood.

The reference kernel (krige.rs:24-118) receives a PRE-INVERTED system matrix
and computes field = condᵀ·Mᵀ·V, error = v_jᵀ·Mᵀ·v_j; the assembly + solve
happens upstream in GSTools (reference benches/gen_benchmark_inputs.py:35-59).
Per the north star, this engine owns BOTH steps:

* neighborhoods via the cell-ring blocking (conditioning points stamped onto
  the 3×3 ring of each target cell at cell_size = radius);
* one ``cogroup().applyInPandas`` per cell assembles the covariance Gram
  matrix with the model, inverts it once, and evaluates every target in the
  cell through the numpy kernels (kernels.calc_field_krige_and_variance) —
  i.e. the reference's matrix kernel runs verbatim on each neighborhood.

Covariance models: any functions/models.CovModel (Gaussian, Exponential,
Spherical, Matérn, Stable); the nugget enters only the Gram diagonal.
Simple (known mean), ordinary (Lagrange row), and universal (polynomial
drift) kriging are provided; anisotropy via functions.models.isotropize.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gstools_core_spark import kernels as K
from gstools_core_spark.functions.models import (  # noqa: F401 — re-exported API
    CovModel,
    Exponential,
    Gaussian,
    GaussianModel,
    Matern,
    Spherical,
    Stable,
)


def _ring_stamp(df: DataFrame, radius: float, coords: Sequence[str]) -> DataFrame:
    """Stamp each row onto the full 3^d ring of its blocking cell."""
    import itertools

    d = len(coords)
    cells = [
        F.floor(F.col(c) / F.lit(radius)).cast("long").alias(f"_c{k}")
        for k, c in enumerate(coords)
    ]
    offsets = F.array(
        *[
            F.struct(*[F.lit(o[k]).alias(f"d{k}") for k in range(d)])
            for o in itertools.product((-1, 0, 1), repeat=d)
        ]
    )
    out = df.select("*", *cells).withColumn("_off", F.explode(offsets))
    for k in range(d):
        out = out.withColumn(f"jc{k}", F.col(f"_c{k}") + F.col(f"_off.d{k}"))
    return out.drop(*[f"_c{k}" for k in range(d)], "_off")


def _solve1(A: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Square solve with minimum-norm lstsq fallback for singular systems."""
    try:
        return np.linalg.solve(A, y)
    except np.linalg.LinAlgError:
        return np.linalg.lstsq(A, y, rcond=None)[0]


def _pairwise_dist(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """(na, d) × (nb, d) → (na, nb) Euclid; 2-D keeps np.hypot (bitwise
    parity with the original 2-D implementation and its golden tests)."""
    if A.shape[1] == 2:
        return np.hypot(A[:, 0:1] - B[None, :, 0], A[:, 1:2] - B[None, :, 1])
    diff = A[:, None, :] - B[None, :, :]
    return np.sqrt(np.sum(diff * diff, axis=2))


def krige(
    targets: DataFrame,
    cond: DataFrame,
    model: GaussianModel,
    radius: float,
    target_id: str = "id",
    coords: Sequence[str] = ("x", "y"),
    cond_val: str = "val",
    method: str = "ordinary",
    mean: float = 0.0,
    max_cond: int = 512,
    drift_order: int = 1,
    knn: int | None = None,
) -> DataFrame:
    """Krige ``cond`` onto ``targets`` → (id, <coords…>, krige_mean,
    krige_var, n_cond).  Any dimension (``coords`` of length d — blocking
    cells and neighborhoods generalize to the 3^d ring), matching the
    reference kernels' any-dim contract (krige.rs takes no dimension).

    ``method`` — 'simple' (known ``mean``), 'ordinary' (constant unknown
    mean, one Lagrange row), or 'universal' (unknown polynomial drift: the
    Lagrange block generalizes to monomial drift functions up to
    ``drift_order`` — order 1 = the coords, order 2 adds all quadratic
    monomials; ordinary ≡ universal with order 0).  Universal kriging
    reproduces any target function inside the drift space exactly
    (pytest-pinned).  Targets whose 3^d cell ring holds no conditioning
    points fall back to the prior (mean, sill).  Neighborhoods are capped
    at ``max_cond`` points (nearest to the cell center) to bound the
    per-cell solve.

    ``knn`` — per-target MOVING-WINDOW kriging: each target is solved with
    its own ``knn`` nearest conditioning points within ``radius`` (rank
    ties broken by coordinates ascending — deterministic under shuffle
    reordering), one batched ``np.linalg.solve`` per (cell, neighborhood-
    size) group instead of one shared per-cell neighborhood.  ``knn=None``
    keeps the per-cell shared neighborhood (all ring points, ``max_cond``-
    capped) — cheaper, but an approximation the moving window removes.
    Ranking distances use explicit mul/add/sqrt (not np.hypot) so rank
    order is bitwise-reproducible against the SQL oracle.
    """
    import itertools

    d = len(coords)
    jkeys = [f"jc{k}" for k in range(d)]
    t = targets.select(
        F.col(target_id).alias("tid"),
        *[F.col(c).alias(f"t{k}") for k, c in enumerate(coords)],
        *[
            F.floor(F.col(c) / F.lit(radius)).cast("long").alias(jkeys[k])
            for k, c in enumerate(coords)
        ],
    )
    c = _ring_stamp(
        cond.select(
            *[F.col(cc).alias(f"c{k}") for k, cc in enumerate(coords)],
            F.col(cond_val).alias("cval"),
        ),
        radius,
        tuple(f"c{k}" for k in range(d)),
    )

    nugget = model.nugget
    sill = model.sill
    mcov = model.cov  # any functions.models.CovModel (tiny, picklable)
    simple = method == "simple"
    mu = float(mean)
    # monomial drift basis: ordinary kriging = constant drift only
    n_drift_order = 0 if method == "ordinary" else int(drift_order)

    def drift_basis(P: np.ndarray) -> np.ndarray:  # P: (n, d)
        rows = [np.ones(P.shape[0])]
        if n_drift_order >= 1:
            rows += [P[:, k] for k in range(d)]
        if n_drift_order >= 2:
            rows += [
                P[:, i] * P[:, j]
                for i in range(d)
                for j in range(i, d)
            ]
        return np.stack(rows)  # (nd, n)

    t_cols = [f"t{k}" for k in range(d)]
    c_cols = [f"c{k}" for k in range(d)]
    out_schema = (
        "tid long, "
        + ", ".join(f"{tc} double" for tc in t_cols)
        + ", krige_mean double, krige_var double, n_cond long"
    )

    def solve_cell(key, t_pdf: pd.DataFrame, c_pdf: pd.DataFrame) -> pd.DataFrame:
        if t_pdf.empty:
            return pd.DataFrame(
                columns=["tid", *t_cols, "krige_mean", "krige_var", "n_cond"]
            )
        T = t_pdf[t_cols].to_numpy(np.float64)  # (nt, d)
        base = {"tid": t_pdf["tid"]}
        for k, tc in enumerate(t_cols):
            base[tc] = T[:, k]
        if c_pdf.empty:
            return pd.DataFrame(
                {
                    **base,
                    "krige_mean": np.full(len(T), mu),
                    "krige_var": np.full(len(T), sill),
                    "n_cond": np.zeros(len(T), dtype=np.int64),
                }
            )
        C_pts = c_pdf[c_cols].to_numpy(np.float64)  # (nc, d)
        cv = c_pdf["cval"].to_numpy(np.float64)
        if len(C_pts) > max_cond:
            # keep the max_cond conditioning points nearest the cell center
            center = (np.asarray(key, dtype=np.float64) + 0.5) * radius
            d2 = np.sum((C_pts - center) ** 2, axis=1)
            keep = np.argpartition(d2, max_cond)[:max_cond]
            C_pts, cv = C_pts[keep], cv[keep]
        nc = len(C_pts)

        dxx = _pairwise_dist(C_pts, C_pts)
        dxt = _pairwise_dist(C_pts, T)
        C = mcov(dxx) + nugget * np.eye(nc)  # nugget on the diagonal only
        V = mcov(dxt)  # (nc, nt)

        if simple:
            # pre-invert once per neighborhood, then run the reference kernel
            try:
                M = np.linalg.inv(C)
            except np.linalg.LinAlgError:
                M = np.linalg.pinv(C)  # coincident samples with zero nugget
            field, err = K.calc_field_krige_and_variance(M, V, cv - mu)
            est = field + mu
            kvar = np.maximum(sill - err, 0.0)
        else:
            # ordinary/universal kriging: drift-extended (Lagrange) solve.
            # Ordinary = constant drift {1}; universal adds monomials —
            # the unbiasedness constraints F·w = f(target) per drift fn.
            Fd = drift_basis(C_pts)  # (nd, nc)
            Ft = drift_basis(T)  # (nd, nt)
            nd = Fd.shape[0]
            A = np.zeros((nc + nd, nc + nd))
            A[:nc, :nc] = C
            A[nc:, :nc] = Fd
            A[:nc, nc:] = Fd.T
            B = np.vstack([V, Ft])
            try:
                W = np.linalg.solve(A, B)  # weights + lagrange multipliers
            except np.linalg.LinAlgError:
                W = np.linalg.lstsq(A, B, rcond=None)[0]
            est = W[:nc].T @ cv
            kvar = np.maximum(
                sill
                - np.einsum("ij,ij->j", W[:nc], V)
                - np.einsum("ij,ij->j", W[nc:], Ft),
                0.0,
            )
        return pd.DataFrame(
            {
                **base,
                "krige_mean": est,
                "krige_var": kvar,
                "n_cond": np.full(len(T), nc, dtype=np.int64),
            }
        )

    def drift_basis_b(P: np.ndarray) -> np.ndarray:  # (m, n, d) → (m, nd, n)
        m, n, _ = P.shape
        rows = [np.ones((m, n))]
        if n_drift_order >= 1:
            rows += [P[:, :, kk] for kk in range(d)]
        if n_drift_order >= 2:
            rows += [P[:, :, i] * P[:, :, j] for i in range(d) for j in range(i, d)]
        return np.stack(rows, axis=1)

    def solve_cell_knn(key, t_pdf: pd.DataFrame, c_pdf: pd.DataFrame) -> pd.DataFrame:
        if t_pdf.empty:
            return pd.DataFrame(
                columns=["tid", *t_cols, "krige_mean", "krige_var", "n_cond"]
            )
        T = t_pdf[t_cols].to_numpy(np.float64)
        nt = len(T)
        base = {"tid": t_pdf["tid"]}
        for kk, tc in enumerate(t_cols):
            base[tc] = T[:, kk]
        est = np.full(nt, mu)
        kvar = np.full(nt, sill)
        ncond = np.zeros(nt, dtype=np.int64)
        if not c_pdf.empty:
            C_pts = c_pdf[c_cols].to_numpy(np.float64)
            cv = c_pdf["cval"].to_numpy(np.float64)
            # canonical cond order (coords ascending): stable argsort then
            # breaks distance ties by coordinates, not by shuffle arrival
            order = np.lexsort(tuple(C_pts[:, kk] for kk in range(d - 1, -1, -1)))
            C_pts, cv = C_pts[order], cv[order]
            # explicit mul/add/sqrt — bitwise == the SQL oracle's distance
            diff = C_pts[:, None, :] - T[None, :, :]
            dxt = np.sqrt(np.sum(diff * diff, axis=2))  # (nc, nt)
            masked = np.where(dxt <= radius, dxt, np.inf)
            sel = np.argsort(masked, axis=0, kind="stable")[:knn]  # (≤knn, nt)
            counts = np.minimum((masked < np.inf).sum(axis=0), knn)
            Cxx = mcov(_pairwise_dist(C_pts, C_pts))  # shared, nugget added per batch
            Vf = mcov(dxt)  # (nc, nt)
            for q in np.unique(counts):
                if q == 0:
                    continue
                S = np.nonzero(counts == q)[0]
                idx = sel[:q, S].T  # (m, q) neighbor indices per target
                C_b = Cxx[idx[:, :, None], idx[:, None, :]] + nugget * np.eye(q)
                V_b = Vf[idx, S[:, None]]  # (m, q)
                v_b = cv[idx]  # (m, q)
                if simple:
                    try:
                        W = np.linalg.solve(C_b, V_b[:, :, None])[:, :, 0]
                    except np.linalg.LinAlgError:
                        W = np.stack([_solve1(A, y) for A, y in zip(C_b, V_b)])
                    est[S] = np.einsum("mq,mq->m", W, v_b - mu) + mu
                    kvar[S] = np.maximum(sill - np.einsum("mq,mq->m", W, V_b), 0.0)
                else:
                    Fd_b = drift_basis_b(C_pts[idx])  # (m, nd, q)
                    Ft_b = drift_basis(T[S]).T  # (m, nd)
                    ndr = Fd_b.shape[1]
                    m = len(S)
                    A_b = np.zeros((m, q + ndr, q + ndr))
                    A_b[:, :q, :q] = C_b
                    A_b[:, q:, :q] = Fd_b
                    A_b[:, :q, q:] = np.transpose(Fd_b, (0, 2, 1))
                    B_b = np.concatenate([V_b, Ft_b], axis=1)[:, :, None]
                    try:
                        W = np.linalg.solve(A_b, B_b)[:, :, 0]
                    except np.linalg.LinAlgError:
                        # only the singular items take the lstsq path (e.g.
                        # universal with fewer neighbors than drift fns)
                        W = np.stack([_solve1(A, y[:, 0]) for A, y in zip(A_b, B_b)])
                    est[S] = np.einsum("mq,mq->m", W[:, :q], v_b)
                    kvar[S] = np.maximum(
                        sill
                        - np.einsum("mq,mq->m", W[:, :q], V_b)
                        - np.einsum("mn,mn->m", W[:, q:], Ft_b),
                        0.0,
                    )
                ncond[S] = q
        return pd.DataFrame(
            {**base, "krige_mean": est, "krige_var": kvar, "n_cond": ncond}
        )

    out = (
        t.groupBy(*jkeys)
        .cogroup(c.groupBy(*jkeys))
        .applyInPandas(solve_cell_knn if knn is not None else solve_cell, out_schema)
    )
    return out.select(
        F.col("tid").alias(target_id),
        *[F.col(f"t{k}").alias(c) for k, c in enumerate(coords)],
        "krige_mean",
        "krige_var",
        "n_cond",
    )
