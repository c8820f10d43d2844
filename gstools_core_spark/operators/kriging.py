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
    cx = F.floor(F.col(coords[0]) / F.lit(radius)).cast("long")
    cy = F.floor(F.col(coords[1]) / F.lit(radius)).cast("long")
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    return (
        df.withColumn("_cx", cx)
        .withColumn("_cy", cy)
        .withColumn("_off", F.explode(offsets))
        .withColumn("jcx", F.col("_cx") + F.col("_off.dx"))
        .withColumn("jcy", F.col("_cy") + F.col("_off.dy"))
        .drop("_cx", "_cy", "_off")
    )


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
) -> DataFrame:
    """Krige ``cond`` onto ``targets`` → (id, x, y, krige_mean, krige_var, n_cond).

    ``method`` — 'simple' (known ``mean``), 'ordinary' (constant unknown
    mean, one Lagrange row), or 'universal' (unknown polynomial drift: the
    Lagrange block generalizes to monomial drift functions up to
    ``drift_order`` — order 1 = {1, x, y}, order 2 adds {x², xy, y²};
    ordinary ≡ universal with order 0).  Universal kriging reproduces any
    target function inside the drift space exactly (pytest-pinned).
    Targets whose 3×3 cell ring holds no conditioning points fall back to the
    prior (mean, sill).  Neighborhoods are capped at ``max_cond`` points
    (nearest to the cell center) to bound the per-cell solve.
    """
    xc, yc = coords
    t = targets.select(
        F.col(target_id).alias("tid"),
        F.col(xc).alias("tx"),
        F.col(yc).alias("ty"),
        F.floor(F.col(xc) / F.lit(radius)).cast("long").alias("jcx"),
        F.floor(F.col(yc) / F.lit(radius)).cast("long").alias("jcy"),
    )
    c = _ring_stamp(
        cond.select(
            F.col(xc).alias("cx_pt"),
            F.col(yc).alias("cy_pt"),
            F.col(cond_val).alias("cval"),
        ),
        radius,
        ("cx_pt", "cy_pt"),
    )

    nugget = model.nugget
    sill = model.sill
    mcov = model.cov  # any functions.models.CovModel (tiny, picklable)
    simple = method == "simple"
    mu = float(mean)
    # monomial drift basis: ordinary kriging = constant drift only
    n_drift_order = 0 if method == "ordinary" else int(drift_order)

    def drift_basis(px: np.ndarray, py: np.ndarray) -> np.ndarray:
        rows = [np.ones_like(px)]
        if n_drift_order >= 1:
            rows += [px, py]
        if n_drift_order >= 2:
            rows += [px * px, px * py, py * py]
        return np.stack(rows)  # (nd, n)

    def solve_cell(key, t_pdf: pd.DataFrame, c_pdf: pd.DataFrame) -> pd.DataFrame:
        if t_pdf.empty:
            return pd.DataFrame(
                columns=["tid", "tx", "ty", "krige_mean", "krige_var", "n_cond"]
            )
        tx = t_pdf["tx"].to_numpy(np.float64)
        ty = t_pdf["ty"].to_numpy(np.float64)
        if c_pdf.empty:
            return pd.DataFrame(
                {
                    "tid": t_pdf["tid"],
                    "tx": tx,
                    "ty": ty,
                    "krige_mean": np.full(len(tx), mu),
                    "krige_var": np.full(len(tx), sill),
                    "n_cond": np.zeros(len(tx), dtype=np.int64),
                }
            )
        cx = c_pdf["cx_pt"].to_numpy(np.float64)
        cy = c_pdf["cy_pt"].to_numpy(np.float64)
        cv = c_pdf["cval"].to_numpy(np.float64)
        if len(cx) > max_cond:
            # keep the max_cond conditioning points nearest the cell center
            ccx = (key[0] + 0.5) * radius
            ccy = (key[1] + 0.5) * radius
            d2 = (cx - ccx) ** 2 + (cy - ccy) ** 2
            keep = np.argpartition(d2, max_cond)[:max_cond]
            cx, cy, cv = cx[keep], cy[keep], cv[keep]
        nc = len(cx)

        dxx = np.hypot(cx[:, None] - cx[None, :], cy[:, None] - cy[None, :])
        dxt = np.hypot(cx[:, None] - tx[None, :], cy[:, None] - ty[None, :])
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
            Fd = drift_basis(cx, cy)  # (nd, nc)
            Ft = drift_basis(tx, ty)  # (nd, nt)
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
                "tid": t_pdf["tid"],
                "tx": tx,
                "ty": ty,
                "krige_mean": est,
                "krige_var": kvar,
                "n_cond": np.full(len(tx), nc, dtype=np.int64),
            }
        )

    out = (
        t.groupBy("jcx", "jcy")
        .cogroup(c.groupBy("jcx", "jcy"))
        .applyInPandas(
            solve_cell,
            "tid long, tx double, ty double, krige_mean double, krige_var double, n_cond long",
        )
    )
    return out.select(
        F.col("tid").alias(target_id),
        F.col("tx").alias(xc),
        F.col("ty").alias(yc),
        "krige_mean",
        "krige_var",
        "n_cond",
    )
