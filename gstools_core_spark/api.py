"""Drop-in API: the reference's 9-function surface (lib.rs:29-219), same
names, argument shapes, defaults and return conventions — numpy in, numpy
out — executed on the Spark engine.

A GSTools-Core user can switch imports::

    from gstools_core_spark import api as gstools_core
    gamma, counts = gstools_core.variogram_unstructured(f, bin_edges, pos)

Conventions preserved (SURVEY.md §1.1): ``pos`` is (d, n) dimension-major,
``f`` is (nf, n), masks are True=excluded, Haversine returns radians,
``estimator_type`` 'm'/'c', ``distance_type`` 'e'/other-is-haversine.
``num_threads`` is accepted for signature parity; Spark's parallelism is
cluster-level, not per-call (SURVEY.md §1.4).

Array-shaped inputs (variograms, field summation) run through the
distributed operators; the kriging matrix kernels — which the reference
defines on one already-assembled neighborhood — run through the identical
numpy kernels that execute inside every ``applyInPandas`` group of the
distributed ``operators.kriging.krige`` path.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import SparkSession

from gstools_core_spark import kernels as K
from gstools_core_spark.operators import variogram as V
from gstools_core_spark.operators.field import summate_field

__version__ = "1.1.0-spark"


def _spark() -> SparkSession:
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from gstools_core_spark.session import get_session

    return get_session("gstools-core-spark-api")


def _points_df(pos: np.ndarray, f: np.ndarray):
    pos = np.asarray(pos, dtype=np.float64)
    f = np.atleast_2d(np.asarray(f, dtype=np.float64))
    d, n = pos.shape
    coords = [f"c{i}" for i in range(d)]
    val_cols = [f"v{i}" for i in range(f.shape[0])]
    rows = [
        tuple([int(i)] + [float(pos[k, i]) for k in range(d)] + [float(f[r, i]) for r in range(f.shape[0])])
        for i in range(n)
    ]
    schema = "id long, " + ", ".join(f"{c} double" for c in coords + val_cols)
    return _spark().createDataFrame(rows, schema), coords, val_cols


def variogram_unstructured(
    f, bin_edges, pos, estimator_type: str = "m", distance_type: str = "e",
    num_threads=None,
):
    """(γ (nbins,), counts (nbins,)) — lib.rs:188-216."""
    df, coords, val_cols = _points_df(pos, f)
    if distance_type != "e":
        df = df.withColumnRenamed("c0", "lat").withColumnRenamed("c1", "lon")
        coords = ["lat", "lon"]
    out = (
        V.variogram_unstructured(
            df, [float(b) for b in bin_edges], val_cols=val_cols,
            coords=coords, estimator=estimator_type, distance=distance_type,
        )
        .orderBy("bin_id")
        .collect()
    )
    return (
        np.array([r["gamma"] for r in out]),
        np.array([r["counts"] for r in out], dtype=np.uint64),
    )


def variogram_directional(
    f, bin_edges, pos, direction, angles_tol: float = math.pi / 8.0,
    bandwidth: float = -1.0, separate_dirs: bool = False,
    estimator_type: str = "m", num_threads=None,
):
    """(γ (ndir, nbins), counts (ndir, nbins)) — lib.rs:148-186."""
    df, coords, val_cols = _points_df(pos, f)
    direction = np.atleast_2d(np.asarray(direction, dtype=np.float64))
    out = (
        V.variogram_directional(
            df, [float(b) for b in bin_edges], direction.tolist(),
            angles_tol=angles_tol, bandwidth=bandwidth,
            separate_dirs=separate_dirs, val_cols=val_cols, coords=coords,
            estimator=estimator_type,
        )
        .orderBy("dir_id", "bin_id")
        .collect()
    )
    nbins = len(bin_edges) - 1
    gamma = np.array([r["gamma"] for r in out]).reshape(direction.shape[0], nbins)
    counts = np.array([r["counts"] for r in out], dtype=np.uint64).reshape(
        direction.shape[0], nbins
    )
    return gamma, counts


def _grid_df(f: np.ndarray, mask: np.ndarray | None = None):
    f = np.asarray(f, dtype=np.float64)
    nx, ny = f.shape
    rows = []
    for i in range(nx):
        for j in range(ny):
            row = [i, j, float(f[i, j])]
            if mask is not None:
                row.append(bool(mask[i, j]))
            rows.append(tuple(row))
    schema = "i long, j long, val double" + (", masked boolean" if mask is not None else "")
    return _spark().createDataFrame(rows, schema)


def variogram_structured(f, estimator_type: str = "m", num_threads=None):
    """γ (nx,) — lib.rs:120-131."""
    out = (
        V.variogram_structured_fast(_grid_df(np.asarray(f)), estimator=estimator_type)
        .orderBy("lag")
        .collect()
    )
    return np.array([r["gamma"] for r in out])


def variogram_ma_structured(f, mask, estimator_type: str = "m", num_threads=None):
    """γ (nx,) with True=excluded mask — lib.rs:133-146."""
    out = (
        V.variogram_structured_fast(
            _grid_df(np.asarray(f), np.asarray(mask, dtype=bool)),
            mask_col="masked", estimator=estimator_type,
        )
        .orderBy("lag")
        .collect()
    )
    return np.array([r["gamma"] for r in out])


def _field_api(variant, cov_samples, z1, z2, pos, spectrum_factor=None):
    pos = np.asarray(pos, dtype=np.float64)
    d, n = pos.shape
    coords = [f"c{i}" for i in range(d)]
    rows = [
        tuple([int(i)] + [float(pos[k, i]) for k in range(d)]) for i in range(n)
    ]
    df = _spark().createDataFrame(
        rows, "id long, " + ", ".join(f"{c} double" for c in coords)
    )
    out = summate_field(
        df, np.asarray(cov_samples, dtype=np.float64), z1, z2,
        coords=coords, variant=variant, spectrum_factor=spectrum_factor,
    ).orderBy("id").collect()
    if variant == "incompr":
        return np.array([[r[f"u_{k}"] for r in out] for k in range(d)])
    return np.array([r["u"] for r in out])


def summate(cov_samples, z1, z2, pos, num_threads=None):
    """u (n,) — lib.rs:33-48."""
    return _field_api("scalar", cov_samples, z1, z2, pos)


def summate_incompr(cov_samples, z1, z2, pos, num_threads=None):
    """u (d, n) — lib.rs:50-65."""
    return _field_api("incompr", cov_samples, z1, z2, pos)


def summate_fourier(spectrum_factor, modes, z1, z2, pos, num_threads=None):
    """u (n,) — lib.rs:67-84."""
    return _field_api("fourier", modes, z1, z2, pos, spectrum_factor=spectrum_factor)


def calc_field_krige(krig_mat, krig_vecs, cond, num_threads=None):
    """field (t,) — lib.rs:105-118.  Single pre-assembled neighborhood: runs
    the identical kernel used inside each distributed kriging group."""
    return K.calc_field_krige(krig_mat, krig_vecs, cond)


def calc_field_krige_and_variance(krig_mat, krig_vecs, cond, num_threads=None):
    """(field (t,), error (t,)) — lib.rs:86-103."""
    return K.calc_field_krige_and_variance(krig_mat, krig_vecs, cond)
