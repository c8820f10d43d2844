"""Randomization-method field generation over a distributed points table.

Spark shape: the spectral draws (cov_samples/modes, z1, z2[, spectrum_factor])
are small shared arrays → broadcast variables; positions are the distributed
axis → ``mapInPandas`` computes each Arrow batch with the numpy kernels
(kernels.summate*), mirroring the reference's parallel-over-points layout
(field.rs:53) — embarrassingly parallel, no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gstools_core_spark import kernels as K


def summate_field(
    points: DataFrame,
    cov_samples: np.ndarray,
    z1: np.ndarray,
    z2: np.ndarray,
    id_col: str = "id",
    coords: Sequence[str] = ("x", "y"),
    variant: str = "scalar",
    spectrum_factor: np.ndarray | None = None,
) -> DataFrame:
    """Evaluate a randomization-method field at every point.

    ``variant`` — 'scalar' (field.rs:37-65), 'incompr' (field.rs:97-182;
    output columns u_0..u_{d-1}), or 'fourier' (field.rs:219-249, requires
    ``spectrum_factor``).  Returns (id, u) or (id, u_0..u_{d-1}).
    """
    d = len(coords)
    if cov_samples.shape[0] != d:
        raise ValueError(f"cov_samples dim {cov_samples.shape[0]} != len(coords) {d}")
    if variant == "fourier" and spectrum_factor is None:
        raise ValueError("fourier variant requires spectrum_factor")

    sc = points.sparkSession.sparkContext
    bc = sc.broadcast(
        (
            np.asarray(cov_samples, dtype=np.float64),
            np.asarray(z1, dtype=np.float64),
            np.asarray(z2, dtype=np.float64),
            None if spectrum_factor is None else np.asarray(spectrum_factor, dtype=np.float64),
        )
    )
    coord_list = list(coords)

    if variant == "incompr":
        out_cols = [f"u_{k}" for k in range(d)]
        schema = f"{id_col} long, " + ", ".join(f"{c} double" for c in out_cols)

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ks, bz1, bz2, _ = bc.value
            for pdf in batches:
                pos = pdf[coord_list].to_numpy(dtype=np.float64).T
                u = K.summate_incompr(ks, bz1, bz2, pos)
                out = {id_col: pdf[id_col]}
                for k_i in range(d):
                    out[out_cols[k_i]] = u[k_i]
                yield pd.DataFrame(out)

        return points.mapInPandas(gen, schema)

    schema = f"{id_col} long, u double"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ks, bz1, bz2, sf = bc.value
        for pdf in batches:
            pos = pdf[coord_list].to_numpy(dtype=np.float64).T
            if variant == "fourier":
                u = K.summate_fourier(sf, ks, bz1, bz2, pos)
            else:
                u = K.summate(ks, bz1, bz2, pos)
            yield pd.DataFrame({id_col: pdf[id_col], "u": u})

    return points.mapInPandas(gen, schema)
