"""Covariance models for kriging + the anisotropy/rotation transform.

The reference crate is model-agnostic — its kriging kernel receives a
pre-inverted system matrix (krige.rs:10-15); the covariance model lives in
GSTools (Python).  This engine owns the assembly step, so it carries the
standard model family.  Convention: ``cov(h) = var · cor(h / len_scale)``
with ``cor(0) = 1``; the nugget enters only the Gram diagonal
(kriging.py).  (GSTools applies per-model rescale factors to ``len_scale``;
here the length scale is used as given — document the scale you fit.)

Anisotropy is handled the standard way: transform coordinates into the
isotropic frame (rotate by −angle, divide secondary axes by their
anisotropy ratios), then run any isotropic operator — the transform is a
pure column expression, so variograms/kriging/kNN all stay in whole-stage
codegen.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class CovModel:
    """Base: isotropic covariance model with var/len_scale/nugget."""

    def __init__(self, var: float = 1.0, len_scale: float = 1.0, nugget: float = 0.0):
        self.var = float(var)
        self.len_scale = float(len_scale)
        self.nugget = float(nugget)

    def cor(self, hs: np.ndarray) -> np.ndarray:  # hs = h / len_scale
        raise NotImplementedError

    def cov(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, dtype=np.float64)
        return self.var * self.cor(h / self.len_scale)

    @property
    def sill(self) -> float:
        return self.var + self.nugget


class Gaussian(CovModel):
    """cor(h) = exp(−h²).  Base ``cov`` (var · cor(h/ls)) performs the
    identical divide→square→exp→multiply sequence, so golden tests are
    bitwise-stable without an override."""

    def cor(self, hs):
        return np.exp(-(hs**2))


class Exponential(CovModel):
    """cor(h) = exp(−h)."""

    def cor(self, hs):
        return np.exp(-hs)


class Stable(CovModel):
    """cor(h) = exp(−h^α), 0 < α ≤ 2."""

    def __init__(self, var=1.0, len_scale=1.0, nugget=0.0, alpha: float = 1.5):
        super().__init__(var, len_scale, nugget)
        if not 0.0 < alpha <= 2.0:
            raise ValueError("alpha must be in (0, 2]")
        self.alpha = float(alpha)

    def cor(self, hs):
        return np.exp(-(hs**self.alpha))


class Spherical(CovModel):
    """cor(h) = 1 − 1.5h + 0.5h³ for h < 1, else 0 (compact support)."""

    def cor(self, hs):
        hs = np.asarray(hs, dtype=np.float64)
        return np.where(hs < 1.0, 1.0 - 1.5 * hs + 0.5 * hs**3, 0.0)


class Matern(CovModel):
    """Matérn with half-integer smoothness ν ∈ {0.5, 1.5, 2.5} (closed
    forms; the general-ν Bessel form needs scipy, absent here)."""

    def __init__(self, var=1.0, len_scale=1.0, nugget=0.0, nu: float = 1.5):
        super().__init__(var, len_scale, nugget)
        if nu not in (0.5, 1.5, 2.5):
            raise ValueError("nu must be 0.5, 1.5 or 2.5 (closed forms only)")
        self.nu = float(nu)

    def cor(self, hs):
        hs = np.asarray(hs, dtype=np.float64)
        if self.nu == 0.5:
            return np.exp(-hs)
        if self.nu == 1.5:
            t = math.sqrt(3.0) * hs
            return (1.0 + t) * np.exp(-t)
        t = math.sqrt(5.0) * hs
        return (1.0 + t + t * t / 3.0) * np.exp(-t)


# backward-compatible name used throughout round 1
GaussianModel = Gaussian


def isotropize_cols(
    coords: tuple[Column, Column], angle: float = 0.0, anis: float = 1.0
) -> tuple[Column, Column]:
    """2-D anisotropy transform as pure column expressions: rotate the
    frame so the main correlation axis (at ``angle`` radians CCW from x)
    becomes x′, then stretch the secondary axis by 1/``anis``
    (anis = len_scale_y / len_scale_x < 1 for shorter cross-axis
    correlation).  Isotropic operators on (x′, y′) then realize the
    anisotropic model."""
    x, y = coords
    c, s = math.cos(angle), math.sin(angle)
    xp = x * F.lit(c) + y * F.lit(s)
    yp = (x * F.lit(-s) + y * F.lit(c)) / F.lit(float(anis))
    return xp, yp


def isotropize(
    df: DataFrame,
    angle: float = 0.0,
    anis: float = 1.0,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Replace (x, y) with isotropized coordinates (same column names, so
    downstream operators need no changes)."""
    xp, yp = isotropize_cols((F.col(x_col), F.col(y_col)), angle, anis)
    return df.withColumns({x_col: xp, y_col: yp})
