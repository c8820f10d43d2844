"""Property-based tests (hypothesis) for the numpy kernel core.

The reference pins goldens only (SURVEY.md §5: "No property-based tests");
these generalize the golden coverage with algebraic invariants every kernel
must satisfy for arbitrary inputs — the same invariants the Spark operators
inherit because kernels.py is their single source of truth.

Pure numpy, no SparkSession: fast enough for full hypothesis example counts.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from gstools_core_spark import kernels as K
from gstools_core_spark.functions.cells import geo_cell_np, morton_np

finite = st.floats(min_value=-50.0, max_value=50.0, allow_nan=False, width=64)
BINS = np.array([0.0, 1.0, 2.5, 5.0, 10.0, 40.0])


def points_and_values(min_n=2, max_n=24, d=2):
    n = st.shared(st.integers(min_value=min_n, max_value=max_n), key="n")
    pos = n.flatmap(lambda m: arrays(np.float64, (d, m), elements=finite))
    f = n.flatmap(lambda m: arrays(np.float64, (1, m), elements=finite))
    return pos, f


POS2, F2 = points_and_values()


@settings(max_examples=60, deadline=None)
@given(pos=POS2, f=F2, seed=st.integers(0, 2**32 - 1), est=st.sampled_from(["m", "c"]))
def test_variogram_unstructured_permutation_invariant(pos, f, seed, est):
    """The i<j pair set is unordered: any point permutation leaves (γ, counts)
    bit-identical up to summation order (variogram.rs:510-531 iterates pairs,
    never indices)."""
    perm = np.random.RandomState(seed).permutation(pos.shape[1])
    g1, c1 = K.variogram_unstructured(f, BINS, pos, estimator=est)
    g2, c2 = K.variogram_unstructured(f[:, perm], BINS, pos[:, perm], estimator=est)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(g1, g2, rtol=1e-9, atol=1e-12)


@settings(max_examples=60, deadline=None)
@given(pos=POS2, f=F2, shift=finite, est=st.sampled_from(["m", "c"]))
def test_variogram_value_shift_invariant(pos, f, shift, est):
    """γ depends on f only through pairwise differences → adding a constant
    changes nothing (up to float cancellation in the subtraction)."""
    g1, c1 = K.variogram_unstructured(f, BINS, pos, estimator=est)
    g2, c2 = K.variogram_unstructured(f + shift, BINS, pos, estimator=est)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(g1, g2, rtol=1e-6, atol=1e-9)


@settings(max_examples=60, deadline=None)
@given(pos=POS2, f=F2, scale=st.floats(min_value=0.25, max_value=4.0))
def test_variogram_matheron_scales_quadratically(pos, f, scale):
    """Matheron estimate is (Δf)² → scaling f by s scales γ by s²."""
    g1, _ = K.variogram_unstructured(f, BINS, pos, estimator="m")
    g2, _ = K.variogram_unstructured(f * scale, BINS, pos, estimator="m")
    np.testing.assert_allclose(g2, g1 * scale * scale, rtol=1e-9, atol=1e-12)


@settings(max_examples=60, deadline=None)
@given(
    f=arrays(np.float64, (6, 4), elements=finite),
    est=st.sampled_from(["m", "c"]),
)
def test_structured_allfalse_mask_is_unmasked(f, est):
    """mask=False everywhere ≡ no mask (variogram.rs tests pin one case;
    this holds for every grid)."""
    np.testing.assert_array_equal(
        K.variogram_structured(f, est),
        K.variogram_ma_structured(f, np.zeros_like(f, dtype=bool), est),
    )


@settings(max_examples=100, deadline=None)
@given(
    lat1=st.floats(-90, 90), lon1=st.floats(-180, 180),
    lat2=st.floats(-90, 90), lon2=st.floats(-180, 180),
)
def test_haversine_symmetric_and_bounded(lat1, lon1, lat2, lon2):
    a = np.array([[lat1], [lon1]])
    b = np.array([[lat2], [lon2]])
    d_ab = K.haversine_dist(a, b)[0]
    d_ba = K.haversine_dist(b, a)[0]
    assert d_ab == d_ba  # bitwise: every term is even in the swap
    assert 0.0 <= d_ab <= np.pi + 1e-12
    assert K.haversine_dist(a, a)[0] == 0.0


@settings(max_examples=60, deadline=None)
@given(
    diff=arrays(np.float64, (2, 8), elements=finite),
    theta=st.floats(0, 2 * np.pi),
    tol=st.floats(0.01, np.pi / 2),
    bandwidth=st.sampled_from([-1.0, 0.5, 2.0]),
)
def test_dir_test_sign_symmetric_and_zero_dist_passes(diff, theta, tol, bandwidth):
    """dir_test(d) == dir_test(-d) (only |s| and the residual norm matter,
    variogram.rs:243-291), and zero-distance pairs always pass."""
    direction = np.array([np.cos(theta), np.sin(theta)])
    dist = np.sqrt(np.sum(diff * diff, axis=0))
    p1 = K.dir_test(direction, diff, dist, tol, bandwidth)
    p2 = K.dir_test(-direction, diff, dist, tol, bandwidth)
    np.testing.assert_array_equal(p1, p2)
    zero = np.zeros((2, 3))
    assert K.dir_test(direction, zero, np.zeros(3), tol, bandwidth).all()


@settings(max_examples=40, deadline=None)
@given(pos=POS2, f=F2)
def test_directional_separate_dirs_credits_at_most_once(pos, f):
    """separate_dirs=True credits each pair to exactly one (the first)
    matching direction → per-(dir,bin) counts ≤ non-separate counts and the
    cross-direction total never exceeds the unstructured pair count."""
    dirs = np.array([[1.0, 0.0], [np.sqrt(0.5), np.sqrt(0.5)], [0.0, 1.0]])
    _, c_sep = K.variogram_directional(f, BINS, pos, dirs, separate_dirs=True)
    _, c_all = K.variogram_directional(f, BINS, pos, dirs, separate_dirs=False)
    assert (c_sep <= c_all).all()
    _, c_unstr = K.variogram_unstructured(f, BINS, pos)
    assert (c_sep.sum(axis=0) <= c_unstr).all()


@settings(max_examples=30, deadline=None)
@given(
    pos=arrays(np.float64, (2, 7), elements=finite),
    modes=arrays(np.float64, (2, 5), elements=st.floats(-2, 2)),
    z=arrays(np.float64, (4, 5), elements=finite),
)
def test_summate_linear_in_z(pos, modes, z):
    """u is linear in (z1, z2) for fixed modes/positions (field.rs:54-63 is a
    weighted sum of cos/sin terms)."""
    z1a, z2a, z1b, z2b = z
    u_sum = K.summate(modes, z1a + z1b, z2a + z2b, pos)
    u_parts = K.summate(modes, z1a, z2a, pos) + K.summate(modes, z1b, z2b, pos)
    np.testing.assert_allclose(u_sum, u_parts, rtol=1e-9, atol=1e-9)


@settings(max_examples=30, deadline=None)
@given(
    mat=arrays(np.float64, (3, 3), elements=st.floats(-3, 3, allow_nan=False)),
    vecs=arrays(np.float64, (3, 5), elements=st.floats(-3, 3, allow_nan=False)),
    cond=arrays(np.float64, (3,), elements=st.floats(-3, 3, allow_nan=False)),
)
def test_krige_mean_matches_mean_and_variance_path(mat, vecs, cond):
    """calc_field_krige ≡ the mean component of calc_field_krige_and_variance
    (krige.rs:92-118 vs 24-74 share the accumulation)."""
    field_only = K.calc_field_krige(mat, vecs, cond)
    field, err = K.calc_field_krige_and_variance(mat, vecs, cond)
    np.testing.assert_allclose(field_only, field, rtol=1e-12, atol=1e-12)
    assert err.shape == (5,)


@settings(max_examples=100, deadline=None)
@given(
    lat=st.floats(-89.999, 89.999), lon=st.floats(-179.999, 179.999),
    res=st.integers(min_value=1, max_value=16),
)
def test_geo_cell_parent_is_prefix(lat, lon, res):
    """Hierarchy invariant: the parent cell at res-1 is the child cell >> 2
    for EVERY point and resolution (H3/S2-style prefix semantics)."""
    child = geo_cell_np(np.array([lat]), np.array([lon]), res)[0]
    parent = geo_cell_np(np.array([lat]), np.array([lon]), res - 1)[0]
    assert child >> 2 == parent
    assert 0 <= child < (1 << (2 * res))


@settings(max_examples=100, deadline=None)
@given(ix=st.integers(0, 2**16 - 1), iy=st.integers(0, 2**16 - 1))
def test_morton_bit_roundtrip(ix, iy):
    """Morton interleave is invertible: de-interleaving the odd/even bits
    recovers (ix, iy) exactly."""
    m = int(morton_np(np.array([ix]), np.array([iy]))[0])
    rx = ry = 0
    for b in range(16):
        rx |= ((m >> (2 * b)) & 1) << b
        ry |= ((m >> (2 * b + 1)) & 1) << b
    assert (rx, ry) == (ix, iy)


@settings(max_examples=50, deadline=None)
@given(
    a=arrays(np.float64, (7, 2), elements=st.floats(-89.0, 89.0)),
    b=arrays(np.float64, (5, 2), elements=st.floats(-89.0, 89.0)),
)
def test_haversine_coslat_bitwise_equals_plain(a, b):
    """haversine_dist_coslat (round-6: per-point cos(lat) hoisted out of
    the pair broadcast) must be BITWISE equal to haversine_dist — the
    kriging bitwise-invariance pins and the geo oracle hashes rest on the
    two being the same function."""
    # map the second column into lon range
    a[:, 1] *= 2.0
    b[:, 1] *= 2.0
    want = K.haversine_dist(a.T[:, :, None], b.T[:, None, :])
    ca = np.cos(np.radians(a[:, 0]))[:, None]
    cb = np.cos(np.radians(b[:, 0]))[None, :]
    got = K.haversine_dist_coslat(a.T[:, :, None], b.T[:, None, :], ca, cb)
    np.testing.assert_array_equal(got, want)
