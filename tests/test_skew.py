"""Skew handling: a pathological hot cell stays correct (and AQE/salting
knobs engage) — the north rule's dense-page scenario."""

import numpy as np
from pyspark.sql import functions as F

from gstools_core_spark.operators.pair_join import pair_join
from gstools_core_spark.operators.variogram import variogram_unstructured
from gstools_core_spark import kernels as K


def _skewed_points(spark, n_hot=800, n_rest=200):
    """80% of points concentrated inside one blocking cell."""
    rng = np.random.default_rng(11)
    hot = rng.uniform(0.0, 0.9, size=(n_hot, 2))  # one cell at cell_size=1
    rest = rng.uniform(-10.0, 10.0, size=(n_rest, 2))
    xy = np.vstack([hot, rest])
    val = rng.normal(size=n_hot + n_rest)
    rows = [
        (i, float(xy[i, 0]), float(xy[i, 1]), float(val[i]))
        for i in range(len(xy))
    ]
    return (
        spark.createDataFrame(rows, "id long, x double, y double, val double"),
        xy.T,
        val,
    )


def test_pair_join_hot_cell_exact(spark):
    df, pos, _ = _skewed_points(spark)
    pairs = pair_join(df, max_dist=1.0, salt_partitions=16)
    got = pairs.count()
    ii, jj = np.triu_indices(pos.shape[1], k=1)
    d = np.sqrt(np.sum((pos[:, ii] - pos[:, jj]) ** 2, axis=0))
    assert got == int((d < 1.0).sum())


def test_pair_join_explicit_salting_exact(spark):
    """salt_hot splits the hot cell's join key without changing the result."""
    df, pos, _ = _skewed_points(spark)
    pairs = pair_join(df, max_dist=1.0, salt_hot=8, hot_threshold=300)
    got = {(r["a_id"], r["b_id"]) for r in pairs.select("a_id", "b_id").collect()}
    ii, jj = np.triu_indices(pos.shape[1], k=1)
    d = np.sqrt(np.sum((pos[:, ii] - pos[:, jj]) ** 2, axis=0))
    want = {(int(a), int(b)) for a, b in zip(ii[d < 1.0], jj[d < 1.0])}
    assert got == want
    # hot-cell detection is a broadcast join, not a driver-collected isin
    # literal list (plan-size-safe when thousands of cells are hot)
    plan = pairs._jdf.queryExecution().toString()
    assert " IN (" not in plan and "jsalt" in plan


def test_variogram_on_skewed_cloud_matches_kernel(spark):
    df, pos, val = _skewed_points(spark)
    edges = [0.0, 0.25, 0.5, 0.75, 1.0]
    out = variogram_unstructured(df, edges, salt_partitions=32)
    rows = out.orderBy("bin_id").collect()
    got_g = np.array([r["gamma"] for r in rows])
    got_c = np.array([r["counts"] for r in rows])
    want_g, want_c = K.variogram_unstructured(val[None, :], np.array(edges), pos)
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_allclose(got_g, want_g, rtol=1e-9)


def test_aqe_skew_configs_active(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
