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


def test_pair_join_hot_cap_exact(spark):
    """pair_join's hot_cap bounds WHICH cells get the salt treatment, not
    the result: with cap=1 only the single biggest cell is salted and the
    pair set is still exact."""
    df, pos, _ = _skewed_points(spark)
    pairs = pair_join(df, max_dist=1.0, salt_hot=8, hot_threshold=100, hot_cap=1)
    got = {(r["a_id"], r["b_id"]) for r in pairs.select("a_id", "b_id").collect()}
    ii, jj = np.triu_indices(pos.shape[1], k=1)
    d = np.sqrt(np.sum((pos[:, ii] - pos[:, jj]) ** 2, axis=0))
    want = {(int(a), int(b)) for a, b in zip(ii[d < 1.0], jj[d < 1.0])}
    assert got == want


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


def _collect_krige(out):
    rows = out.orderBy("id").collect()
    return [
        (r["id"], r["krige_mean"], r["krige_var"], r["n_cond"]) for r in rows
    ]


def test_krige_salting_bitwise_invariant(spark):
    """salt_hot splits the hot cell's cogroup key without changing a bit of
    the kriged output (every target still sees its cell's full cond ring;
    per-group orders are canonicalized)."""
    from gstools_core_spark.operators.kriging import GaussianModel, krige

    df, _, _ = _skewed_points(spark)
    cond = df.where(F.col("id") % 3 == 0)
    model = GaussianModel(var=1.0, len_scale=0.4, nugget=0.01)
    for knn in (None, 8):
        plain = krige(df, cond, model, radius=1.0, method="ordinary", knn=knn)
        salted = krige(
            df, cond, model, radius=1.0, method="ordinary", knn=knn,
            salt_hot=8, hot_threshold=300,
        )
        assert _collect_krige(plain) == _collect_krige(salted)


def test_krige_salting_bitwise_invariant_simple_universal(spark):
    """The invariance promise is method-agnostic: the simple path goes
    through the pre-inverted-matrix kernel (stable_matmul products) and
    universal through the drift-extended stable_solve — both must be
    bit-identical under salting, like the ordinary pin above."""
    from gstools_core_spark.operators.kriging import GaussianModel, krige

    df, _, _ = _skewed_points(spark)
    cond = df.where(F.col("id") % 3 == 0)
    model = GaussianModel(var=1.0, len_scale=0.4, nugget=0.01)
    for method in ("simple", "universal"):
        plain = krige(df, cond, model, radius=1.0, method=method)
        salted = krige(
            df, cond, model, radius=1.0, method=method,
            salt_hot=8, hot_threshold=300,
        )
        assert _collect_krige(plain) == _collect_krige(salted), method


def test_krige_salting_geo_bitwise_invariant(spark):
    """Sphere path: the _ksalt key component must not be mistaken for the
    lon cell index inside solve_cell's max_cond center ranking."""
    from gstools_core_spark.operators.kriging import GaussianModel, krige

    rng = np.random.default_rng(23)
    lat = np.concatenate([rng.uniform(40.0, 41.0, 400), rng.uniform(-60, 60, 100)])
    lon = np.concatenate([rng.uniform(10.0, 11.0, 400), rng.uniform(-170, 170, 100)])
    val = rng.normal(size=500)
    df = spark.createDataFrame(
        [(i, float(lat[i]), float(lon[i]), float(val[i])) for i in range(500)],
        "id long, lat double, lon double, val double",
    )
    cond = df.where(F.col("id") % 3 == 0)
    model = GaussianModel(var=1.0, len_scale=0.02, nugget=0.01)
    kw = dict(
        radius=0.02, method="ordinary", coords=("lat", "lon"),
        haversine=True, max_cond=64,
    )
    plain = krige(df, cond, model, **kw)
    salted = krige(df, cond, model, salt_hot=4, hot_threshold=100, **kw)
    assert _collect_krige(plain) == _collect_krige(salted)


def test_krige_super_grouping_bitwise_invariant(spark):
    """group_cells coalesces fine blocking cells into one cogroup group
    (per-group dispatch is near-serial — thousands of tiny cells WERE the
    headline krige's cost); every grouping must produce bit-identical
    output, including combined with salting."""
    from gstools_core_spark.operators.kriging import GaussianModel, krige

    df, _, _ = _skewed_points(spark)
    cond = df.where(F.col("id") % 3 == 0)
    model = GaussianModel(var=1.0, len_scale=0.4, nugget=0.01)
    for knn in (None, 8):
        plain = krige(
            df, cond, model, radius=1.0, method="ordinary", knn=knn,
            group_cells=1,
        )
        grouped = krige(
            df, cond, model, radius=1.0, method="ordinary", knn=knn,
            group_cells=4,
        )
        auto = krige(
            df, cond, model, radius=1.0, method="ordinary", knn=knn,
            group_cells="auto",
        )
        want = _collect_krige(plain)
        assert _collect_krige(grouped) == want
        assert _collect_krige(auto) == want
    both = krige(
        df, cond, model, radius=1.0, method="ordinary", knn=8,
        group_cells=4, salt_hot=8, hot_threshold=300,
    )
    base = krige(
        df, cond, model, radius=1.0, method="ordinary", knn=8, group_cells=1
    )
    assert _collect_krige(both) == _collect_krige(base)


def test_auto_group_factor_skew_guard(spark):
    """'auto' groups a uniform cell grid (~2 groups/core) but keeps fine
    cells on a skewed density: merging adjacent hot-region cells would
    re-serialize exactly what salt_hot splits (measured 7.5→28.5 s on the
    sphere path as the factor grows)."""
    from gstools_core_spark.operators.kriging import auto_group_factor

    # uniform 40×40 cell grid, one point per cell → no skew, factor from
    # the 2-groups/core rule: sqrt(1600 / (2·par))
    grid = spark.range(1600).select(
        (F.col("id") % 40).alias("cx"), (F.col("id") / 40).cast("long").alias("cy")
    )
    par = 8
    got = auto_group_factor(grid, ["cx", "cy"], par)
    assert got == max(1, int(round((1600 / (2 * par)) ** 0.5)))

    # 80% of rows in ONE cell → max/mean ≫ 4 AND above the Poisson floor
    # → guard keeps fine cells
    skewed = spark.range(1000).select(
        F.when(F.col("id") < 800, F.lit(0)).otherwise(F.col("id")).alias("cx"),
        F.lit(0).alias("cy"),
    )
    assert auto_group_factor(skewed, ["cx", "cy"], par) == 1

    # SPARSE-uniform: mean ~1 per cell with one 8-row cell — max/mean > 4
    # but max is ordinary Poisson jitter (below mean + 6·√mean + 10), and
    # a pure ratio test would forfeit grouping on exactly the
    # thousands-of-tiny-cells input grouping exists for
    sparse = spark.range(1600).select(
        F.when(F.col("id") < 8, F.lit(0)).otherwise(F.col("id")).alias("cx"),
        F.lit(0).alias("cy"),
    )
    got_sparse = auto_group_factor(sparse, ["cx", "cy"], par)
    assert got_sparse == max(1, int(round((1593 / (2 * par)) ** 0.5)))

    # precomputed-counts path (shared with salting's hot detection) gives
    # the identical decision
    from gstools_core_spark.operators.kriging import (
        auto_group_plan,
        cell_count_df,
    )

    counts = cell_count_df(skewed, ["cx", "cy"])
    assert auto_group_factor(skewed, ["cx", "cy"], par, counts=counts) == 1

    # the full plan: uniform → (rule factor, no keep-fine set); skewed →
    # HYBRID — the skew-causing cell keeps fine granularity while the
    # factor is re-derived from the COLD cell count (the tail still sheds
    # its dispatch; at 100× the tail grows linearly, the hot set doesn't)
    m_u, kf_u = auto_group_plan(grid, ["cx", "cy"], par)
    assert kf_u is None and m_u == got
    m_s, kf_s = auto_group_plan(skewed, ["cx", "cy"], par)
    fine_rows = {(r["cx"], r["cy"]) for r in kf_s.collect()}
    assert fine_rows == {(0, 0)}
    # 200 cold single-row cells → rule over 200, not 201
    assert m_s == max(1, int(round((200 / (2 * par)) ** 0.5)))


def test_hot_set_caps_bounded(spark):
    """Heavy-tailed density: the skew threshold is relative to the mean, so
    a Zipfian tail can push unboundedly many cells above it — both
    broadcast hot sets (auto-grouping keep-fine, salting split set) must
    be bounded at the top-K cells by count, deterministically."""
    from gstools_core_spark.operators.kriging import (
        auto_group_plan,
        salt_cogroup_keys,
    )

    # 300 'hot' cells of 40 rows + 3000 single-row tail cells: mean ≈ 4.5,
    # Poisson floor ≈ 27 → every 40-row cell clears the threshold, far
    # more than any sane broadcast wants fine/salted
    hot = spark.range(300 * 40).select(
        (F.col("id") % 300).alias("cx"), F.lit(0).alias("cy")
    )
    tail = spark.range(3000).select(
        (F.col("id") + 10_000).alias("cx"), F.lit(1).alias("cy")
    )
    df = hot.unionByName(tail)

    cap = 16
    m, kf = auto_group_plan(df, ["cx", "cy"], 8, keep_cap=cap)
    assert kf is not None and kf.count() == cap
    # deterministic top-K: equal counts tie-break on cell keys ascending
    assert {r["cx"] for r in kf.collect()} == set(range(cap))
    # the factor counts the beyond-cap hot cells as cold: 3300-16 cells
    assert m == max(1, int(round(((3300 - cap) / (2 * 8)) ** 0.5)))
    # uncapped: all 300 hot cells stay fine, factor from the 3000 cold
    m_u, kf_u = auto_group_plan(df, ["cx", "cy"], 8)
    assert kf_u.count() == 300
    assert m_u == max(1, int(round((3000 / (2 * 8)) ** 0.5)))

    # salting: with hot_cap only the top-K cells get salted/replicated
    t = df.select(
        F.monotonically_increasing_id().alias("tid"),
        F.col("cx").alias("jc0"),
        F.col("cy").alias("jc1"),
    )
    c = t.select(F.col("tid").alias("cid"), "jc0", "jc1")
    ts, cs, keys = salt_cogroup_keys(
        t, c, ["jc0", "jc1"], "tid", 4, 30, hot_cap=cap
    )
    salted_cells = (
        cs.groupBy("jc0", "jc1")
        .agg(F.countDistinct("_ksalt").alias("ns"))
        .where(F.col("ns") > 1)
        .count()
    )
    assert salted_cells == cap


def test_krige_hot_cap_bitwise_invariant(spark):
    """Capping which cells are salted / kept fine must not change a bit of
    the kriged output (it only moves cells between the split/fine and
    grouped treatments, both output-invariant)."""
    from gstools_core_spark.operators.kriging import GaussianModel, krige

    df, _, _ = _skewed_points(spark)
    cond = df.where(F.col("id") % 3 == 0)
    model = GaussianModel(var=1.0, len_scale=0.4, nugget=0.01)
    kw = dict(
        radius=1.0, method="ordinary", knn=8, group_cells="auto",
        salt_hot=4, hot_threshold=300,
    )
    want = _collect_krige(
        krige(df, cond, model, radius=1.0, method="ordinary", knn=8,
              group_cells=1)
    )
    for cap in (0, 1, 4):  # disabled / tighter-than-hot-set / roomy
        got = _collect_krige(krige(df, cond, model, hot_cap=cap, **kw))
        assert got == want, f"hot_cap={cap}"


def test_krige_salting_skipped_when_no_hot_cells(spark):
    """Plan-time hot-set detection: when no cell clears hot_threshold the
    salting machinery (cond-ring explode, broadcast joins, _ksalt key)
    must not appear in the plan at all — it cost ~35% of the sphere bench
    at sf0.1 to salt zero cells — and the output must equal the unsalted
    run bitwise.  With a low threshold the machinery still engages."""
    from gstools_core_spark.operators.kriging import GaussianModel, krige

    df, _, _ = _skewed_points(spark)
    cond = df.where(F.col("id") % 3 == 0)
    model = GaussianModel(var=1.0, len_scale=0.4, nugget=0.01)
    kw = dict(radius=1.0, method="ordinary", knn=8, group_cells=1)
    plain = krige(df, cond, model, **kw)
    skipped = krige(df, cond, model, salt_hot=8, hot_threshold=10_000, **kw)
    engaged = krige(df, cond, model, salt_hot=8, hot_threshold=300, **kw)
    assert "_ksalt" not in skipped._jdf.queryExecution().toString()
    assert "_ksalt" in engaged._jdf.queryExecution().toString()
    want = _collect_krige(plain)
    assert _collect_krige(skipped) == want
    assert _collect_krige(engaged) == want


def test_krige_hot_threshold_auto_fair_share(spark):
    """hot_threshold='auto' (default): a cell above one shuffle
    partition's fair share of targets is a straggler task by construction
    (one cogroup task per key), so it must be salted — the 800-target
    cell here clears the max(256, total/partitions) rule — and the
    output must equal the unsalted run bitwise."""
    from gstools_core_spark.operators.kriging import GaussianModel, krige

    df, _, _ = _skewed_points(spark)
    cond = df.where(F.col("id") % 3 == 0)
    model = GaussianModel(var=1.0, len_scale=0.4, nugget=0.01)
    kw = dict(radius=1.0, method="ordinary", knn=8, group_cells=1)
    plain = krige(df, cond, model, **kw)
    auto = krige(df, cond, model, salt_hot=4, **kw)  # hot_threshold='auto'
    assert "_ksalt" in auto._jdf.queryExecution().toString()
    assert _collect_krige(auto) == _collect_krige(plain)


def test_krige_salting_splits_hot_cell(spark):
    """One hot cell becomes S cogroup sub-keys (targets hashed across all S
    salts, cond ring replicated ×S); cold cells keep salt 0 unreplicated."""
    from gstools_core_spark.operators.kriging import salt_cogroup_keys

    # 600 targets in cell (0,0) (hot), 50 in cell (5,5) (cold)
    rows = [(i, 0.1 + (i % 10) * 0.08, 0.1 + (i // 10 % 10) * 0.08) for i in range(600)]
    rows += [(1000 + i, 5.2, 5.3) for i in range(50)]
    t = spark.createDataFrame(rows, "tid long, t0 double, t1 double")
    t = t.withColumn("jc0", F.floor("t0").cast("long")).withColumn(
        "jc1", F.floor("t1").cast("long")
    )
    c = t.select(
        F.col("tid").alias("cid"), "t0", "t1", "jc0", "jc1"
    )  # stand-in for the ring-stamped cond side
    S = 8
    ts, cs, keys = salt_cogroup_keys(t, c, ["jc0", "jc1"], "tid", S, 300)
    assert keys == ["jc0", "jc1", "_ksalt"]
    hot_salts = ts.where(F.col("jc0") == 0).select("_ksalt").distinct().count()
    cold_salts = ts.where(F.col("jc0") == 5).select("_ksalt").distinct().count()
    assert hot_salts == S and cold_salts == 1
    # cond side: hot cell replicated across all S salts, cold cell once
    hot_rep = cs.where(F.col("jc0") == 0).count()
    cold_rep = cs.where(F.col("jc0") == 5).count()
    assert hot_rep == 600 * S and cold_rep == 50


def test_aqe_skew_configs_active(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
