"""Spatial layer tests: cell index, kNN join, point-in-polygon, rasterize."""

import numpy as np
import pandas as pd

from gstools_core_spark.functions import cells as C
from gstools_core_spark.operators import spatial as S

RNG = np.random.default_rng(7)


def test_morton_spark_matches_numpy(spark):
    ix = RNG.integers(0, 1 << 20, size=200).astype(np.int64)
    iy = RNG.integers(0, 1 << 20, size=200).astype(np.int64)
    pdf = pd.DataFrame({"ix": ix, "iy": iy})
    df = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    got = (
        df.select(C.morton_col(F.col("ix"), F.col("iy")).alias("m"))
        .toPandas()["m"]
        .to_numpy()
    )
    want = C.morton_np(ix, iy)
    np.testing.assert_array_equal(got, want)


def test_geo_cell_hierarchy(spark):
    """Parent at res-1 is cell >> 2 (prefix semantics)."""
    lat = RNG.uniform(-89.0, 89.0, size=500)
    lon = RNG.uniform(-179.0, 179.0, size=500)
    c_fine = C.geo_cell_np(lat, lon, 12)
    c_coarse = C.geo_cell_np(lat, lon, 11)
    np.testing.assert_array_equal(c_fine >> 2, c_coarse)
    # spark column agrees with numpy
    pdf = pd.DataFrame({"lat": lat, "lon": lon})
    df = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    got = (
        df.select(C.geo_cell_col(F.col("lat"), F.col("lon"), 12).alias("c"))
        .toPandas()["c"]
        .to_numpy()
    )
    np.testing.assert_array_equal(got, c_fine)


def _cloud_df(spark, n, seed, id_name):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-10, 10, n)
    y = rng.uniform(-10, 10, n)
    rows = [(i, float(x[i]), float(y[i])) for i in range(n)]
    return (
        spark.createDataFrame(rows, f"{id_name} long, x double, y double"),
        x,
        y,
    )


def test_knn_join_matches_bruteforce(spark):
    q, qx, qy = _cloud_df(spark, 40, 1, "qid")
    b, bx, by = _cloud_df(spark, 300, 2, "bid")
    radius = 4.0
    k = 5
    got = S.knn_join(q, b, k=k, radius=radius).collect()
    got_set = {(r["qid"], r["bid"], r["rank"]) for r in got}

    # numpy oracle: radius-bounded top-k with (dist, bid) ordering
    want_set = set()
    for qi in range(40):
        d = np.sqrt((bx - qx[qi]) ** 2 + (by - qy[qi]) ** 2)
        order = sorted(
            [(float(d[bi]), bi) for bi in range(300) if d[bi] <= radius]
        )
        for rank, (dist, bi) in enumerate(order[:k], start=1):
            want_set.add((qi, bi, rank))
    assert got_set == want_set


def test_geo_knn_join_matches_bruteforce(spark):
    rng = np.random.default_rng(13)
    qlat = rng.uniform(-60, 60, 20)
    qlon = rng.uniform(-170, 170, 20)
    blat = rng.uniform(-60, 60, 400)
    blon = rng.uniform(-170, 170, 400)
    q = spark.createDataFrame(
        [(i, float(qlat[i]), float(qlon[i])) for i in range(20)],
        "qid long, lat double, lon double",
    )
    b = spark.createDataFrame(
        [(i, float(blat[i]), float(blon[i])) for i in range(400)],
        "bid long, lat double, lon double",
    )
    radius = 0.3  # radians central angle
    got = {
        (r["qid"], r["bid"], r["rank"])
        for r in S.geo_knn_join(q, b, k=3, radius_rad=radius).collect()
    }

    from gstools_core_spark import kernels as K

    want = set()
    for qi in range(20):
        d = K.haversine_dist(
            np.vstack([np.full(400, qlat[qi]), np.full(400, qlon[qi])]),
            np.vstack([blat, blon]),
        )
        order = sorted((float(d[bi]), bi) for bi in range(400) if d[bi] <= radius)
        for rank, (_dd, bi) in enumerate(order[:3], start=1):
            want.add((qi, bi, rank))
    assert got == want


def test_cell_partitioned_write_prunes(spark, tmp_path):
    from gstools_core_spark.sources.pages import geocode, synthesize_pages
    from gstools_core_spark.sources.writer import read_cells, write_partitioned_by_cell
    from pyspark.sql import functions as F
    from gstools_core_spark import plans as PL

    pages = geocode(synthesize_pages(spark, 400)).select("url", "lat", "lon")
    out = str(tmp_path / "pages_by_cell")
    write_partitioned_by_cell(pages, out, prefix_res=2)

    back = read_cells(spark, out)
    assert back.count() == 400
    prefixes = [r["cell_prefix"] for r in back.select("cell_prefix").distinct().collect()]
    one = prefixes[0]
    pruned = read_cells(spark, out, [one])
    assert pruned.count() == back.where(F.col("cell_prefix") == one).count()
    # partition pruning visible in the plan
    p = PL.plan_string(pruned)
    assert "PartitionFilters" in p and "cell_prefix" in p


def test_bucketed_join_and_agg_have_no_exchange(spark):
    """The co-location layout: two tables bucketed (+sorted) on the same
    cell key must sort-merge-join AND groupBy-aggregate with ZERO Exchange
    in the plan — the pipeline's dominant shuffle paid once at write time.
    (Broadcast disabled via merge hint so the test exercises the SMJ path
    a 100-TB build side would take.)"""
    from gstools_core_spark.functions.cells import assign_grid_cells
    from gstools_core_spark.sources.pages import geocode, synthesize_pages
    from gstools_core_spark.sources.writer import write_bucketed_cells
    from pyspark.sql import functions as F

    pages = geocode(synthesize_pages(spark, 300)).select("url", "lat", "lon")
    pts = assign_grid_cells(pages, 10.0, x_col="lat", y_col="lon").select(
        "url", F.col("cx").alias("cell"), "lat", "lon"
    )
    try:
        write_bucketed_cells(pts, "bk_pages_a", ["cell"], n_buckets=8)
        write_bucketed_cells(
            pts.where(F.col("lat") > 0), "bk_pages_b", ["cell"], n_buckets=8
        )
        a, b = spark.table("bk_pages_a"), spark.table("bk_pages_b")

        agg = a.groupBy("cell").agg(F.count("*").alias("n"))
        ap = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in ap, ap  # bucket layout == grouping key
        assert agg.count() > 0

        j2 = a.hint("merge").join(b, "cell")
        p2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in p2
        assert "Exchange" not in p2, p2  # both sides pre-bucketed: no shuffle
        # correctness: bucketed join == the same join on the unbucketed frames
        plain = pts.join(
            pts.where(F.col("lat") > 0).select(
                "cell", F.col("url").alias("url_b")
            ),
            "cell",
        )
        assert j2.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_pages_a")
        spark.sql("DROP TABLE IF EXISTS bk_pages_b")


def test_knn_join_adaptive_expands_radius(spark):
    # base points far from the query: round-0 radius finds nothing,
    # expansion must still deliver k neighbors
    q, qx, qy = _cloud_df(spark, 5, 5, "qid")
    b, bx, by = _cloud_df(spark, 200, 6, "bid")
    k = 4
    got = S.knn_join_adaptive(q, b, k=k, radius=0.05, max_rounds=4).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["qid"], []).append((r["rank"], r["bid"]))
    for qi in range(5):
        ranked = sorted(per_q[qi])
        # compare against brute-force top-k within the final radius
        final_r = 0.05 * 4.0**3
        d = np.sqrt((bx - qx[qi]) ** 2 + (by - qy[qi]) ** 2)
        want = sorted([(float(d[i]), i) for i in range(200) if d[i] <= final_r])[:k]
        assert [bid for _rk, bid in ranked] == [i for _dd, i in want]


def test_point_in_polygon(spark):
    df, x, y = _cloud_df(spark, 500, 3, "id")
    # non-convex polygon (arrow shape)
    poly = [(-5.0, -5.0), (5.0, -5.0), (0.0, 0.0), (5.0, 5.0), (-5.0, 5.0)]
    got = S.point_in_polygon(df, poly).orderBy("id").toPandas()

    vx = np.array([p[0] for p in poly])
    vy = np.array([p[1] for p in poly])

    def ray_cast(px, py):
        inside = False
        j = len(vx) - 1
        for i in range(len(vx)):
            if (vy[i] > py) != (vy[j] > py):
                x_at = vx[i] + (py - vy[i]) * (vx[j] - vx[i]) / (vy[j] - vy[i])
                if px < x_at:
                    inside = not inside
            j = i
        return inside

    want = np.array([ray_cast(x[i], y[i]) for i in range(500)])
    np.testing.assert_array_equal(got["inside"].to_numpy(), want)
    assert want.sum() > 10  # sanity: polygon actually contains points

    # cell-cover path must agree exactly with the bbox+ray-cast path
    got_cover = (
        S.point_in_polygon(df, poly, cell_size=1.5).orderBy("id").toPandas()
    )
    np.testing.assert_array_equal(got_cover["inside"].to_numpy(), want)


def test_pip_cell_key_collision_guarded(spark):
    """The packed cell key folds cy modulo 2^21; a far-away point whose key
    collides with an interior cell must still be outside (bbox guard on the
    interior branch)."""
    poly = [(-5.0, -5.0), (5.0, -5.0), (5.0, 5.0), (-5.0, 5.0)]
    cs = 1.5
    interior, _ = S.polygon_cell_cover(poly, cs)
    assert interior, "need an interior cell for the scenario"
    icx, icy = sorted(interior)[0]
    # same cx, cy shifted by 2^21 → identical packed key, far outside bbox
    far_y = (icy + (1 << 21)) * cs + cs / 2.0
    rows = [(0, icx * cs + cs / 2.0, float(far_y))]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = S.point_in_polygon(df, poly, cell_size=cs).collect()
    assert out[0]["inside"] is False


def test_polygon_cell_cover_sound(spark):
    poly = [(-5.0, -5.0), (5.0, -5.0), (0.0, 0.0), (5.0, 5.0), (-5.0, 5.0)]
    interior, boundary = S.polygon_cell_cover(poly, 1.0)
    vx = np.array([p[0] for p in poly])
    vy = np.array([p[1] for p in poly])

    def ray_cast(px, py):
        inside = False
        j = len(vx) - 1
        for i in range(len(vx)):
            if (vy[i] > py) != (vy[j] > py):
                x_at = vx[i] + (py - vy[i]) * (vx[j] - vx[i]) / (vy[j] - vy[i])
                if px < x_at:
                    inside = not inside
            j = i
        return inside

    # every point of a fine sample inside an interior cell must be inside
    # the polygon; every inside point must fall in interior ∪ boundary
    rng = np.random.default_rng(5)
    xs = rng.uniform(-6, 6, 3000)
    ys = rng.uniform(-6, 6, 3000)
    for px, py in zip(xs, ys):
        cell = (int(np.floor(px / 1.0)), int(np.floor(py / 1.0)))
        inside = ray_cast(px, py)
        if cell in interior:
            assert inside
        elif cell not in boundary:
            assert not inside


def test_rasterize_tiles_dense_grids(spark):
    df, x, y = _cloud_df(spark, 300, 9, "id")
    from pyspark.sql import functions as F

    pts = df.withColumn("val", F.col("x") * 2.0)
    out = S.rasterize_tiles(pts, cell_size=2.0, value_col="val", tile_cells=4).collect()
    assert sum(r["n_points"] for r in out) == 300
    for r in out:
        grid = np.array(r["grid"], dtype=np.float64)
        assert grid.shape == (4, 4)
        # verify one populated cell against a direct average
        cx = np.floor(x / 2.0).astype(int)
        cy = np.floor(y / 2.0).astype(int)
        ix, iy = np.argwhere(~np.isnan(grid))[0]
        gx = r["tile_x"] * 4 + ix
        gy = r["tile_y"] * 4 + iy
        sel = (cx == gx) & (cy == gy)
        np.testing.assert_allclose(grid[ix, iy], np.mean(2.0 * x[sel]), rtol=1e-12)


def test_rasterize(spark):
    df, x, y = _cloud_df(spark, 200, 4, "id")
    from pyspark.sql import functions as F

    pts = df.withColumn("val", F.col("x") + F.col("y"))
    got = S.rasterize(pts, cell_size=5.0, value_col="val").collect()
    total = sum(r["n_points"] for r in got)
    assert total == 200
    for r in got:
        mask = (np.floor(x / 5.0) == r["tile_x"]) & (np.floor(y / 5.0) == r["tile_y"])
        np.testing.assert_allclose(r["value"], np.mean(x[mask] + y[mask]), rtol=1e-12)
