"""Headline benchmark: runs the engine's flagship operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (no collect bottleneck,
no scan pruning of the measured work).  The headline metric is the
variogram + kriging-join throughput in pages(rows)/sec per BASELINE.json;
`value` is total wall seconds across headline queries (unit: sec).

Scaling evidence (N vs 4N executors, sandbox substitution): run
``python tools/scaling.py`` which executes this file at local[8] and
local[32] and writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gstools_core_spark.functions import cells as C  # noqa: E402
from gstools_core_spark.functions import points as P  # noqa: E402
from gstools_core_spark.operators import spatial as S  # noqa: E402
from gstools_core_spark.operators import variogram as V  # noqa: E402
from gstools_core_spark.operators.dedup import minhash_dedup  # noqa: E402
from gstools_core_spark.operators.field import summate_field  # noqa: E402
from gstools_core_spark.operators.kriging import GaussianModel, krige  # noqa: E402
from gstools_core_spark.operators.similarity import cosine_topk  # noqa: E402
from gstools_core_spark.session import get_session  # noqa: E402
from gstools_core_spark.sources.pages import geocode, synthesize_pages  # noqa: E402

# HEAVY mode (scaling evidence): same INPUT, heavier per-row work so compute
# dominates the fixed per-query overhead (codegen compile, scheduling, AQE)
# that otherwise hides strong-scaling at small sf.
HEAVY = os.environ.get("SPARK_GRAFT_BENCH_HEAVY") == "1"

if HEAVY:
    BENCH_EDGES = [0.25 * i for i in range(13)]  # rmax 3.0 → ~36× the pairs
    BENCH_RADIUS = 1.0
    N_MODES = 20000
else:
    BENCH_EDGES = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5]
    BENCH_RADIUS = 0.5
    N_MODES = 1000

_rng = np.random.default_rng(19031977)
BMODES = _rng.normal(size=(2, N_MODES))
BZ1 = _rng.normal(size=N_MODES)
BZ2 = _rng.normal(size=N_MODES)


def _event_points(spark, sf_dir):
    # single small parquet file arrives as 1 partition; a 100 TB table would
    # have thousands — repartition so per-partition operators actually
    # parallelize the way they would at scale
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(64)
    return ev.select(
        F.col("event_id").alias("id"),
        P.x_col("event_id").alias("x"),
        P.y_col("event_id").alias("y"),
        F.col("value").alias("val"),
    )


def bench_variogram(spark, sf_dir):
    return V.variogram_unstructured(_event_points(spark, sf_dir), BENCH_EDGES)


def bench_variogram_directional(spark, sf_dir):
    return V.variogram_directional(
        _event_points(spark, sf_dir), BENCH_EDGES, [(1.0, 0.0), (0.0, 1.0)]
    )


def _synthetic_points(spark, n: int):
    """Hash-uniform point cloud in [-10, 10)² with a deterministic value —
    the HEAVY kriging workload's input (distributed generation, ~no
    coincident points; the parquet events table's LCG lattice would fold
    200k ids onto 2,000 distinct positions)."""
    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    u = lambda k: F.pmod(F.xxhash64(F.col("id"), F.lit(k)), F.lit(200_000)) / 10_000.0 - 10.0  # noqa: E731
    return df.select(
        F.col("id"),
        u(1).alias("x"),
        u(2).alias("y"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(1000)) / 500.0 - 1.0).alias("val"),
    )


def bench_krige(spark, sf_dir):
    model = GaussianModel(var=1.0, len_scale=0.3, nugget=0.01)
    if HEAVY:
        # scaling-evidence sizing (round 5): 200k synthesized points, 50%
        # conditioning, max_cond=1024 — every cell's 3×3 ring holds >1024
        # cond points (≈2,250), so each of the 400 cells pays a full
        # 1024-point bordered solve (~1.2 GFlop incl. the ~500-RHS
        # back-substitution).  At the previous 768/100k sizing the ~3 s
        # fixed term (plan/scan/codegen + cogroup spin-up) was ~21% of the
        # local[2] runtime and capped measurable 2→8 efficiency at ~0.75
        # even with a perfectly parallel kernel; this sizing puts the
        # parallel part ≥ 10× the fixed term.  gc=1 (fine cells): 400
        # uniform ~0.13 s groups hash into the 64 shuffle partitions with
        # lower relative load variance than 100 gc=2 super-groups — the
        # straggler tail is the binding constraint at 8 cores (measured
        # one-JVM interleaved: gc=1 12.6/37.7 s vs gc=2 14.7/43.5 s at
        # 8/2 cores), and dispatch cost is noise at these solve sizes.
        pts = _synthetic_points(spark, 200_000)
        cond = pts.where(F.col("id") % 2 == 0)
        return krige(
            pts, cond, model, radius=BENCH_RADIUS, method="ordinary",
            max_cond=1024, group_cells=1,
        )
    pts = _event_points(spark, sf_dir)
    cond = pts.where(F.col("id") % 10 == 0)
    # group_cells from table stats (1,600 uniform cells of ~62 targets).
    # Default load: 8 → 25 super-groups — the per-group Arrow/pandas
    # dispatch is near-serial, so at sf0.1 group sizes the dispatch floor
    # dominates the 2-groups/core balance rule (measured one-JVM: gc=1
    # 9.9 s, auto/5 4.4 s, 8 3.3 s).  Passing the int also skips
    # auto's stats pass — production sizes it from stored table stats
    # the same way.
    return krige(
        pts, cond, model, radius=BENCH_RADIUS, method="ordinary",
        max_cond=256, group_cells=8,
    )


def bench_krige_knn(spark, sf_dir):
    """Per-target moving-window kriging: the exact-neighborhood path —
    more solves than the shared per-cell neighborhood, batched per
    (cell, size) group.  HEAVY raises knn 16→64 (65×65 bordered solves,
    ~70× the flops): at knn=16 the whole query was ~6 s at local[2] and
    the ~2 s fixed overhead drowned the strong-scaling signal (measured
    eff 0.50 with an Amdahl fixed term of ~2 s — workload sizing, not a
    plan defect; the r4 re-measure at knn=64 shows the parallel part)."""
    pts = _event_points(spark, sf_dir)
    cond = pts.where(F.col("id") % (2 if HEAVY else 10) == 0)
    model = GaussianModel(var=1.0, len_scale=0.3, nugget=0.01)
    return krige(
        pts, cond, model, radius=BENCH_RADIUS, method="ordinary",
        knn=64 if HEAVY else 16,
        # same uniform 1,600-cell grid as bench_krige → same stats-derived
        # grouping factors (see the note there)
        group_cells=2 if HEAVY else 8,
    )


def bench_knn(spark, sf_dir):
    pts = _event_points(spark, sf_dir)
    q = pts.where(F.col("id") % 10 == 0)
    return S.knn_join(q, pts, k=5, radius=BENCH_RADIUS, query_id="id", base_id="id")


def bench_summate(spark, sf_dir):
    return summate_field(_event_points(spark, sf_dir), BMODES, BZ1, BZ2)


def bench_pages_tiles(spark, sf_dir):
    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    pages = geocode(synthesize_pages(spark, n))
    return (
        pages.withColumn("cell_id", C.geo_cell_col(F.col("lat"), F.col("lon"), 8))
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_pages"), F.avg(F.length("text")).alias("mean_len"))
    )


def _synthetic_docs(spark, n: int):
    """Deterministic mostly-unique corpus: each word drawn INDEPENDENTLY
    per (doc, position) via xxhash64 — unlike sources.pages.synthesize_pages,
    whose arithmetic-progression text yields only 48 distinct cyclic word
    sequences (every residue class is mutually near-duplicate: feeding it
    to minhash explodes to ~n²/48 candidate pairs — measured: 200k pages
    ran >9 min).  Here cross-doc Jaccard is tiny, so the bench measures
    signature + banding throughput, not a degenerate dup cluster."""
    from gstools_core_spark.sources.pages import WORDS

    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    words_arr = F.array(*[F.lit(w) for w in WORDS])
    n_words = 20 + F.pmod(F.col("id") * 7, F.lit(80))
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda k: F.element_at(
                words_arr,
                (F.pmod(F.xxhash64(F.col("id"), k), F.lit(len(WORDS))) + 1).cast("int"),
            ),
        ),
    )
    return df.select(F.col("id").alias("doc_id"), text.alias("text"))


def bench_minhash(spark, sf_dir):
    if HEAVY:
        # the parquet corpus at sf0.1 is ~5k docs — seconds of work that
        # fixed overhead swamps at any parallelism.  The HEAVY (scaling-
        # evidence) workload runs the SAME operator over 500k synthesized
        # docs so the per-row signature compute + band join dominate.
        docs = _synthetic_docs(spark, 500_000)
    else:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
            spark.sparkContext.defaultParallelism
        )
    # hash_fn="xx": the production fast path (JVM xxhash64); the portable
    # md5 default exists only for DuckDB-oracle differential testability
    return minhash_dedup(
        docs, "text", "doc_id", threshold=0.5, num_hashes=32, bands=8,
        shingle_k=3, hash_fn="xx",
    )


def bench_pages_krige_raster(spark, sf_dir):
    """The north-star chain end-to-end: Common-Crawl-style pages →
    deterministic geocode → quality signal → ordinary kriging of the
    quality surface from a conditioning subsample → rasterized tile
    grids.  Every stage is the scale-path operator (distributed synthesis,
    column-expression geocode, cogrouped kriging, applyInPandas rasters)."""
    from gstools_core_spark.functions import text as T
    from gstools_core_spark.operators.spatial import rasterize_tiles

    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    pages = geocode(synthesize_pages(spark, n))
    # materialize the geocoded/scored points ONCE: at scale this table is
    # the stored Iceberg input (north rule) — without it the cogroup's two
    # sides and the radius aggregates each re-run the synthesize+geocode+
    # quality expression tree (~2.8 s at sf0.1 since the ANSI-safe
    # xxhash-per-position synthesis, round-4 regression attribution)
    pts = (
        pages.select(
            F.xxhash64("url").alias("id"),
            F.col("lon").alias("x"),
            F.col("lat").alias("y"),
            T.quality_score(F.col("text")).alias("val"),
        )
        .localCheckpoint(eager=True)
    )
    cond = pts.where(F.pmod(F.col("id"), F.lit(10)) == 0)
    model = GaussianModel(var=1.0, len_scale=5.0, nugget=0.01)
    # 273 occupied 5°-cells (table stats); round-5 interleaved A/B at 32
    # cores: gc=2 (≈68 groups, ~2/core) 3.5-5.9 s vs the old gc=8
    # (≈12 groups — 20 idle cores) 4.7-7.0 s vs gc=2+salt 5.5-9.4 s —
    # moderate grouping sheds the per-group dispatch without starving
    # cores, and salting does NOT pay here: the shared-neighborhood
    # max_cond=256 solves are cheap, so splitting the 3.5k-target cells
    # saves less than the cond-ring replication costs (contrast the
    # knn sphere query below, where per-target solves make the big cell
    # a real straggler)
    kriged = krige(
        pts, cond, model, radius=5.0, method="ordinary", max_cond=256,
        group_cells=2,
    )
    return rasterize_tiles(kriged, cell_size=2.0, value_col="krige_mean", tile_cells=8)


def bench_pages_geo_krige(spark, sf_dir):
    """Sphere path of the north-star chain: geocoded pages → HAVERSINE
    moving-window kriging of the quality surface.  Wrapped-lon blocking,
    central-angle radius, per-target k-nearest solves; the lang-skewed
    geocoder concentrates pages in hot cells, so this also exercises the
    skew path under AQE."""
    from gstools_core_spark.functions import text as T

    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    pages = geocode(synthesize_pages(spark, n))
    # one materialization of the geocoded table (see bench_pages_krige_raster
    # note); max_abs_lat from the geocoder's construction (|lat| ≤ 61°:
    # en region center 39° + spread 22°) skips the max(|lat|) aggregate —
    # at scale that bound comes from table stats
    pts = (
        pages.select(
            F.xxhash64("url").alias("id"),
            "lat",
            "lon",
            T.quality_score(F.col("text")).alias("val"),
        )
        .localCheckpoint(eager=True)
    )
    cond = pts.where(F.pmod(F.col("id"), F.lit(10)) == 0)
    model = GaussianModel(var=1.0, len_scale=0.05, nugget=0.01)
    return krige(
        pts,
        cond,
        model,
        radius=0.05,
        method="ordinary",
        coords=("lat", "lon"),
        knn=16,
        haversine=True,
        max_abs_lat=61.0,
        # production skew protection with the fair-share auto threshold
        # (hot = cell count > total/shuffle_partitions): at sf0.1 this
        # splits the lang-skewed 3,090-target city cell — the serial tail
        # that bounded the whole stage (measured one-JVM: threshold 50k
        # (nothing hot, machinery skipped) 10.1 s vs auto/1000 5.2 s);
        # at 100× both the numerator and the partition count grow, so the
        # rule keeps splitting exactly the straggler cells
        salt_hot=8,
        # explicit fine cells — the stats-known production choice at this
        # density.  Quiet-window interleaved A/B (round 5): gc=1
        # 5.9-7.0 s vs auto's hybrid 9.2-9.9 s — the hybrid's grouped
        # cold tail merges MID-density cells (500-1000 targets) near the
        # hot region into straggler super-groups, and its stats pass adds
        # eager jobs.  Round 4's 4/4 auto-wins were measured in busy
        # windows where per-group dispatch dominated; in quiet windows
        # the kernel dominates and fine granularity packs the 64 shuffle
        # partitions with less variance (the HEAVY-krige gc=1 finding).
        # 'auto' stays the right no-stats default; jobs that know their
        # density pass the int.
        group_cells=1,
    )


def _synthetic_embeddings(spark, n: int, dim: int = 64):
    """Deterministic dense vectors (xxhash-derived uniforms in [-1, 1)) —
    distributed generation, no driver-side data."""
    df = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda k: (
            F.pmod(F.xxhash64(F.col("id"), k), F.lit(100_000)) / 50_000.0 - 1.0
        ).cast("float"),
    )
    return df.select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def bench_ann(spark, sf_dir):
    if HEAVY:
        # sf0.1 ships only 2k embedding vectors; the HEAVY workload runs
        # the same broadcast-matmul top-k over 200k synthesized vectors ×
        # 10k queries (~128 GMAC of BLAS) so compute dominates.
        emb = _synthetic_embeddings(spark, 200_000)
        q = emb.where(F.col("vec_id") % 20 == 0)
    else:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.where(F.col("vec_id") % 10 == 0)
    return cosine_topk(q, emb, k=10, query_id="vec_id", base_id="vec_id")


def calib_jvm_scan(spark, sf_dir):
    """Window-speed calibration probe #1: pure-JVM whole-stage-codegen
    arithmetic over a range — no Python workers, no shuffle, no disk.  Its
    wall time tracks the host window's CPU/steal speed, so two bench runs
    from different windows can be ratio-normalized (round-4 residual: the
    driver window ran every query 1.2-2.3× the builder's quiet window and
    the per-query numbers alone could not prove which regressions were
    host noise)."""
    # ~3 s at local[32] on a quiet host — long enough that the best-of-3
    # ratio between two windows is meaningful.  Env override exists for the
    # smoke test: limit(5) above a global agg bounds nothing, so the full
    # scan would run there.
    n = int(os.environ.get("SPARK_GRAFT_CALIB_ROWS", 12_000_000_000))
    return spark.range(0, n, 1, spark.sparkContext.defaultParallelism).select(
        F.sum((F.col("id") % 7) * 3 + 1).alias("s")
    )


def calib_pandas_cogroup(spark, sf_dir):
    """Calibration probe #2: trivial-kernel pandas cogroup over ~1000
    groups — measures the Arrow/pandas per-group dispatch cost (near-serial
    ~3 ms/group on a quiet host), the fixed term that dominates the
    cogrouped kriging paths' sensitivity to host noise."""
    a = spark.range(0, 4000, 1, 32).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    b = spark.range(0, 4000, 1, 32).select(
        (F.col("id") % 1000).alias("k"), (F.col("id") * 2).alias("v")
    )
    return (
        a.groupBy("k")
        .cogroup(b.groupBy("k"))
        .applyInPandas(lambda left, right: left, "k long, v long")
    )


# fixed-cost probes measured per full run (same fresh-JVM best-of-3
# protocol as the queries) and recorded alongside them — NOT part of the
# benchmark metric
CALIB = {
    "_calib_jvm_scan": calib_jvm_scan,
    "_calib_pandas_cogroup": calib_pandas_cogroup,
}

# headline (north-rule throughput) queries run FIRST on the clean JVM
QUERIES = {
    "variogram": bench_variogram,
    "krige": bench_krige,
    "variogram_directional": bench_variogram_directional,
    "krige_knn": bench_krige_knn,
    "knn": bench_knn,
    "summate": bench_summate,
    "pages_tiles": bench_pages_tiles,
    "pages_krige_raster": bench_pages_krige_raster,
    "pages_geo_krige": bench_pages_geo_krige,
    "minhash_dedup": bench_minhash,
    "ann_topk": bench_ann,
}

# the two north-rule throughput queries (pages/sec numerator = input rows)
HEADLINE = ("variogram", "krige")


def _run_in_process(names, sf_dir, cpus) -> dict:
    """Run the named queries in THIS process's JVM; returns name → best s."""
    # local mode shares one JVM heap across "executors": size it so the
    # pair-join shuffles don't live under constant GC pressure; identical
    # task granularity at every parallelism level (scaling runs compare
    # local[8] vs local[32]: same partition count → same task sizes)
    spark = get_session(
        "gstools-core-spark-bench",
        cores=cpus,
        shuffle_partitions=64,
        memory_gb=48,
    )
    # warm the Python-worker pool + Arrow path ONCE before any timing: the
    # first pandas-UDF job in a fresh JVM pays ~15 s of worker fork/import
    # cost that a long-lived cluster amortizes — without this, best-of-2
    # leaves only ONE informative rep and any host burst during it records
    # a phantom regression (diagnosed round 3: krige 4.0 s steady-state was
    # recorded as 5.4-9.6 s across rounds purely from this).
    spark.range(0, cpus * 4, 1, cpus).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    times = {}
    for name in names:
        fn = QUERIES.get(name) or CALIB[name]
        # best-of-3 for EVERY query: with the pool warm every rep measures
        # the plan; the min rides out host bursts (round-4 attribution saw
        # same-query quiet-window reps span 8.5-25.4 s — two reps leave a
        # coin-flip chance both land in a burst).
        reps = 3
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            # successive queries in one local JVM degrade without this
            # (fragmented old-gen from the previous query's shuffle buffers)
            spark.sparkContext._jvm.System.gc()
        times[name] = round(best, 3)
    spark.stop()
    return times


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    names = subset.split(",") if subset else list(QUERIES)

    calib = {}
    if os.environ.get("SPARK_GRAFT_BENCH_CHILD") == "1" or len(names) == 1:
        times = _run_in_process(names, sf_dir, cpus)
    else:
        # one FRESH JVM per query: same-JVM degradation across successive
        # heavy queries measured up to ~7× on the later queries (old-gen
        # fragmentation System.gc() does not fully reclaim) — per-query
        # subprocesses make the numbers reflect the plans, not the heap
        # history.  ~8 s JVM startup per query is outside the timed window.
        import subprocess
        import sys as _sys

        def _child(name: str) -> float:
            env = dict(
                os.environ,
                SPARK_GRAFT_BENCH_QUERIES=name,
                SPARK_GRAFT_BENCH_CHILD="1",
            )
            out = subprocess.run(
                [_sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
            )
            if out.returncode != 0:
                # surface the child's Spark stack trace — a bare
                # CalledProcessError hides the only diagnostic there is
                _sys.stderr.write(out.stderr[-8000:])
                raise RuntimeError(
                    f"bench child for {name!r} exited {out.returncode} "
                    "(stderr above)"
                )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            return json.loads(line)["queries"][name]

        # calibration FIRST on FULL runs: the fixed-cost probes stamp the
        # window's speed before any query runs (so a mid-run host burst
        # can't make the probes vouch for numbers they didn't share a
        # window with); subset invocations are ad-hoc A/Bs that should not
        # pay ~1 min of probe JVMs for a record that is never written
        if not subset:
            calib = {name: _child(name) for name in CALIB}
        times = {name: _child(name) for name in names}

    import duckdb

    n_rows = duckdb.sql(
        f"select count(*) from read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]

    headline = [n for n in HEADLINE if n in times]
    total = sum(times[n] for n in headline) or sum(times.values())
    pages_per_sec = round(n_rows * len(headline) / total, 1) if headline else None

    try:  # "…/sf0.1" → 0.1; a dir not named that way must not throw away
        sf = float(sf_dir.rstrip("/").split("sf")[-1])  # the finished run
    except ValueError:
        sf = None

    # pin the protocol + per-query record so round-over-round diffs compare
    # like with like (r1 in-sequence → r2 best-of-2 same-JVM → r3+
    # fresh-JVM-per-query best-of-2 with Python-worker pool warmup; the r3
    # "regressions" were un-attributable because only the aggregate line
    # was committed).  Every full run writes a TIMESTAMPED record; the
    # committed canonical BENCH_QUERIES.json is updated ONLY under
    # SPARK_GRAFT_RECORD=1 — round 4's driver run silently overwrote the
    # builder's quiet-window record in the working tree, defeating the
    # file's whole purpose.
    if not subset:  # full runs only — partial runs would skew the record
        record = {
            "protocol": "fresh JVM per query, Python-worker pool warmup, "
            "best of 3 in-JVM reps, System.gc() between reps; "
            "calib = fixed-cost window probes (JVM codegen scan, "
            "1000-group trivial pandas cogroup) measured first under the "
            "same protocol — ratio two runs' calib values to normalize "
            "host-window speed before comparing query times",
            "queries": times,
            "calib": calib,
            "sf": sf,
            "cpus": cpus,
            "heavy": HEAVY,
            "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        here = os.path.dirname(os.path.abspath(__file__))
        if os.environ.get("SPARK_GRAFT_RECORD") == "1":
            run_dir = os.path.join(here, "bench_runs")
            with open(os.path.join(here, "BENCH_QUERIES.json"), "w") as f:
                json.dump(record, f, indent=1)
        else:
            run_dir = "/tmp/spark_graft_bench_runs"
        os.makedirs(run_dir, exist_ok=True)
        stamp = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
        with open(os.path.join(run_dir, f"run_{stamp}.json"), "w") as f:
            json.dump(record, f, indent=1)

    print(
        json.dumps(
            {
                "metric": "variogram_krige_throughput",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "calib": calib,
                "sf": sf,
                "cpus": cpus,
                "input_rows": n_rows,
                "pages_per_sec": pages_per_sec,
            }
        )
    )


if __name__ == "__main__":
    main()
