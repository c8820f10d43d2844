"""Ops-hardening tests: checkpoint/resume, per-cell metrics, byte-identical
text invariant, deterministic geocoding/tiling, streaming windows,
multimodal plumbing."""

import hashlib

import pytest
from pyspark.sql import functions as F

from gstools_core_spark.functions import cells as C
from gstools_core_spark.operators.checkpoint import CheckpointedRun, emit_cell_metrics
from gstools_core_spark.operators.multimodal import extract_features, sample_frames, synthesize_media
from gstools_core_spark.sources.pages import geocode, synthesize_pages


def test_checkpoint_resume(spark, tmp_path):
    src = spark.range(1000).withColumn("val", F.col("id") * 2)
    run = CheckpointedRun(str(tmp_path / "out"), n_buckets=8)

    def transform(df):
        return df.withColumn("val3", F.col("val") * 3)

    with pytest.raises(RuntimeError, match="injected failure"):
        run.run(src, transform, "id", fail_after=3)
    assert len(run.completed_buckets()) == 3

    # resume: only the remaining 5 buckets are processed, none re-done
    stats = run.run(src, transform, "id")
    assert stats["buckets_processed"] == 5
    assert stats["buckets_skipped"] == 3

    out = run.read_output(spark)
    assert out.count() == 1000
    assert out.select(F.sum("val3")).collect()[0][0] == sum(i * 6 for i in range(1000))

    # idempotent: a third run does nothing
    stats2 = run.run(src, transform, "id")
    assert stats2["buckets_processed"] == 0


def test_cell_metrics(spark, tmp_path):
    pages = geocode(synthesize_pages(spark, 500))
    tiled = pages.withColumn(
        "cell_id", C.geo_cell_col(F.col("lat"), F.col("lon"), 4)
    )
    metrics = emit_cell_metrics(tiled, "cell_id", str(tmp_path / "metrics"), "lat")
    back = spark.read.json(str(tmp_path / "metrics"))
    assert back.select(F.sum("n_rows")).collect()[0][0] == 500
    assert metrics.count() == back.count()


def test_pair_metrics(spark, tmp_path):
    from gstools_core_spark.operators.checkpoint import emit_pair_metrics
    from pyspark.sql import functions as F
    import numpy as np

    rng = np.random.default_rng(12)
    xy = rng.uniform(-5, 5, size=(400, 2))
    rows = [(i, float(xy[i, 0]), float(xy[i, 1])) for i in range(400)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    metrics = emit_pair_metrics(pts, 1.0, str(tmp_path / "pm"))
    total = metrics.agg(F.sum("n_pairs")).collect()[0][0]
    ii, jj = np.triu_indices(400, k=1)
    d = np.sqrt(np.sum((xy[ii] - xy[jj]) ** 2, axis=1))
    assert total == int((d < 1.0).sum())
    back = spark.read.json(str(tmp_path / "pm"))
    assert back.count() == metrics.count()


def test_text_byte_identical_through_pipeline(spark):
    """North-rule invariant: `text` passes through untouched per url."""
    pages = synthesize_pages(spark, 300)
    before = {
        r["url"]: hashlib.sha256(r["text"].encode()).hexdigest()
        for r in pages.select("url", "text").collect()
    }
    piped = geocode(pages).withColumn(
        "cell_id", C.geo_cell_col(F.col("lat"), F.col("lon"), 6)
    ).withColumn("n_chars", F.length("text"))
    after = {
        r["url"]: hashlib.sha256(r["text"].encode()).hexdigest()
        for r in piped.select("url", "text").collect()
    }
    assert before == after


def test_geocode_tile_assignment_deterministic(spark):
    """Same pages → exactly the same (lat, lon, cell) on every evaluation."""
    p1 = geocode(synthesize_pages(spark, 400)).withColumn(
        "cell_id", C.geo_cell_col(F.col("lat"), F.col("lon"), 8)
    )
    p2 = geocode(synthesize_pages(spark, 400)).withColumn(
        "cell_id", C.geo_cell_col(F.col("lat"), F.col("lon"), 8)
    )
    a = {r["url"]: (r["lat"], r["lon"], r["cell_id"]) for r in p1.collect()}
    b = {r["url"]: (r["lat"], r["lon"], r["cell_id"]) for r in p2.collect()}
    assert a == b
    # lat/lon bounded
    assert all(-90 <= v[0] <= 90 and -180 <= v[1] <= 180 for v in a.values())


def test_pages_lang_skew(spark):
    pages = synthesize_pages(spark, 2000)
    counts = {r["lang"]: r["n"] for r in pages.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] > 0.4 * 2000  # skewed head exercises hot cells
    assert set(counts) == {"en", "de", "fr", "es", "pt", "zh"}


def test_streaming_windowed_matches_batch(spark, sf_dir):
    from gstools_core_spark.streaming.events import windowed_event_stats

    got = windowed_event_stats(spark, f"{sf_dir}/events.parquet", "1 hour", "2 hours")
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("value_sum"))
    )
    g = {(str(r["window_start"]), r["event_type"]): (r["n_events"], r["value_sum"]) for r in got.collect()}
    b = {(str(r["window_start"]), r["event_type"]): (r["n_events"], r["value_sum"]) for r in batch.collect()}
    assert g == b


def test_streaming_dedup_drops_redelivered(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark over an at-least-once source: the same
    events delivered twice (two source files) come out exactly once, equal
    to the batch distinct-by-key set."""
    import shutil

    from gstools_core_spark.streaming.events import streaming_dedup

    src = tmp_path / "dup_events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")

    got = streaming_dedup(spark, str(src), keys=("event_id",))
    n_src = spark.read.parquet(str(src)).count()
    batch_ids = {
        r["event_id"]
        for r in spark.read.parquet(str(src)).select("event_id").distinct().collect()
    }
    got_ids = [r["event_id"] for r in got.select("event_id").collect()]
    assert n_src == 2 * len(batch_ids)  # the source really is duplicated
    assert len(got_ids) == len(set(got_ids))  # no duplicate survives
    assert set(got_ids) == batch_ids


def test_stateful_streaming_sessions(spark, sf_dir):
    """applyInPandasWithState sessionization == batch-computed closed
    sessions (the open tail session per user stays in state)."""
    from gstools_core_spark.streaming.events import stateful_user_sessions

    got = stateful_user_sessions(spark, f"{sf_dir}/events.parquet", gap_minutes=30)
    got_set = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in got.collect()
    }

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts").toPandas()
    pdf["us"] = pdf["ts"].astype("datetime64[us]").astype("int64")
    gap = 30 * 60 * 1_000_000
    want = set()
    for uid, grp in pdf.groupby("user_id"):
        ts = sorted(grp["us"])
        start, last, cnt = None, None, 0
        for t in ts:
            if last is not None and t - last > gap:
                want.add((uid, start, last, cnt))
                start, cnt = t, 0
            if start is None:
                start = t
            last = t
            cnt += 1
        # final session remains open → not emitted
    assert got_set == want
    assert len(want) > 0


def test_streaming_variogram_matches_kernel(spark, sf_dir, tmp_path):
    """Stream-stream self-join variogram == the golden numpy kernel run
    per window on the same points, for every window the watermark closed.
    Source is split into time-ordered files (one per micro-batch) — the
    realistic ingestion shape; append mode then emits progressively."""
    import numpy as np

    from gstools_core_spark import kernels as K
    from gstools_core_spark.functions import points as P
    from gstools_core_spark.streaming.variogram import streaming_variogram

    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    # 8 contiguous time ranges, one file per arrival epoch, mtimes ascending
    # (the file stream source orders batches by modification time)
    src = str(tmp_path / "ordered_events")
    os.makedirs(src)
    pdf_all = spark.read.parquet(f"{sf_dir}/events.parquet").orderBy("ts").toPandas()
    pdf_all["ts"] = pdf_all["ts"].astype("datetime64[us]")  # Spark can't read NANOS
    step = (len(pdf_all) + 7) // 8
    for i in range(8):
        f = f"{src}/part-{i:02d}.parquet"
        pq.write_table(pa.Table.from_pandas(pdf_all.iloc[i * step : (i + 1) * step]), f)
        os.utime(f, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))

    # first edge > 0: pairs closer than edges[0] must be EXCLUDED, exactly
    # as the kernel's in_range lower bound does (regression: the streaming
    # path once binned sub-first-edge pairs into bin 0)
    edges = [1.0, 2.0, 4.0, 6.0]
    got = streaming_variogram(
        spark, src, edges, window="1 day", watermark="2 hours"
    )
    rows = got.collect()
    assert len(rows) > 0

    pdf = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("w"),
            P.x_col("event_id").alias("x"),
            P.y_col("event_id").alias("y"),
            F.col("value").alias("val"),
        )
        .toPandas()
    )
    want = {}
    for w, grp in pdf.groupby("w"):
        pos = np.vstack([grp["x"].to_numpy(), grp["y"].to_numpy()])
        gamma, counts = K.variogram_unstructured(
            grp["val"].to_numpy()[None, :], np.array(edges), pos
        )
        for b in range(len(edges) - 1):
            if counts[b] > 0:
                want[(str(w), b)] = (gamma[b], int(counts[b]))

    for r in rows:
        key = (str(r["window_start"]), r["bin_id"])
        assert key in want, key
        g, n = want[key]
        assert r["n_pairs"] == n
        np.testing.assert_allclose(r["gamma"], g, rtol=1e-12)
    # the stream must have closed (and emitted) most windows
    assert len(rows) > 0.5 * len(want)


def test_multimodal_plumbing(spark):
    media = synthesize_media(spark, 60)
    feats = extract_features(media, feature_dim=8, mode="fake")
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r["features"]) == 8 for r in rows)
    # deterministic
    again = {r["media_id"]: r["features"] for r in extract_features(media, 8, "fake").collect()}
    assert all(again[r["media_id"]] == r["features"] for r in rows)

    frames = sample_frames(media, every_n=24)
    vid = media.where(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == vid

    with pytest.raises(Exception, match="NotImplementedError|real decode"):
        extract_features(media, 8, "real").collect()


def test_multimodal_features_bitwise_vs_rowwise(spark):
    """The Arrow-offsets vectorized fake decode must reproduce the original
    per-row numpy form bit for bit (the multimodal_features oracle hashes
    these doubles), including ragged edge cases: payload shorter than dim
    (all-padding tail chunks) and length not divisible by dim."""
    import numpy as np

    payloads = [
        b"MEDIA" + b"x" * 64,        # the synthesized shape
        b"abc",                       # L < dim: tail chunks are pure padding
        b"0123456789" * 7 + b"zz",    # L % dim != 0
        b"\xff" * 37,
        b"a",
    ]
    rows = [(i, "image", p) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {
        r["media_id"]: r["features"]
        for r in extract_features(df, feature_dim=16, mode="fake").collect()
    }
    dim = 16
    for i, p in enumerate(payloads):
        b = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
        pad = (-len(b)) % dim
        want = (np.pad(b, (0, pad)).reshape(dim, -1).mean(axis=1) / 255.0).tolist()
        assert got[i] == want, (i, got[i], want)


def test_checkpoint_detects_stale_source(spark, tmp_path):
    """Markers carry an input fingerprint; resuming after the source
    changed reprocesses exactly the buckets whose input differs."""
    import json

    src = spark.range(500).withColumn("val", F.col("id") * 2)
    run = CheckpointedRun(str(tmp_path / "out"), n_buckets=4)

    def transform(df):
        return df.withColumn("val3", F.col("val") * 3)

    run.run(src, transform, "id")
    marker = json.loads((tmp_path / "out" / "_COMPLETED_0").read_text())
    assert "input_rows" in marker and "input_hash" in marker

    # same source: everything skipped
    stats = run.run(src, transform, "id")
    assert stats["buckets_processed"] == 0 and stats["buckets_stale"] == 0

    # grown source: every bucket's fingerprint changes -> all reprocessed
    src2 = spark.range(600).withColumn("val", F.col("id") * 2)
    stats2 = run.run(src2, transform, "id")
    assert stats2["buckets_stale"] == 4
    assert run.read_output(spark).count() == 600

    # verify_input=False trusts the markers (no reprocessing)
    src3 = spark.range(700).withColumn("val", F.col("id") * 2)
    stats3 = run.run(src3, transform, "id", verify_input=False)
    assert stats3["buckets_processed"] == 0


def test_checkpoint_scans_source_twice_not_per_bucket(spark, tmp_path):
    """The run must read the source exactly TWICE regardless of B (one
    fingerprint scan + one staging scan): the old per-bucket
    ``where(pmod(...) == b)`` form rescanned the full source B times (the
    pmod predicate prunes nothing — 16 full scans at 100 TB).  Instrumented
    with an accumulator counting every row that passes through the source."""
    B = 8
    n = 400
    acc = spark.sparkContext.accumulator(0)

    def count_rows(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    base = spark.range(n).withColumn("val", F.col("id") * 2)
    src = base.mapInPandas(count_rows, base.schema)
    run = CheckpointedRun(str(tmp_path / "out"), n_buckets=B)
    stats = run.run(src, lambda d: d.withColumn("v3", F.col("val") * 3), "id")
    assert stats["buckets_processed"] == B
    assert run.read_output(spark).count() == n
    # fingerprint scan + staging scan = 2n rows; the per-bucket form reads
    # (1 + B) * n.  Allow one extra scan of slack for engine-internal
    # re-evaluation, never B of them.
    assert acc.value <= 3 * n, acc.value


def test_checkpoint_empty_source(spark, tmp_path):
    """All pending buckets empty: the staging parquet has no data files, so
    the run must take the fingerprint-decided empty-frame path (never a
    read-failure fallback) and still write all B markers with 0 rows."""
    src = spark.range(0).withColumn("val", F.col("id") * 2)
    run = CheckpointedRun(str(tmp_path / "out"), n_buckets=4)
    stats = run.run(src, lambda d: d, "id")
    assert stats["buckets_processed"] == 4
    assert stats["rows_written"] == 0
    assert len(run.completed_buckets()) == 4
    # idempotent resume on the empty source
    stats2 = run.run(src, lambda d: d, "id")
    assert stats2["buckets_processed"] == 0


def test_checkpoint_mid_run_mutation_fails_loudly(spark, tmp_path):
    """A source whose rows change between the fingerprint scan and the
    staging scan must fail the run LOUDLY (the staging write's row-count
    observation vs the fingerprint totals): silently checkpointing a
    snapshot the markers don't describe becomes permanent drift under
    verify_input=False resumes.  The mutation is simulated with a
    nondeterministic filter UDF gated on a flag file the first scan
    creates at its last row."""
    flag = tmp_path / "mutated_flag"

    @F.udf("boolean")
    def first_scan_only(k):
        if flag.exists():
            return False
        if k == 19:
            flag.touch()
        return True

    src = (
        spark.range(20)
        .coalesce(1)  # sequential evaluation: the flag flips between scans,
        # never mid-scan
        .select(F.col("id").alias("k"))
        .where(first_scan_only.asNondeterministic()(F.col("k")))
    )
    cp = CheckpointedRun(str(tmp_path / "out"), n_buckets=4)
    with pytest.raises(RuntimeError, match="mutated mid-run"):
        cp.run(src, lambda df: df, "k")
    # the failure path removed its (per-run unique) staging scratch
    assert not list((tmp_path / "out").glob("_staging*"))


def test_checkpoint_fingerprint_catches_even_multiplicity_swap(spark, tmp_path):
    """XOR alone is blind to even-multiplicity changes (xx(K)^xx(K) = 0):
    a twice-delivered key K replaced by a twice-delivered K' in the same
    bucket keeps count and XOR identical — the decimal-sum component must
    still flag the bucket stale."""
    n_buckets = 4
    rows = spark.range(64).select(
        "id", F.pmod(F.xxhash64("id"), F.lit(n_buckets)).alias("b")
    ).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["b"], []).append(r["id"])
    k1, k2 = next(v[:2] for v in by_bucket.values() if len(v) >= 2)

    src = spark.createDataFrame([(k1,), (k1,)], "id long")
    run = CheckpointedRun(str(tmp_path / "out"), n_buckets=n_buckets)
    run.run(src, lambda d: d, "id")

    src2 = spark.createDataFrame([(k2,), (k2,)], "id long")
    stats = run.run(src2, lambda d: d, "id")
    assert stats["buckets_stale"] == 1
    assert {r["id"] for r in run.read_output(spark).collect()} == {k2}


def test_stateful_sessions_out_of_order_batches(spark, tmp_path):
    """Events split across files so availableNow delivers multiple
    micro-batches, with a later file carrying EARLIER timestamps for the
    same user: the pending-buffer state must still produce the batch-sort
    sessionization (ADVICE r1: the old running-(start,last,cnt) state
    diverged here)."""
    import pandas as pd
    from gstools_core_spark.streaming.events import stateful_user_sessions

    base = pd.Timestamp("2025-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    # user 7: one true session [0,10] min, delivered out of order across
    # files; plus a far-future event (t=10h) that closes it
    f1 = [(7, base + 5 * m, "c", 1.0), (7, base + 10 * m, "c", 1.0),
          (7, base + 600 * m, "c", 1.0)]
    f2 = [(7, base + 0 * m, "c", 1.0), (7, base + 7 * m, "c", 1.0)]
    d = tmp_path / "ooo_events"
    d.mkdir()
    cols = ["user_id", "ts", "event_type", "value"]
    spark.createDataFrame(pd.DataFrame(f1, columns=cols)).coalesce(1).write.parquet(str(d / "p1"))
    spark.createDataFrame(pd.DataFrame(f2, columns=cols)).coalesce(1).write.parquet(str(d / "p2"))
    # flatten into one directory of files so maxFilesPerTrigger batches them
    import shutil, glob
    for i, f in enumerate(sorted(glob.glob(str(d / "p*" / "*.parquet")))):
        shutil.copy(f, str(d / f"part-{i}.parquet"))
    shutil.rmtree(d / "p1"); shutil.rmtree(d / "p2")

    got = stateful_user_sessions(
        spark, str(d), gap_minutes=30, allowed_lateness_minutes=60
    )
    rows = {(r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
            for r in got.collect()}
    start_us = base.value // 1000
    end_us = (base + 10 * m).value // 1000
    assert (7, start_us, end_us, 4) in rows, rows


def test_catalog_dispatch(spark, sf_dir, tmp_path):
    """read_table/write_table: paths → parquet; dotted names → session
    catalog (Iceberg's interface; exercised here via a temp view since the
    sandbox has no Iceberg jar — the dispatch and the parquet round-trip
    are what this engine owns)."""
    from gstools_core_spark.sources.catalog import (
        is_table_identifier,
        read_table,
        write_table,
    )

    assert is_table_identifier("warehouse.db.pages")
    assert not is_table_identifier("/root/testdata/sf0.01/documents.parquet")
    assert not is_table_identifier("out.parquet")

    df = read_table(spark, f"{sf_dir}/documents.parquet")
    assert df.count() > 0

    out = str(tmp_path / "pages_out")
    write_table(df.limit(50), out, partition_by=("lang",))
    back = read_table(spark, out)
    assert back.count() == 50
    assert any("lang=" in str(p) for p in (tmp_path / "pages_out").iterdir())

    df.limit(5).createOrReplaceTempView("catalog_dispatch_view")
    via_table = read_table(spark, "catalog_dispatch_view", fmt="table")
    assert via_table.count() == 5
