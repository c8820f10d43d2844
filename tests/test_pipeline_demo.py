"""End-to-end LLM-pipeline demo: synthesize → geocode → inject mirrors →
minhash dedup (transitive) → quality filter → cell-partitioned layout.
Counts are exact: every injected mirror pair collapses to one survivor."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from pipeline_demo import run_pipeline  # noqa: E402


def test_pipeline_demo_counts(spark, tmp_path):
    n = 700
    dup_every = 7
    stats = run_pipeline(spark, n, str(tmp_path / "out"), dup_every=dup_every)

    n_mirrors = len(range(0, n, dup_every))
    assert stats["n_mirrors"] == n_mirrors
    assert stats["n_corpus"] == n + n_mirrors
    # each mirror pair (identical text) collapses to exactly one survivor;
    # the synthesized texts are independent-word draws, so cross-page
    # near-dups are vanishingly unlikely at 0.8 Jaccard
    assert stats["n_dropped_dup"] == n_mirrors, stats
    assert stats["n_after_dedup"] == n
    # quality filter drops something but not everything
    assert 0 < stats["n_after_quality"] <= n
    assert stats["n_written"] == stats["n_after_quality"]
    # the layout really is cell-partitioned (multiple prefix dirs)
    assert stats["n_cells"] > 1
    dirs = [p.name for p in (tmp_path / "out").iterdir() if p.is_dir()]
    assert any(d.startswith("cell_prefix=") for d in dirs)

    # per-cell lineage metrics landed as JSON lines next to the layout:
    # one row per cell, schema pinned, row counts reconciling exactly
    metrics = spark.read.json(stats["cell_metrics_path"])
    assert set(metrics.columns) == {
        "cell_prefix", "n_rows", "value_mean", "value_min", "value_max"
    }
    assert metrics.count() == stats["n_cells"]
    from pyspark.sql import functions as F

    assert (
        metrics.agg(F.sum("n_rows")).collect()[0][0] == stats["n_written"]
    )
