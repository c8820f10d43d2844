"""LLM-training-data pipeline demo: the dedup/quality counterpart of the
geostat chain (bench_pages_krige_raster), proving the layers compose.

    synthesize pages → geocode → inject known near-dups → minhash_dedup
    (transitive components) → quality filter → write cell-partitioned
    parquet layout

Every stage is the scale-path operator: distributed synthesis (no driver
data), column-expression geocode, JVM minhash signatures + LSH band join +
verify + star-contraction components, column-expression quality score, and
the partition-pruned cell layout write.  Per-stage counts are printed and
returned; tests/test_pipeline_demo.py asserts them at small n.

Run:  python tools/pipeline_demo.py          (sf0.1-sized, local[32])
      SPARK_GRAFT_DEMO_N=5000 python tools/pipeline_demo.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from gstools_core_spark.functions import text as T  # noqa: E402
from gstools_core_spark.operators.dedup import minhash_dedup  # noqa: E402
from gstools_core_spark.sources.pages import geocode, synthesize_pages  # noqa: E402
from gstools_core_spark.sources.writer import write_partitioned_by_cell  # noqa: E402


def run_pipeline(
    spark: SparkSession,
    n_pages: int,
    out_dir: str,
    dup_every: int = 7,
    quality_min: float = 0.35,
) -> dict:
    """Run the full chain; returns per-stage counts (the lineage record).

    ``dup_every`` — every ``dup_every``-th page is re-crawled under a
    different url with IDENTICAL text (the web's mirror-site case), so the
    expected dedup drop is known exactly: minhash with transitive
    components keeps one copy per mirror pair.
    """
    pages = geocode(synthesize_pages(spark, n_pages))

    # deterministic near-dup injection: a second url serving the same text
    mirrors = (
        pages.where(F.pmod(F.col("page_id"), F.lit(dup_every)) == 0)
        .withColumn("page_id", F.col("page_id") + F.lit(n_pages))
        .withColumn("url", F.concat(F.lit("https://mirror.example/p/"), F.col("page_id")))
    )
    corpus = pages.unionByName(mirrors)
    n_corpus = corpus.count()

    deduped = minhash_dedup(
        corpus,
        "text",
        "page_id",
        threshold=0.8,
        num_hashes=32,
        bands=8,
        shingle_k=3,
        hash_fn="xx",
        transitive=True,
    )
    n_deduped = deduped.count()

    scored = deduped.withColumn("quality", T.quality_score(F.col("text")))
    kept = scored.where(F.col("quality") >= quality_min)
    n_kept = kept.count()

    write_partitioned_by_cell(kept, out_dir)
    written = spark.read.parquet(out_dir)
    n_written = written.count()
    n_cells = written.select("cell_prefix").distinct().count()

    # north-rule per-cell lineage/metrics for the LLM chain too (the
    # geostat chain has emit_pair_metrics): row count + quality moments
    # per index cell, JSON lines next to the data layout
    from gstools_core_spark.operators.checkpoint import emit_cell_metrics

    metrics_path = out_dir.rstrip("/") + "_cell_metrics"
    emit_cell_metrics(written, "cell_prefix", metrics_path, value_col="quality")

    stats = {
        "n_pages": n_pages,
        "n_mirrors": n_corpus - n_pages,
        "n_corpus": n_corpus,
        "n_after_dedup": n_deduped,
        "n_dropped_dup": n_corpus - n_deduped,
        "n_after_quality": n_kept,
        "n_written": n_written,
        "n_cells": n_cells,
        "cell_metrics_path": metrics_path,
    }
    return stats


def main():
    from gstools_core_spark.session import get_session

    n = int(os.environ.get("SPARK_GRAFT_DEMO_N", "100000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out = os.environ.get("SPARK_GRAFT_DEMO_OUT", "/tmp/pipeline_demo_out")
    spark = get_session("pipeline-demo", cores=cpus, shuffle_partitions=64)
    stats = run_pipeline(spark, n, out)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
