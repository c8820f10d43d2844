"""Structured Streaming over the events table.

The reference has no streaming semantics (SURVEY.md §2.2) — this is the
engine-layer extension: watermarked windowed aggregation with late-data
semantics, runnable in ``availableNow`` batch-catchup mode over parquet so
tests are hermetic.
"""

from __future__ import annotations

import tempfile
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_stats(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream events → per-(window, event_type) count/sum with a watermark.

    Runs with Trigger.AvailableNow into an in-memory sink and returns the
    resulting DataFrame (batch-equivalent semantics; late rows beyond the
    watermark would be dropped in continuous operation).
    """
    static = spark.read.parquet(events_path)
    # the file stream source requires a DIRECTORY; expose a single parquet
    # file through a temp dir of symlinks
    p = Path(events_path)
    if p.is_file():
        d = Path(tempfile.mkdtemp(prefix="stream_src_"))
        (d / p.name).symlink_to(p)
        events_path = str(d)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_path)
    )
    # parquet naive timestamps arrive as TIMESTAMP_NTZ; watermarks need an
    # event-time TIMESTAMP — cast under the session UTC zone (deterministic)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
    sink = f"events_windowed_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
