"""Shared Structured-Streaming plumbing: file-source shim + memory sink.

One definition for the four streaming operators (windowed stats, stateful
sessions, dedup, variogram) — the single-file symlink shim and the
availableNow memory-sink run were previously copy-pasted per operator.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_stream_source(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``readStream`` over a parquet path with event-time ``ts`` cast to
    TIMESTAMP (parquet naive timestamps arrive as TIMESTAMP_NTZ; watermarks
    need an event-time TIMESTAMP — cast under the session UTC zone).

    The file stream source requires a DIRECTORY; a single parquet file is
    exposed through a temp dir of symlinks (path resolved to absolute
    first — a relative path would produce a dangling symlink).
    """
    static = spark.read.parquet(path)
    p = Path(path).resolve()
    if p.is_file():
        d = Path(tempfile.mkdtemp(prefix="stream_src_"))
        # the shim dir (one symlink) lives until process exit — the stream
        # reads it lazily, so it can't be removed before the query runs
        atexit.register(shutil.rmtree, str(d), ignore_errors=True)
        (d / p.name).symlink_to(p)
        path = str(d)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path).withColumn("ts", F.col("ts").cast("timestamp"))


def run_to_memory_sink(df: DataFrame, prefix: str, output_mode: str) -> DataFrame:
    """Run ``df`` with Trigger.AvailableNow into an in-memory sink and
    return the resulting (batch) DataFrame.

    The result is ``localCheckpoint(eager=True)``-materialized and the sink
    temp view dropped IMMEDIATELY: the returned DataFrame owns its data and
    stays valid however many later runs reuse the prefix (the previous
    keep-latest-view scheme invalidated earlier results at a distance —
    e.g. comparing complete vs update output modes broke the first one),
    and the driver never accumulates per-run memory-sink tables."""
    spark = df.sparkSession
    sink = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(sink).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out
