"""Structured Streaming over the events table.

The reference has no streaming semantics (SURVEY.md §2.2) — this is the
engine-layer extension: watermarked windowed aggregation with late-data
semantics, runnable in ``availableNow`` batch-catchup mode over parquet so
tests are hermetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gstools_core_spark.streaming.util import file_stream_source, run_to_memory_sink


def stateful_user_sessions(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = 30,
    allowed_lateness_minutes: int = 0,
) -> DataFrame:
    """Custom stateful streaming operator: per-user session tracking with
    ``applyInPandasWithState``.  Runs in availableNow catch-up mode.

    Out-of-order handling: state buffers the timestamps of every
    not-yet-emitted event; each micro-batch merges + re-sorts the buffer,
    rebuilds sessions, and emits only sessions provably closed — their end
    lies more than ``gap + allowed_lateness`` behind the user's newest
    event.  Events arriving out of order WITHIN that horizon are therefore
    sessionized exactly like a batch sort; a straggler older than the
    horizon lands in a new (incorrectly split) session — the same bounded
    guarantee a watermark gives windowed aggregation.  With the default
    lateness of 0 the emitted set equals the batch semantics' closed
    sessions whenever each user's per-batch maxima are nondecreasing.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = file_stream_source(spark, events_path)

    gap_us = gap_minutes * 60 * 1_000_000
    late_us = allowed_lateness_minutes * 60 * 1_000_000

    def track(key, pdfs, state: GroupState):
        (user_id,) = key
        ts_all = []
        for pdf in pdfs:
            ts = pdf["ts"].dropna()  # NaT cannot cast to int64 (raises);
            # null-ts rows carry no event time and are dropped, matching
            # the windowed-agg path's null handling
            ts_all.extend(ts.astype("datetime64[us]").astype("int64").tolist())
        pending = list(state.get[0]) if state.exists else []
        pending = sorted(pending + ts_all)
        if not pending:
            return
        frontier = pending[-1] - late_us
        sessions: list[list[int]] = [[pending[0]]]
        for t in pending[1:]:
            if t - sessions[-1][-1] > gap_us:
                sessions.append([t])
            else:
                sessions[-1].append(t)
        rows, keep = [], []
        for s in sessions:
            if s[-1] + gap_us < frontier:  # no in-horizon event can attach
                rows.append((user_id, s[0], s[-1], len(s)))
            else:
                keep.extend(s)
        state.update((keep,))
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
            stateStructType="pending array<long>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_to_memory_sink(out, "user_sessions", "append")


def streaming_dedup(
    spark: SparkSession,
    events_path: str,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicatesWithinWatermark`` on ``keys``.

    The web-pipeline duplicate-delivery case: an at-least-once upstream
    (crawler re-fetch, queue redelivery) emits the same event twice; state
    keeps each key only while it can still recur (bounded by the watermark),
    so state size is O(arrival rate × watermark), not O(corpus) — the
    property that makes dedup runnable as a continuous job instead of a
    periodic batch distinct.  In availableNow catch-up mode over a bounded
    input the emitted set equals the batch ``dropDuplicates(keys)`` modulo
    which duplicate survives (first arrival wins here).
    """
    stream = file_stream_source(spark, events_path, max_files_per_trigger=4)
    out = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
    return run_to_memory_sink(out, "events_dedup", "append")


def windowed_event_stats(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    output_mode: str = "complete",
) -> DataFrame:
    """Stream events → per-(window, event_type) count/sum with a watermark.

    Runs with Trigger.AvailableNow into an in-memory sink and returns the
    resulting DataFrame.  Output-mode semantics matter here: the default
    ``complete`` retains EVERY window (batch-equivalent result for the
    catch-up tests) but the watermark then neither evicts state nor drops
    late rows — a continuous deployment should pass ``output_mode=
    "update"`` (or "append"), where state stays bounded by the watermark
    and rows later than it are dropped.
    """
    stream = file_stream_source(spark, events_path, max_files_per_trigger=4)
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
    return run_to_memory_sink(agg, "events_windowed", output_mode)
