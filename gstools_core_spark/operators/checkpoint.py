"""Resumable batch runs: per-bucket checkpoints, lineage, per-cell metrics.

North-rule requirement (SURVEY.md §2.3): jobs over a 10^12-row table must be
resumable from per-partition checkpoints with lineage + metrics per cell.

Design (honest Spark, no hidden driver loops over rows):

* the key space is hashed into ``n_buckets`` coarse buckets
  (``pmod(xxhash64(key), B)``) — at cluster scale each bucket is still
  thousands of Spark partitions;
* the pending buckets' rows are STAGED in ONE source scan — a single job
  writing ``partitionBy("_cp_bucket")`` parquet — so the source is read
  exactly twice per run (fingerprint scan + staging scan) no matter how
  many buckets there are.  The old per-bucket ``where(pmod(...) == b)``
  form rescanned the full source B times: the pmod predicate prunes
  nothing (at 100 TB with B=16 that is 16 full scans).  The trade is one
  staged write of the pending rows per fresh run (2 reads + 1 write + B
  pruned reads vs B+1 full reads — already ahead at B=3, and the staged
  copy is removed on every exit path);
* each staged bucket is then processed as one Spark job reading ONLY its
  ``_cp_bucket=<b>`` partition directory (partition-pruned), output landing
  in ``out/bucket=<b>/`` followed by an atomic ``_COMPLETED_<b>`` marker;
* resume = skip buckets whose marker exists — no duplicate work, idempotent
  output (re-running a half-written bucket overwrites it); only the still-
  pending buckets are re-staged;
* lineage: every marker records the bucket's INPUT fingerprint (row count +
  order-independent key hash) and output row count.  On resume the
  fingerprints of ALL buckets are recomputed against the current source in
  ONE grouped aggregate scan and stale buckets are reprocessed (source
  changed under the checkpoint) — ``verify_input=False`` skips the check
  for completed buckets and trusts source immutability.  The fingerprints
  are snapshotted before processing starts: a source mutated between the
  fingerprint scan and the staging scan fails the run LOUDLY (the staging
  write's row-count observation is cross-checked against the fingerprint
  totals); a source mutated after staging is caught on the next
  verify_input resume (the marker's fingerprint no longer matches).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gstools_core_spark.functions.fingerprint import hash_fingerprint_aggs


class CheckpointedRun:
    def __init__(self, out_dir: str, n_buckets: int = 16):
        self.out = Path(out_dir)
        self.n_buckets = n_buckets
        self.out.mkdir(parents=True, exist_ok=True)

    def _marker(self, b: int) -> Path:
        return self.out / f"_COMPLETED_{b}"

    def completed_buckets(self) -> set[int]:
        return {b for b in range(self.n_buckets) if self._marker(b).exists()}

    def _bucket_fingerprints(self, source: DataFrame, key_col: str) -> dict[int, dict]:
        """Order-independent input fingerprint of EVERY bucket in ONE
        grouped aggregate scan (a per-bucket ``where`` would rescan the
        full source B times — the pmod predicate prunes nothing).  The
        (count, xor, decimal-sum) triple is the shared recipe in
        functions/fingerprint.py."""
        bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(self.n_buckets))
        rows = source.groupBy(bucket.alias("_b")).agg(
            *hash_fingerprint_aggs(F.xxhash64(F.col(key_col)))
        ).collect()
        fps = {
            int(r["_b"]): {
                "input_rows": int(r["n"]),
                "input_hash": int(r["h"]) if r["h"] is not None else 0,
                "input_sum": str(r["s"]) if r["s"] is not None else "0",
            }
            for r in rows
        }
        empty = {"input_rows": 0, "input_hash": 0, "input_sum": "0"}
        return {b: fps.get(b, dict(empty)) for b in range(self.n_buckets)}

    def run(
        self,
        source: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        key_col: str,
        fail_after: int | None = None,
        verify_input: bool = True,
    ) -> dict:
        """Process every not-yet-completed bucket; returns run stats.

        ``verify_input`` (default): recompute each completed bucket's input
        fingerprint and reprocess it if the source changed since its marker
        was written.  ``fail_after`` (tests only) aborts after N buckets to
        exercise resume-from-checkpoint.
        """
        bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(self.n_buckets))
        done = self.completed_buckets()
        # one grouped scan yields every bucket's fingerprint (needed for all
        # new buckets, and for completed ones when verify_input)
        fps = (
            self._bucket_fingerprints(source, key_col)
            if verify_input or len(done) < self.n_buckets
            else {}
        )

        # decide the pending set up front so the staging write touches the
        # source exactly once for the whole run
        stale_set: set[int] = set()
        pending: list[int] = []
        for b in range(self.n_buckets):
            if b in done:
                if not verify_input:
                    continue
                fp = fps[b]
                try:
                    marker = json.loads(self._marker(b).read_text())
                except (json.JSONDecodeError, OSError):
                    marker = {}  # unreadable marker: treat as stale, redo
                if (
                    marker.get("input_rows") == fp["input_rows"]
                    and marker.get("input_hash") == fp["input_hash"]
                    and marker.get("input_sum") == fp["input_sum"]
                ):
                    continue
                stale_set.add(b)  # source changed under the checkpoint: redo
            pending.append(b)

        processed = 0
        rows_written = 0
        spark = source.sparkSession
        # UNIQUE per-run staging dir: a fixed out/_staging would be shared
        # mutable scratch — two concurrent runs (or a retry racing a zombie
        # run) against the same out_dir would overwrite/delete each other's
        # staged input mid-job; the finally-cleanup below only ever touches
        # this run's own dir
        import uuid

        staging = self.out / f"_staging_{uuid.uuid4().hex}"
        if pending and "_cp_bucket" in source.columns:
            raise ValueError(
                "source already has a _cp_bucket column — it would "
                "collide with the checkpoint staging partition column"
            )
        # the try covers the STAGING WRITE too: a write that fails mid-job
        # (disk full, executor loss, Ctrl-C) must not orphan a partial
        # '_staging_<uuid>' copy of the source — unlike the old fixed name,
        # nothing would ever overwrite it
        try:
            if pending:
                # ONE source scan stages every pending bucket's rows as a
                # partitioned parquet table; each bucket job below reads
                # only its own partition directory (pruned), never the
                # source again.  The Observation counts the staged rows IN
                # the write job (no extra scan) so a source mutated between
                # the fingerprint scan and this staging scan fails loudly
                # instead of silently checkpointing a snapshot the markers
                # don't describe — with verify_input=False on later resumes
                # that drift would be permanent (e.g. fingerprints said 0,
                # rows appeared after: empty bucket outputs forever).
                from pyspark.sql import Observation

                obs = Observation()
                (
                    source.withColumn("_cp_bucket", bucket)
                    .where(F.col("_cp_bucket").isin([int(b) for b in pending]))
                    .observe(obs, F.count(F.lit(1)).alias("n"))
                    .write.mode("overwrite")
                    .partitionBy("_cp_bucket")
                    .parquet(str(staging))
                )
                expected = sum(fps[b]["input_rows"] for b in pending)
                staged_n = int(obs.get["n"])
                if staged_n != expected:
                    raise RuntimeError(
                        f"checkpoint staging scan saw {staged_n} rows for "
                        f"the pending buckets but their fingerprints "
                        f"(snapshotted one scan earlier) total {expected} — "
                        "the source is being mutated mid-run; rerun when it "
                        "is quiescent"
                    )
                if expected == 0:
                    # all pending buckets are empty: parquet wrote no data
                    # files and the read below would fail on schema
                    # inference.  This is decided from the FINGERPRINTS,
                    # never from a read failure — a bare except here once
                    # turned any real read error into "empty input", writing
                    # empty bucket outputs under markers whose fingerprints
                    # still matched the source (permanent silent data loss
                    # on every later resume).
                    staged = source.withColumn(
                        "_cp_bucket", bucket.cast("int")
                    ).where(F.lit(False))
                else:
                    staged = spark.read.parquet(str(staging))
            for b in pending:
                fp = fps.get(b)
                if fail_after is not None and processed >= fail_after:
                    raise RuntimeError(
                        f"injected failure after {processed} buckets"
                    )
                part = staged.where(F.col("_cp_bucket") == b).drop("_cp_bucket")
                result = transform(part)
                path = str(self.out / f"bucket={b}")
                result.write.mode("overwrite").parquet(path)
                n = result.sparkSession.read.parquet(path).count()
                # ATOMIC marker: write a temp file, fsync, then rename into
                # place — a crash mid-write can never leave a truncated
                # marker that reads as completed
                tmp = self._marker(b).with_suffix(".tmp")
                with open(tmp, "w") as f:
                    f.write(
                        json.dumps(
                            {
                                "bucket": b,
                                "rows": n,
                                "key_col": key_col,
                                "input_rows": fp["input_rows"],
                                "input_hash": fp["input_hash"],
                                "input_sum": fp["input_sum"],
                                "completed_at": time.time(),
                            }
                        )
                    )
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, self._marker(b))
                processed += 1
                rows_written += n
        finally:
            # staging is a per-run scratch snapshot: resume re-stages the
            # still-pending buckets, so it is safe (and necessary — a
            # crashed run must not leak a full source copy) to remove it on
            # every exit path
            if pending:
                import shutil

                shutil.rmtree(staging, ignore_errors=True)
        return {
            "buckets_processed": processed,
            "buckets_skipped": len(done) - len(stale_set),
            "buckets_stale": len(stale_set),
            "rows_written": rows_written,
        }

    def read_output(self, spark) -> DataFrame:
        done = sorted(self.completed_buckets())
        if not done:
            raise ValueError(
                f"no completed buckets under {self.out} — the run failed "
                "before its first marker; nothing to read"
            )
        paths = [str(self.out / f"bucket={b}") for b in done]
        return spark.read.parquet(*paths)


def emit_pair_metrics(
    points: DataFrame, max_dist: float, out_path: str,
    coords=("x", "y"), id_col: str = "id",
) -> DataFrame:
    """North-rule per-cell metrics for the variogram join: pair counts and
    distance moments per blocking cell (cell of the pair's first point),
    written as JSON lines."""
    from gstools_core_spark.operators.pair_join import pair_join

    pairs = pair_join(points, max_dist, id_col=id_col, coords=coords, payload_cols=())
    cell = F.struct(
        F.floor(F.col(f"a_{coords[0]}") / F.lit(max_dist)).cast("long").alias("cx"),
        F.floor(F.col(f"a_{coords[1]}") / F.lit(max_dist)).cast("long").alias("cy"),
    )
    metrics = (
        pairs.withColumn("cell", cell)
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("dist"), 9).alias("dist_mean"),
            F.round(F.max("dist"), 9).alias("dist_max"),
        )
        .select("cell.cx", "cell.cy", "n_pairs", "dist_mean", "dist_max")
    )
    metrics.write.mode("overwrite").json(out_path)
    return metrics


def emit_cell_metrics(
    df: DataFrame, cell_col: str, out_path: str, value_col: str | None = None
) -> DataFrame:
    """Per-cell lineage/metrics (pair counts, value moments) written as JSON
    lines partitioned by cell prefix — the north rule's per-H3-cell metrics."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if value_col:
        aggs += [
            F.avg(value_col).alias("value_mean"),
            F.min(value_col).alias("value_min"),
            F.max(value_col).alias("value_max"),
        ]
    metrics = df.groupBy(cell_col).agg(*aggs)
    metrics.write.mode("overwrite").json(out_path)
    return metrics
