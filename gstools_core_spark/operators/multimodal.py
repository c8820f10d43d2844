"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.  The environment has no codec libraries, so the
actual byte→pixels/samples decode is STUBBED: ``mode='fake'`` produces a
deterministic feature vector from the raw bytes (real Spark plumbing —
schema, batching, partitioning — with a fake kernel), ``mode='real'``
raises NotImplementedError at the decode step.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)


def synthesize_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic fake media table (binary payload derived from the id)."""
    df = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("MEDIA"), F.sha2(F.col("id").cast("string"), 256)), "utf-8"
    )
    meta = F.struct(
        (F.pmod(F.col("id") * 13, F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.col("id") * 29, F.lit(1080)) + 16).cast("int").alias("height"),
        F.lit(16000).cast("int").alias("sample_rate"),
        (F.pmod(F.col("id") * 7, F.lit(240)) + 1).cast("int").alias("n_frames"),
    )
    return df.select(
        F.col("id").alias("media_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("meta")
    )


def extract_features(
    media: DataFrame, feature_dim: int = 16, mode: str = "fake"
) -> DataFrame:
    """Decode payload → fixed-size feature vector (media_id, kind, features).

    The Spark side (Arrow batching, schema, partition preservation) is real;
    the decode kernel is a deterministic byte-statistics fake until codec
    libraries are available.
    """
    if mode not in ("fake", "real"):
        raise ValueError(mode)

    dim = feature_dim

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real decode requires image/audio codec libraries "
                    "(PIL/torchaudio/ffmpeg) not present in this environment"
                )
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": []}
                )
                continue
            # Arrow-offsets flatten (the _arrow_vec_matrix trick): ONE flat
            # byte buffer + per-row offsets instead of ~10 numpy calls per
            # row — the per-row `for payload in pdf[...]` loop was the last
            # row-at-a-time Python in the package.  Row i's fake embedding
            # chunk j is bytes [j*w_i, (j+1)*w_i) of the payload (w_i =
            # ceil(L_i/dim), zero-padded tail), so chunk sums are
            # np.add.reduceat over the flat buffer at the flattened chunk
            # starts: chunks tile each row contiguously and rows tile the
            # buffer, making consecutive starts exactly the segment bounds.
            # build large_binary DIRECTLY (64-bit offsets): pa.array() with
            # the default binary type caps a batch at 2 GiB of payload
            # bytes (32-bit offsets) — the old per-row loop had no limit
            arr = pa.array(pdf["payload"], type=pa.large_binary())
            if arr.null_count:
                raise ValueError("payload contains nulls")
            n = len(arr)
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[: n + 1]
            flat = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)[
                : offs[-1]
            ]
            L = np.diff(offs)  # (n,) payload lengths
            w = -(-L // dim)  # ceil(L/dim) chunk widths
            j = np.arange(dim, dtype=np.int64)
            starts = offs[:-1, None] + np.minimum(j[None, :] * w[:, None], L[:, None])
            ends = offs[:-1, None] + np.minimum(
                (j[None, :] + 1) * w[:, None], L[:, None]
            )
            idx = starts.ravel()
            # sentinel element: lets boundary indices equal len(flat) (all-
            # padding tail chunks) without clamping — a clamp would silently
            # shrink the PRECEDING segment's sum.  Stay uint8 until the
            # reduce and accumulate via dtype=int64: an .astype(int64) here
            # would materialize an 8× copy of the batch payload (this host
            # page-faults hard on large fresh allocations)
            flat_ext = np.append(flat, np.uint8(0))
            sums = np.add.reduceat(flat_ext, idx, dtype=np.int64).astype(
                np.float64
            )
            sums[(ends.ravel() <= idx)] = 0.0  # reduceat yields flat[i] there
            with np.errstate(invalid="ignore", divide="ignore"):
                # same op order as the row-wise form: (sum / width) / 255
                feats_m = (sums.reshape(n, dim) / w[:, None]) / 255.0
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": list(feats_m),
                }
            )

    return media.mapInPandas(gen, "media_id long, kind string, features array<double>")


def sample_frames(media: DataFrame, every_n: int = 24) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame index
    (JVM-side explode of the frame-index sequence; decode stays stubbed)."""
    frames = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
    )
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"), "meta")
    )
