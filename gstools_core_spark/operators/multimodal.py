"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.  ``mode='fake'`` produces a deterministic feature
vector from the raw bytes (real Spark plumbing — schema, batching,
partitioning — with a fake kernel; fully Arrow-vectorized and
oracle-checked).  ``mode='real'`` decodes the four containers stdlib +
numpy can handle without codec libraries — WAV PCM16, BMP24, PNG
(lossless DEFLATE via stdlib zlib), and baseline JPEG (lossy DCT +
Huffman, cross-checked against the JVM's javax.imageio codec; see
functions/codecs.py and functions/jpeg.py) — and raises
NotImplementedError only for codecs (MP3/H.264/progressive JPEG) that
genuinely need libraries this environment lacks.
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


def _decode_real(pdf: pd.DataFrame, dim: int) -> pd.DataFrame:
    """mode='real' kernel: ACTUAL byte→samples/pixels decode for the four
    containers a codec-library-free environment can handle — WAV PCM16
    (RIFF magic), BMP24 ('BM' magic), PNG (DEFLATE-compressed scanlines +
    predictive filters, via stdlib zlib), and baseline JPEG (FFD8 magic —
    Huffman + 8×8 DCT, functions/jpeg.py) through functions/codecs.py —
    then the same dim-chunk zero-padded means as the fake kernel, over
    |samples|/32768 resp. pixels/255.  The container parse is per-payload
    by nature (a PIL/libsndfile decode would be too); everything after
    the parse is vectorized.  Codecs needing external libraries
    (MP3/H.264/progressive JPEG) still raise NotImplementedError."""
    from gstools_core_spark.functions import codecs

    feats = []
    for payload in pdf["payload"]:
        b = bytes(payload)
        # RIFF is a container family: only the WAVE form is decodable here
        # (WEBP/AVI are RIFF too but compressed — they must fall through to
        # the NotImplementedError, not decode_wav's ValueError)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            _, samples = codecs.decode_wav(b)
            x = np.abs(samples.astype(np.float64)).ravel() / 32768.0
        elif b[:2] == b"BM":
            x = codecs.decode_bmp(b).astype(np.float64).ravel() / 255.0
        elif b[:8] == b"\x89PNG\r\n\x1a\n":
            x = codecs.decode_png(b).astype(np.float64).ravel() / 255.0
        elif b[:2] == b"\xff\xd8":
            x = codecs.decode_jpeg(b).astype(np.float64).ravel() / 255.0
        else:
            raise NotImplementedError(
                "mode='real' decodes WAV PCM16 / BMP24 / PNG / baseline "
                "JPEG containers; codecs needing external libraries "
                "(MP3/H.264/progressive JPEG) are not available in this "
                "environment"
            )
        L = x.shape[0]
        w = -(-L // dim)  # ceil — same chunking rule as the fake kernel
        padded = np.zeros(w * dim)
        padded[:L] = x
        feats.append(padded.reshape(dim, w).mean(axis=1))
    return pd.DataFrame(
        {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
    )


def synthesize_real_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic VALID-container media table for the mode='real' path:
    ids cycle BMP24 image / WAV PCM16 audio / PNG image (lossless
    DEFLATE; each PNG payload uses filter type ``id % 5``, so across ids
    the decode exercises all five predictive filters) / baseline JPEG
    image (lossy DCT + Huffman), all synthesized per-id from a seeded
    generator through the functions/codecs.py encoders (distributed —
    each task encodes its own id range; no driver-side data)."""
    from gstools_core_spark.functions import codecs

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "payload": [],
                "width": [], "height": [], "sample_rate": [], "n_frames": [],
            }
            for mid in pdf["id"]:
                mid = int(mid)
                rng = np.random.default_rng(mid + 7919)
                m = mid % 4
                if m == 0:
                    w, h = 8 + mid % 5, 6 + mid % 3
                    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    out["payload"].append(codecs.encode_bmp(px))
                    out["kind"].append("image")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sample_rate"].append(0)
                elif m == 1:
                    sr = 8000
                    s = rng.integers(
                        -32768, 32768, size=128 + mid % 64, dtype=np.int16
                    )
                    out["payload"].append(codecs.encode_wav(s, sr))
                    out["kind"].append("audio")
                    out["width"].append(0)
                    out["height"].append(0)
                    out["sample_rate"].append(sr)
                elif m == 2:
                    w, h = 6 + mid % 7, 5 + mid % 4
                    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    out["payload"].append(
                        codecs.encode_png(px, filter_type=mid % 5)
                    )
                    out["kind"].append("image")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sample_rate"].append(0)
                else:
                    # smooth per-id gradient: a realistic JPEG subject
                    # (uniform noise is the codec's worst case)
                    w, h = 16 + mid % 9, 16 + mid % 5
                    gx = np.linspace(0, 255, w)[None, :]
                    gy = np.linspace(0, 255, h)[:, None]
                    px = np.stack(
                        [
                            np.broadcast_to(gx, (h, w)),
                            np.broadcast_to(gy, (h, w)),
                            np.full((h, w), (mid * 37) % 256, np.float64),
                        ],
                        axis=2,
                    ).astype(np.uint8)
                    out["payload"].append(codecs.encode_jpeg(px))
                    out["kind"].append("image")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sample_rate"].append(0)
                out["media_id"].append(mid)
                out["n_frames"].append(1)
            yield pd.DataFrame(out)

    flat = spark.range(n).mapInPandas(
        gen,
        "media_id long, kind string, payload binary, "
        "width int, height int, sample_rate int, n_frames int",
    )
    return flat.select(
        "media_id",
        "kind",
        "payload",
        F.struct("width", "height", "sample_rate", "n_frames").alias("meta"),
    )


def extract_features(
    media: DataFrame, feature_dim: int = 16, mode: str = "fake"
) -> DataFrame:
    """Decode payload → fixed-size feature vector (media_id, kind, features).

    The Spark side (Arrow batching, schema, partition preservation) is real.
    ``mode='fake'`` is the deterministic byte-statistics kernel (fully
    Arrow-vectorized — the oracle-checked path); ``mode='real'`` decodes
    actual containers (WAV PCM16 / BMP24 / PNG / baseline JPEG, stdlib +
    numpy — see functions/codecs.py) and raises NotImplementedError only
    for codecs that need external libraries.
    """
    if mode not in ("fake", "real"):
        raise ValueError(mode)

    dim = feature_dim

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        for pdf in batches:
            if mode == "real":
                yield _decode_real(pdf, dim)
                continue
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
            # Boundary indices equal to len(flat) (all-padding tail chunks)
            # are out of range for reduceat.  A sentinel append would COPY
            # the whole batch payload for one byte (np.append reallocates;
            # this host page-faults hard on large fresh allocations), so
            # instead: clip those indices to len(flat)-1 — they are exactly
            # the empty chunks the mask below zeroes — and repair the ONE
            # real segment the clip truncates (the first clipped boundary
            # shortens its PRECEDING segment by the final byte; later
            # clipped boundaries only delimit empty segments).  Stay uint8
            # until the reduce and accumulate via dtype=int64: an
            # .astype(int64) here would materialize an 8× payload copy.
            nflat = flat.shape[0]
            if nflat == 0:
                sums = np.zeros(idx.shape[0])
            else:
                clipped = idx >= nflat
                idx_c = np.where(clipped, nflat - 1, idx)
                sums = np.add.reduceat(flat, idx_c, dtype=np.int64).astype(
                    np.float64
                )
                if clipped.any():
                    i0 = int(np.argmax(clipped))  # idx[0]=0 < nflat → i0 ≥ 1
                    if idx[i0 - 1] < nflat - 1:
                        # clip shortened [s, nflat) to [s, nflat-1): add the
                        # lost final byte.  When s == nflat-1 the clipped
                        # boundaries are EQUAL and reduceat's equal-index
                        # rule already returned flat[nflat-1] — the exact
                        # one-byte segment sum — so adding would double it.
                        sums[i0 - 1] += flat[-1]
            sums[(ends.ravel() <= idx)] = 0.0  # empty chunks (incl. clipped)
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
