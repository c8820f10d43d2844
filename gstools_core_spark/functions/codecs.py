"""Pure-numpy encoders/decoders for UNCOMPRESSED media containers.

The environment has no codec libraries (PIL/ffmpeg/torchaudio), so
compressed formats (JPEG/MP3/H.264) stay stubbed — but the two classic
uncompressed containers need nothing beyond the struct module and numpy:

* WAV — RIFF container, ``fmt `` chunk + ``data`` chunk, PCM16
  little-endian (Microsoft RIFF/WAVE spec, public).
* BMP — ``BM`` file header + 40-byte BITMAPINFOHEADER, 24-bit BGR,
  bottom-up rows padded to 4-byte boundaries (Windows DIB spec, public).

These give ``extract_features(mode='real')`` an actual byte→samples /
byte→pixels path: the container parse is per-payload by nature (exactly
like a PIL/libsndfile decode would be), while everything downstream of the
parse is vectorized numpy.  Encoders exist so tests and demos can
synthesize valid payloads deterministically without external files.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono PCM16 WAV from an int16 sample vector."""
    s = np.ascontiguousarray(np.asarray(samples, dtype="<i2"))
    data = s.tobytes()
    fmt_body = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )  # PCM, mono, byte-rate, block-align 2, 16 bits
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack("<I", len(fmt_body)),
            fmt_body,
            b"data",
            struct.pack("<I", len(data)),
            data,
        ]
    )


def decode_wav(payload: bytes | bytearray) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 → (sample_rate, int16 samples).  Mono returns a 1-D
    vector; multi-channel returns (n, channels).  Chunk-walks the
    container (word-aligned), so extra chunks (LIST, fact, …) are fine;
    non-PCM or non-16-bit raises NotImplementedError."""
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, channels, data = 12, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 supported (fmt_tag={fmt_tag}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if channels and channels > 1:
        samples = samples[: len(samples) // channels * channels].reshape(
            -1, channels
        )
    return int(sample_rate), samples


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24-bit uncompressed BMP from an (h, w, 3) uint8 RGB array."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB uint8")
    h, w, _ = px.shape
    row = w * 3
    stride = (row + 3) & ~3  # rows padded to 4-byte boundaries
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row] = px[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
    data = body.tobytes()
    off = 14 + 40
    file_hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + data


def decode_bmp(payload: bytes | bytearray) -> np.ndarray:
    """BMP → (h, w, 3) uint8 RGB.  Handles bottom-up (positive height) and
    top-down (negative height) row order and the 4-byte row padding;
    compressed or non-24-bit DIBs raise NotImplementedError."""
    b = bytes(payload)
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack("<I", b[10:14])[0]
    hdr_size, w, h, _planes, bpp, comp = struct.unpack("<IiiHHI", b[14:34])
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER not supported")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit supported (bpp={bpp}, comp={comp})"
        )
    bottom_up = h > 0
    h = abs(h)
    row = w * 3
    stride = (row + 3) & ~3
    arr = (
        np.frombuffer(b, dtype=np.uint8, offset=off, count=stride * h)
        .reshape(h, stride)[:, :row]
        .reshape(h, w, 3)
    )
    if bottom_up:
        arr = arr[::-1]
    return arr[:, :, ::-1].copy()  # BGR → RGB
