"""Pure-numpy encoders/decoders for library-free media containers.

The environment has no codec libraries (PIL/ffmpeg/torchaudio), so codecs
that need them (JPEG/MP3/H.264) stay stubbed — but three classic formats
need nothing beyond the stdlib (struct, zlib) and numpy:

* WAV — RIFF container, ``fmt `` chunk + ``data`` chunk, PCM16
  little-endian (Microsoft RIFF/WAVE spec, public).
* BMP — ``BM`` file header + 40-byte BITMAPINFOHEADER, 24-bit BGR,
  bottom-up rows padded to 4-byte boundaries (Windows DIB spec, public).
* PNG — a REAL compressed codec (RFC 2083 / ISO 15948, public):
  chunked container with CRC-32 integrity, DEFLATE-compressed scanlines
  (stdlib ``zlib``), and the five per-scanline predictive filters
  (None/Sub/Up/Average/Paeth).  8-bit gray / RGB / RGBA, non-interlaced.

These give ``extract_features(mode='real')`` an actual byte→samples /
byte→pixels path: the container parse is per-payload by nature (exactly
like a PIL/libsndfile decode would be), while everything downstream of the
parse is vectorized numpy.  Encoders exist so tests and demos can
synthesize valid payloads deterministically without external files.

Baseline JPEG (the lossy transform codec — Huffman entropy coding, 8×8
DCT, chroma subsampling) lives in functions/jpeg.py and is re-exported
here; its interoperability is cross-checked against the JVM's
``javax.imageio`` codec in tests (the one independent JPEG
implementation present in this environment).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from gstools_core_spark.functions.jpeg import (  # noqa: F401 — re-export
    decode_jpeg,
    encode_jpeg,
)


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


# --------------------------------------------------------------------------
# PNG (RFC 2083): a real compressed codec on nothing but stdlib zlib + numpy.
# Encoder filters are pure vectorized differences (every predictor input is
# a shift of the known raw image); the decoder's unfiltering is the inverse
# recurrence — Sub is a lag-bpp prefix sum (cumsum mod 256), Up is one
# vectorized add, Average/Paeth carry a left-pixel dependency so they scan
# pixels within the row (vectorized across the channel lanes).  That scan is
# per-payload by nature, same as libpng's.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_COLOR = {1: 0, 3: 2, 4: 6}  # channels → color type (gray, RGB, RGBA)
_PNG_CH = {0: 1, 2: 3, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (RFC 2083 §6.6), vectorized over int arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """8-bit non-interlaced PNG from (h, w) gray, (h, w, 3) RGB or
    (h, w, 4) RGBA uint8.  ``filter_type`` (0-4) is applied to EVERY
    scanline — any choice yields a valid PNG; 0 (None) is fastest, the
    predictive filters exist so tests can exercise every decoder branch."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in _PNG_COLOR:
        raise ValueError("expected (h, w[, {1,3,4}]) uint8")
    if filter_type not in range(5):
        raise ValueError(f"PNG filter type must be 0-4, got {filter_type}")
    h, w, ch = px.shape
    raw = px.reshape(h, w * ch).astype(np.int64)
    # predictor inputs: left/up/upleft are shifts of the raw image (a shift
    # by ch bytes within the flattened row == previous pixel, same lane)
    left = np.zeros_like(raw)
    left[:, ch:] = raw[:, :-ch]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    upleft = np.zeros_like(raw)
    upleft[1:, ch:] = raw[:-1, :-ch]
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:
        filt = raw - left
    elif filter_type == 2:
        filt = raw - up
    elif filter_type == 3:
        filt = raw - (left + up) // 2
    else:
        filt = raw - _paeth(left, up, upleft)
    lines = np.empty((h, 1 + w * ch), dtype=np.uint8)
    lines[:, 0] = filter_type
    lines[:, 1:] = filt % 256
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_COLOR[ch], 0, 0, 0)
    return b"".join(
        [
            _PNG_SIG,
            _png_chunk(b"IHDR", ihdr),
            _png_chunk(b"IDAT", zlib.compress(lines.tobytes(), level)),
            _png_chunk(b"IEND", b""),
        ]
    )


def decode_png(payload: bytes | bytearray, check_crc: bool = True) -> np.ndarray:
    """PNG → uint8 array: (h, w) for grayscale, (h, w, 3) RGB,
    (h, w, 4) RGBA.  Walks the chunk stream (multiple IDAT chunks are one
    DEFLATE stream per the spec), verifies each chunk's CRC-32 unless
    ``check_crc=False``, inflates, and inverts the per-scanline filter.
    16-bit, palette, or interlaced images raise NotImplementedError."""
    b = bytes(payload)
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(b):
            # covers payloads cut inside the data OR inside the 4-byte CRC
            # (struct.unpack on a short CRC slice would leak struct.error)
            raise ValueError("truncated PNG chunk")
        if check_crc:
            (crc,) = struct.unpack(">I", b[pos + 8 + length : pos + 12 + length])
            if crc != zlib.crc32(ctype + data) & 0xFFFFFFFF:
                raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color_type, comp, filt_m, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    if depth != 8 or color_type not in _PNG_CH or comp or filt_m or interlace:
        raise NotImplementedError(
            "only 8-bit non-interlaced gray/RGB/RGBA PNG supported "
            f"(depth={depth}, color_type={color_type}, interlace={interlace})"
        )
    ch = _PNG_CH[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + w * ch
    if raw.shape[0] != h * stride:
        raise ValueError("PNG IDAT length does not match IHDR dimensions")
    raw = raw.reshape(h, stride)
    out = np.empty((h, w * ch), dtype=np.uint8)
    prior = np.zeros(w * ch, dtype=np.int64)
    zeros_ch = np.zeros(ch, dtype=np.int64)
    for y in range(h):
        ft = int(raw[y, 0])
        row = raw[y, 1:].astype(np.int64)
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: recon(x) = filt(x) + recon(x-ch) → lag-ch cumsum
            rec = (row.reshape(w, ch).cumsum(axis=0) % 256).ravel()
        elif ft == 2:  # Up
            rec = (row + prior) % 256
        elif ft in (3, 4):  # Average / Paeth: left-pixel recurrence
            rowm = row.reshape(w, ch)
            priorm = prior.reshape(w, ch)
            recm = np.empty((w, ch), dtype=np.int64)
            lft = zeros_ch
            for i in range(w):
                if ft == 3:
                    pred = (lft + priorm[i]) >> 1
                else:
                    ul = priorm[i - 1] if i else zeros_ch
                    pred = _paeth(lft, priorm[i], ul)
                lft = (rowm[i] + pred) % 256
                recm[i] = lft
            rec = recm.ravel()
        else:
            raise ValueError(f"invalid PNG filter type {ft} on scanline {y}")
        out[y] = rec
        prior = rec if rec.dtype == np.int64 else rec.astype(np.int64)
    img = out.reshape(h, w, ch)
    return img[:, :, 0].copy() if ch == 1 else img
