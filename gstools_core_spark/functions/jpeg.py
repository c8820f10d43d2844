"""Pure-numpy baseline JPEG (ITU-T T.81 / ISO 10918-1, public spec).

The environment has no codec libraries, but baseline sequential JPEG
needs nothing beyond numpy: the 8×8 DCT is a fixed orthonormal matrix
product, quantization tables and Huffman tables ship in the file, and
entropy coding is bit-level Huffman with byte stuffing.  This gives the
multimodal ``mode='real'`` path a real LOSSY transform codec next to
PNG's lossless DEFLATE one.

Scope (encoder and decoder, mirrored):
* 8-bit baseline DCT, non-progressive, non-interleaved-restart
  (no RSTn markers emitted; decoder rejects them loudly).
* grayscale (1 component) and YCbCr 4:4:4 / H2V2 4:2:0 (3 components;
  the encoder emits 4:4:4, the decoder additionally upsamples 4:2:0).
* standard Annex K quantization + Huffman tables at encode time,
  arbitrary in-file tables at decode time.

The per-payload entropy scan is sequential by nature (same as libjpeg);
everything blockwise — DCT/IDCT, quantization, zigzag, level shift,
color transform — is vectorized numpy over all blocks at once.

Decode is exercised against the encoder round-trip (lossy: asserted via
PSNR and exact DC reconstruction of solid blocks) in
tests/test_multimodal_codecs.py.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag order, Annex K tables, orthonormal DCT matrix
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 luminance / chrominance quantization tables (quality ~50)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K.3 standard Huffman tables: (bits-per-length[1..16], values)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix T: DCT(X) = T @ X @ T.T (A.3.3)."""
    k = np.arange(8)
    T = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    T[0] *= 1.0 / np.sqrt(2.0)
    return T * 0.5


_T = _dct_matrix()


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the canonical code construction
    (C.2): codes of each length assigned in value order."""
    out = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol."""
    return {(l, c): s for s, (c, l) in _huff_codes(bits, values).items()}


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (B.1.1.5)
                self.buf.append(0x00)
        # trim consumed bits: without this acc grows into an unbounded
        # Python bigint over the scan and every shift/mask becomes O(scan
        # length) — encode turned quadratic in image size (measured ~18×
        # time for 4× pixels at 512×512)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # past the scan end: feed 1-bits (decoder stops at EOB
                # bookkeeping before ever using them meaningfully)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                elif 0xD0 <= nxt <= 0xD7:
                    raise NotImplementedError("JPEG restart markers not supported")
                else:
                    # a real marker: stop feeding scan bytes
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        # trim consumed bits (same unbounded-bigint quadratic as the
        # writer: read_bit only ever looks at the low nbits)
        self.acc &= (1 << self.nbits) - 1

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _category(v: int) -> tuple[int, int]:
    """value → (size, raw bits) with the T.81 ones'-complement convention
    for negatives (F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """inverse of _category (F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _blockify(ch: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h, w) plane → (nblocks, 8, 8) float blocks, edge-replicated to
    multiples of 8; also returns blocks-per-row/col."""
    h, w = ch.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((H, W), dtype=np.float64)
    padded[:h, :w] = ch
    padded[h:, :w] = ch[-1:, :]
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    return blocks.reshape(-1, 8, 8), H // 8, W // 8


def _deblockify(blocks: np.ndarray, by: int, bx: int, h: int, w: int) -> np.ndarray:
    full = blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return full[:h, :w]


def _encode_plane(
    blocks: np.ndarray, quant: np.ndarray, dc_tbl, ac_tbl, writer: _BitWriter,
    pred: int,
) -> int:
    """Forward DCT + quantize (vectorized over all blocks), then the
    sequential Huffman scan.  Returns the final DC predictor."""
    zz = _quantize_zigzag(blocks, quant)
    dc_codes = _huff_codes(*dc_tbl)
    ac_codes = _huff_codes(*ac_tbl)
    for row in zz:
        pred = _write_block(row, pred, dc_codes, ac_codes, writer)
    return pred


def _quantize_zigzag(blocks: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(n, 8, 8) pixel blocks → (n, 64) quantized zigzag coefficient rows —
    level shift, 2-D DCT, quantize, zigzag, all vectorized over n."""
    d = np.einsum("ij,njk,lk->nil", _T, blocks - 128.0, _T)
    q = np.round(d / quant).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _write_block(row, pred, dc_codes, ac_codes, writer) -> int:
    """Huffman-encode ONE quantized zigzag row; returns the new DC pred."""
    diff = int(row[0]) - pred
    pred = int(row[0])
    size, bits = _category(diff)
    c, l = dc_codes[size]
    writer.write(c, l)
    if size:
        writer.write(bits, size)
    run = 0
    nz = np.nonzero(row[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(row[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL
            writer.write(c, l)
            run -= 16
        size, bits = _category(v)
        c, l = ac_codes[(run << 4) | size]
        writer.write(c, l)
        writer.write(bits, size)
        run = 0
    if last < 63:
        c, l = ac_codes[0x00]  # EOB
        writer.write(c, l)
    return pred


def encode_jpeg(pixels: np.ndarray, quality_scale: int = 1) -> bytes:
    """Baseline JFIF from (h, w) grayscale or (h, w, 3) RGB uint8.
    ``quality_scale`` multiplies the Annex K tables (≥1 → coarser)."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB uint8")
    if quality_scale < 1:
        # a non-positive scale clips the quant tables to all 1s, where a
        # worst-case block can yield a quantized AC magnitude > 1023
        # (size 11) — a symbol absent from the Annex-K AC tables
        raise ValueError(f"quality_scale must be >= 1, got {quality_scale}")
    h, w = px.shape[:2]
    ql = np.clip(QUANT_LUMA * quality_scale, 1, 255)
    qc = np.clip(QUANT_CHROMA * quality_scale, 1, 255)
    if gray:
        planes = [px.astype(np.float64)]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, np.clip(cb, 0, 255), np.clip(cr, 0, 255)]

    out = bytearray(b"\xFF\xD8")  # SOI
    # APP0 / JFIF
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xFF\xE0" + struct.pack(">H", 2 + len(app0)) + app0
    for tid, q in ((0, ql), (1, qc))[: 1 if gray else 2]:
        body = bytes([tid]) + bytes(q.reshape(64)[ZIGZAG].astype(np.uint8))
        out += b"\xFF\xDB" + struct.pack(">H", 2 + len(body)) + body
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0 if cid == 1 else 1])  # 4:4:4
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if not gray:
        tables += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc, (bits, values) in tables:
        body = bytes([tc]) + bytes(bits) + bytes(values)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    writer = _BitWriter()
    if gray:
        blocks, _, _ = _blockify(planes[0])
        _encode_plane(blocks, ql, DC_LUMA, AC_LUMA, writer, 0)
    else:
        # interleaved 4:4:4 MCUs — one block per component per MCU, in
        # component order.  DCT/quantize/zigzag run vectorized over each
        # WHOLE plane up front and the Huffman code dicts are built once;
        # only the bit-level block interleaving is sequential.
        zzs = [
            _quantize_zigzag(_blockify(p)[0], q)
            for p, q in zip(planes, (ql, qc, qc))
        ]
        dc_luma, ac_luma = _huff_codes(*DC_LUMA), _huff_codes(*AC_LUMA)
        dc_chr, ac_chr = _huff_codes(*DC_CHROMA), _huff_codes(*AC_CHROMA)
        codes = [(dc_luma, ac_luma), (dc_chr, ac_chr), (dc_chr, ac_chr)]
        preds = [0, 0, 0]
        for i in range(zzs[0].shape[0]):
            for c in range(3):
                preds[c] = _write_block(
                    zzs[c][i], preds[c], codes[c][0], codes[c][1], writer
                )
    out += writer.flush()
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes | bytearray) -> np.ndarray:
    """Baseline JFIF → (h, w) gray or (h, w, 3) RGB uint8.  Supports
    grayscale and 3-component YCbCr with 4:4:4 or H2V2 4:2:0 sampling;
    progressive/arithmetic/12-bit/restart-interval streams raise
    NotImplementedError."""
    b = bytes(payload)
    if b[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    scan = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = b[pos + 1]
        if marker == 0xFF:  # legal 0xFF fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # length-less standalone markers (TEM, stray RSTn) between
            # segments: skip, don't misparse what follows as a length field
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        body = b[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:
            while body:
                pq, tid = body[0] >> 4, body[0] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(body[1:65], dtype=np.uint8).astype(np.int32)
                quants[tid] = tbl[UNZIGZAG].reshape(8, 8)
                body = body[65:]
        elif marker == 0xC4:
            while body:
                tc, tid = body[0] >> 4, body[0] & 0x0F
                bits = list(body[1:17])
                nvals = sum(bits)
                values = list(body[17 : 17 + nvals])
                tbl = _huff_decode_table(bits, values)
                (huff_ac if tc else huff_dc)[tid] = tbl
                body = body[17 + nvals :]
        elif marker == 0xC0:
            prec = body[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline JPEG")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC1,):
            raise NotImplementedError("extended sequential JPEG")
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG")
        elif marker == 0xDD:
            (ri,) = struct.unpack(">H", body[:2])
            if ri:
                raise NotImplementedError("JPEG restart intervals")
        elif marker == 0xDA:
            ns = body[0]
            sel = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                sel.append((cs, tt >> 4, tt & 0x0F))
            scan = sel
            scan_start = pos
            break
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    h, w, comps = frame
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — one
        # block per MCU in the component's own row-major order,
        # regardless of the sampling factors declared in SOF (e.g. a
        # grayscale file transcoded from 4:2:0 keeps 2×2 factors).
        # Forcing 1×1 here makes the generic MCU loop below implement
        # exactly that rule instead of scrambling block order.
        cid, _, _, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    if len(comps) > 1 and len(scan) != len(comps):
        # legal T.81 non-interleaved scans (SOS Ns=1 per component) would
        # otherwise surface as an opaque KeyError from scan_by_comp below
        raise NotImplementedError("multi-scan (non-interleaved) JPEG not supported")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not all(hmax % c[1] == 0 and vmax % c[2] == 0 for c in comps):
        # the generic MCU loop + repeat-upsampling handles any divisor mix
        # (4:4:4, 4:2:0, 4:2:2, …); non-divisor factors would produce an
        # undersized upsampled plane and an opaque shape error
        raise NotImplementedError("non-divisor JPEG sampling factors not supported")

    reader = _BitReader(b[scan_start:])
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcux, mcuy = -(-w // mcu_w), -(-h // mcu_h)
    # per component: collected quantized blocks in MCU order
    comp_blocks: dict[int, list] = {c[0]: [] for c in comps}
    preds = {c[0]: 0 for c in comps}
    scan_by_comp = {s[0]: s for s in scan}
    for _ in range(mcux * mcuy):
        for cid, hs, vs, tq in comps:
            _, td, ta = scan_by_comp[cid]
            for _ in range(hs * vs):
                zz = np.zeros(64, dtype=np.int64)
                size = reader.read_symbol(huff_dc[td])
                diff = _extend(reader.read_bits(size), size)
                preds[cid] += diff
                zz[0] = preds[cid]
                k = 1
                while k < 64:
                    rs = reader.read_symbol(huff_ac[ta])
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("JPEG AC run past block end")
                    zz[k] = _extend(reader.read_bits(rs & 0x0F), rs & 0x0F)
                    k += 1
                comp_blocks[cid].append(zz)

    planes = {}
    for cid, hs, vs, tq in comps:
        blocks = np.stack(comp_blocks[cid])  # (n, 64) zigzag quantized
        spatial = np.zeros((blocks.shape[0], 64))
        spatial[:, ZIGZAG] = blocks
        d = spatial.reshape(-1, 8, 8) * quants[tq]
        # vectorized IDCT over all blocks + level shift
        px = np.einsum("ji,njk,kl->nil", _T, d, _T) + 128.0
        # blocks arrive in MCU order: reassemble per component
        bw, bh = mcux * hs, mcuy * vs
        plane = np.zeros((bh * 8, bw * 8))
        idx = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(vs):
                    for bx in range(hs):
                        plane[
                            (my * vs + by) * 8 : (my * vs + by + 1) * 8,
                            (mx * hs + bx) * 8 : (mx * hs + bx + 1) * 8,
                        ] = px[idx]
                        idx += 1
        if hs < hmax or vs < vmax:
            plane = plane.repeat(vmax // vs, axis=0).repeat(hmax // hs, axis=1)
        planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        out = planes[comps[0][0]]
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
    y, cb, cr = (planes[c[0]] for c in comps)
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
