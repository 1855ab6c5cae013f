"""Minimal REAL baseline JPEG codec — standard library + numpy only.

Moves the last stubbed image-format family (JFIF/JPEG, the dominant
real-world type) to a real decode path: ``decode_jpeg`` parses markers,
builds canonical Huffman tables from DHT, entropy-decodes the
interleaved MCU stream (byte unstuffing, DC prediction, restart
markers), dequantizes, inverse-zigzags, applies an exact orthonormal
IDCT, and reassembles the luma raster (grayscale and YCbCr with
sampling factors up to 2×2 — i.e. 4:4:4, 4:2:2, 4:2:0). ``encode_jpeg``
is the matching baseline encoder (FDCT → quantize → Annex-K Huffman),
used by the synthetic-source generators and the round-trip tests.

Scope is honest-partial like the PNG codec: baseline sequential DCT
(SOF0) only — progressive (SOF2), arithmetic coding, and 12-bit depth
raise ``NotImplementedError`` and the Spark operators fall back to the
documented stub path (`multimodal._CODEC_ERRORS`).

Coefficient cost note: the per-bit entropy decode is a Python loop, but
it is bounded by *content* size exactly like the PNG un-filter loops —
the synthetic corpus images are 16–31 px (≤ 16 MCUs), and the Spark
side crosses into Python once per Arrow batch, not per row
(`multimodal.decode_metadata`). A production deployment would swap
PIL/libjpeg-turbo in behind the same ``decode_fn`` seam.

Parity anchors (tests/test_jpeg_codec.py): IDCT(FDCT(x)) ≡ x to 1e-10
(transform correctness independent of the entropy coder), Huffman
symbol round-trip, decode(encode(img)) within the quantization error
bound, marker metadata exact, and stream robustness (truncation,
progressive files, junk) mapping to the documented error classes.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# ITU-T T.81 Annex K quantization tables (quality 50 reference)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,   12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,   14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,  18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,  47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,  99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,  99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K typical Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II matrix: A[u,x] = c(u)/2 · cos((2x+1)uπ/16),
# c(0)=1/√2 else 1. FDCT is A·f·Aᵀ (exactly T.81's S(u,v)), IDCT is
# Aᵀ·S·A; A·Aᵀ=I so the pair is an exact inverse in floats.
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _A[_u, _x] = 0.5 * c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def fdct2(block: np.ndarray) -> np.ndarray:
    """Forward 8×8 DCT (T.81 §A.3.3) on a level-shifted float block."""
    return _A @ block @ _A.T


def idct2(coef: np.ndarray) -> np.ndarray:
    """Inverse 8×8 DCT — exact inverse of ``fdct2``."""
    return _A.T @ coef @ _A


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a reference quant table (1..100)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int32)


# -------------------------------------------------------------- encoding


class _BitWriter:
    """Deferred MSB-first bit writer (r16): fields are recorded as
    (value, length) pairs and packed in ONE numpy pass at ``flush``
    — per-field big-int shifting plus the per-byte stuffing loop was
    ~25 % of the encode cost. The emitted bytes are identical: bits
    are packed MSB-first in write order, the final partial byte is
    padded with 1-bits, and a 0x00 is inserted after every 0xFF
    (T.81 §B.1.1.5) exactly as the streaming writer did."""

    def __init__(self) -> None:
        self.vals: list[int] = []
        self.lens: list[int] = []
        self.out = bytearray()

    def write(self, value: int, length: int) -> None:
        if length:
            self.vals.append(value & ((1 << length) - 1))
            self.lens.append(length)

    def flush(self) -> None:
        if not self.vals:
            return
        vals = np.asarray(self.vals, dtype=np.int64)
        lens = np.asarray(self.lens, dtype=np.int64)
        j = np.arange(16, dtype=np.int64)
        # write-order bit j of a field = bit (length-1-j) of its value
        shifts = lens[:, None] - 1 - j
        bits = ((vals[:, None] >> np.maximum(shifts, 0)) & 1).astype(np.uint8)
        mask = j < lens[:, None]
        flat = bits[mask]
        pad = (-len(flat)) % 8
        if pad:
            flat = np.concatenate([flat, np.ones(pad, dtype=np.uint8)])
        packed = np.packbits(flat, bitorder="big")
        stuff_at = np.flatnonzero(packed == 0xFF)
        if len(stuff_at):
            packed = np.insert(packed, stuff_at + 1, 0)
        self.out += packed.tobytes()
        self.vals, self.lens = [], []


def _huff_encode_map(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from canonical (BITS, HUFFVAL)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 magnitude category: value → (size, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _encode_block(w: _BitWriter, zz: list[int], pred: int,
                  dc_map: dict, ac_map: dict) -> int:
    """Huffman-encode one quantized 8×8 block; returns the new DC
    pred. ``zz`` is the ZIGZAG-ordered coefficient list (r16: callers
    batch the zigzag gather + ``tolist`` across every block — looping
    a Python list of ints beats per-element ndarray indexing ~3×, and
    the emitted fields append straight onto the deferred writer)."""
    vals, lens = w.vals, w.lens
    diff = zz[0] - pred
    size, bitsv = _magnitude(diff)
    code, ln = dc_map[size]
    vals.append(code)
    lens.append(ln)
    if size:
        vals.append(bitsv)
        lens.append(size)
    run = 0
    zrl = ac_map[0xF0]
    for v in zz[1:]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            vals.append(zrl[0])         # ZRL
            lens.append(zrl[1])
            run -= 16
        size, bitsv = _magnitude(v)
        code, ln = ac_map[(run << 4) | size]
        vals.append(code)
        lens.append(ln)
        vals.append(bitsv)
        lens.append(size)
        run = 0
    if run:
        code, ln = ac_map[0x00]         # EOB
        vals.append(code)
        lens.append(ln)
    return zz[0]


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _dht_seg(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xFFC4, bytes([tc_th] + bits[1:17] + vals))


def encode_jpeg(width: int, height: int, pixels: bytes,
                quality: int = 85, subsample: bool = False) -> bytes:
    """Minimal REAL baseline JPEG encoder.

    ``pixels`` is a grayscale raster (width·height bytes) — encoded as a
    1-component JFIF. ``subsample=True`` instead encodes a 3-component
    YCbCr 4:2:0 image (chroma synthesized from the luma so the decoder's
    interleaved-MCU and upsampling paths get exercised); the decoded
    luma plane still round-trips against ``pixels``."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    dc_l = _huff_encode_map(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huff_encode_map(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huff_encode_map(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huff_encode_map(AC_CHROMA_BITS, AC_CHROMA_VALS)

    def blocks_of(plane: np.ndarray):
        h, w0 = plane.shape
        ph, pw = -(-h // 8) * 8, -(-w0 // 8) * 8
        padded = np.pad(plane, ((0, ph - h), (0, pw - w0)), mode="edge")
        return padded.astype(np.float64), ph // 8, pw // 8

    # DQT payload is the table in ZIGZAG serialization (T.81 §B.4.1):
    # payload[k] = natural_table[ZIGZAG[k]]
    out = bytearray(b"\xFF\xD8")                       # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0x00]) + bytes(int(ql[z]) for z in ZIGZAG))
    if subsample:
        out += _seg(0xFFDB, bytes([0x01]) + bytes(int(qc[z]) for z in ZIGZAG))

    ncomp = 3 if subsample else 1
    sof_comps = b""
    if subsample:
        sof_comps += bytes([1, 0x22, 0])   # Y: 2x2 sampling, qtable 0
        sof_comps += bytes([2, 0x11, 1])   # Cb
        sof_comps += bytes([3, 0x11, 1])   # Cr
    else:
        sof_comps += bytes([1, 0x11, 0])
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, height, width, ncomp) + sof_comps)
    out += _dht_seg(0x00, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_seg(0x10, AC_LUMA_BITS, AC_LUMA_VALS)
    if subsample:
        out += _dht_seg(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_seg(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)

    if subsample:
        sos_comps = bytes([1, 0x00, 2, 0x11, 3, 0x11])
    else:
        sos_comps = bytes([1, 0x00])
    out += _seg(0xFFDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))

    def grid_coefs(plane: np.ndarray, qt8: np.ndarray) -> np.ndarray:
        """Batched FDCT+quantize of an 8-aligned plane: one broadcast
        matmul over all blocks (identical per-block arithmetic)."""
        gy, gx = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (plane.reshape(gy, 8, gx, 8).transpose(0, 2, 1, 3)
                  .reshape(gy * gx, 8, 8))
        return np.round((_A @ (blocks - 128.0) @ _A.T) / qt8).astype(np.int32)

    def zz_lists(coefs: np.ndarray) -> list[list[int]]:
        """Batched zigzag gather + tolist for every block at once."""
        return coefs.reshape(-1, 64)[:, ZIGZAG].tolist()

    w = _BitWriter()
    if not subsample:
        padded, by, bx = blocks_of(img)
        coefs = grid_coefs(padded, ql.astype(np.float64).reshape(8, 8))
        zzs = zz_lists(coefs)
        pred = 0
        for i in range(by * bx):
            pred = _encode_block(w, zzs[i], pred, dc_l, ac_l)
    else:
        # YCbCr 4:2:0: luma = img; chroma planes synthesized from the
        # 2×2-mean of the luma (deterministic, content-derived) so the
        # decoder's subsampled MCU path is exercised for real.
        ch, cw = -(-height // 2), -(-width // 2)
        pad_y = np.pad(img, ((0, ch * 2 - height), (0, cw * 2 - width)),
                       mode="edge").astype(np.float64)
        mean2 = (pad_y[0::2, 0::2] + pad_y[0::2, 1::2]
                 + pad_y[1::2, 0::2] + pad_y[1::2, 1::2]) / 4.0
        cb = (255.0 - mean2)
        cr = mean2.copy()
        ql8 = ql.astype(np.float64).reshape(8, 8)
        qc8 = qc.astype(np.float64).reshape(8, 8)
        # MCU = 16×16 luma + 8×8 cb + 8×8 cr
        mby, mbx = -(-height // 16), -(-width // 16)
        ypad = np.pad(img, ((0, mby * 16 - height), (0, mbx * 16 - width)),
                      mode="edge").astype(np.float64)
        cbp = np.pad(cb, ((0, mby * 8 - cb.shape[0]), (0, mbx * 8 - cb.shape[1])),
                     mode="edge")
        crp = np.pad(cr, ((0, mby * 8 - cr.shape[0]), (0, mbx * 8 - cr.shape[1])),
                     mode="edge")
        yzz = zz_lists(grid_coefs(ypad, ql8))   # (2·mby × 2·mbx) grid
        czz = [zz_lists(grid_coefs(cbp, qc8)), zz_lists(grid_coefs(crp, qc8))]
        preds = [0, 0, 0]
        for my in range(mby):
            for mx in range(mbx):
                for sy in range(2):
                    for sx in range(2):
                        i = (my * 2 + sy) * (mbx * 2) + (mx * 2 + sx)
                        preds[0] = _encode_block(w, yzz[i], preds[0],
                                                 dc_l, ac_l)
                for ci in (1, 2):
                    i = my * mbx + mx
                    preds[ci] = _encode_block(w, czz[ci - 1][i],
                                              preds[ci], dc_c, ac_c)
    w.flush()
    out += w.out
    out += b"\xFF\xD9"                                 # EOI
    return bytes(out)


def _dezig(qt_zigzag: np.ndarray) -> np.ndarray:
    """Quant table in zigzag serialization → natural 8×8 order."""
    nat = np.zeros(64, dtype=np.float64)
    nat[ZIGZAG] = qt_zigzag
    return nat.reshape(8, 8)


# -------------------------------------------------------------- decoding


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.fake_bytes = 0   # zero-fill past EOF; bounded (see _fill)

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # A legitimate stream only ever reads pad bits within
                # the final byte; needing whole synthetic bytes means
                # the entropy stream was truncated.
                self.fake_bytes += 1
                if self.fake_bytes > 4:
                    raise ValueError("entropy stream truncated")
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1               # stuffed byte
                else:
                    # marker reached — feed zeros (caller handles RST
                    # boundaries explicitly via resync)
                    self.pos -= 1
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            self.acc = ((self.acc << 8) | byte) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        """Bulk extraction: one fill + one shift-mask, not n read_bit
        calls (entropy decode is the codec's hot loop)."""
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def peek16(self) -> int:
        """Next 16 bits without consuming (Huffman fast path)."""
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n

    def resync_to_marker(self) -> int | None:
        """Drop to the next marker (for RST handling); returns it."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = struct.unpack(">H", self.data[self.pos:self.pos + 2])[0]
                self.pos += 2
                return m
            self.pos += 1
        return None


class _HuffTable:
    """Canonical Huffman decode via (length → [min_code, max_code]).

    r16: codes of length ≤ 8 — which is every standard-table symbol
    the synthetic corpus actually hits on its hot path — decode
    through a 256-entry PEEK TABLE (one list index + skip); longer
    codes fall through to the original per-length comparison loop,
    so symbols and error behavior are unchanged."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            if bits[ln]:
                self.val_ptr[ln] = k
                self.min_code[ln] = code
                code += bits[ln]
                k += bits[ln]
                self.max_code[ln] = code - 1
            code <<= 1
        self.vals = vals
        lut: list[tuple[int, int] | None] = [None] * 256
        code, k = 0, 0
        for ln in range(1, 9):
            for _ in range(bits[ln]):
                base = code << (8 - ln)
                ent = (vals[k], ln)
                for fill in range(1 << (8 - ln)):
                    lut[base | fill] = ent
                code += 1
                k += 1
            code <<= 1
        self._lut = lut

    def decode(self, br: _BitReader) -> int:
        """Peek canonical decode: LUT on the top 8 bits, per-length
        comparison loop for longer codes (peek16 inlined — one call
        per coded symbol)."""
        if br.nbits < 16:
            br._fill()
        peeked = (br.acc >> (br.nbits - 16)) & 0xFFFF
        hit = self._lut[peeked >> 8]
        if hit is not None:
            sym, ln = hit
            br.nbits -= ln
            return sym
        for ln in range(9, 17):
            code = peeked >> (16 - ln)
            if self.max_code[ln] >= 0 and code <= self.max_code[ln]:
                br.skip(ln)
                return self.vals[self.val_ptr[ln] + code - self.min_code[ln]]
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map ``size`` appended bits to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> dict:
    """REAL baseline JPEG decoder (stdlib + numpy).

    Returns {width, height, n_components, pixels} where ``pixels`` is
    the reconstructed LUMA raster (width·height bytes) — the channel
    every downstream operator (features, resize) consumes; chroma is
    decoded (it participates in the MCU stream and DC prediction) but
    only its presence is reported. Raises ``ValueError`` on malformed
    streams and ``NotImplementedError`` for non-baseline variants
    (progressive SOF2, arithmetic coding, 12-bit) — callers fall back
    to the stub path via ``multimodal._CODEC_ERRORS``."""
    if len(data) < 4 or data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = struct.unpack(">H", data[pos:pos + 2])[0]
        pos += 2
        if marker == 0xFFD9:
            break
        if 0xFFD0 <= marker <= 0xFFD7:
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment body")
        if marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                      0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                "only baseline sequential DCT (SOF0) is supported"
            )
        if marker == 0xFFDB:                      # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(body[p + 1:p + 65], dtype=np.uint8)
                if len(zz) != 64:
                    raise ValueError("short DQT")
                qtables[tq] = _dezig(zz.astype(np.int32))
                p += 65
        elif marker == 0xFFC4:                    # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = [0] + list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                if len(vals) != n:
                    raise ValueError("short DHT")
                htables[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + n
        elif marker == 0xFFC0:                    # SOF0
            prec, h, w0, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"w": w0, "h": h, "comps": comps}
        elif marker == 0xFFDD:                    # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xFFDA:                    # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "dc": tdta >> 4, "ac": tdta & 0x0F})
            pos += seglen
            return _decode_scan(data, pos, frame, scan, qtables, htables,
                                restart_interval)
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qtables, htables, dri) -> dict:
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 unsupported")
    w0, h0 = frame["w"], frame["h"]
    mcux = -(-w0 // (8 * hmax))
    mcuy = -(-h0 // (8 * vmax))
    planes = {}
    for c in scan:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)

    br = _BitReader(data[pos:])
    preds = {c["id"]: 0 for c in scan}
    n_mcus = mcux * mcuy
    # Entropy decode is necessarily sequential; the IDCT is not — so
    # coefficients accumulate per component and one batched matmul
    # (identical per-block arithmetic, numpy broadcast) transforms all
    # blocks at the end instead of paying small-matrix overhead per
    # block inside the bit loop.
    pending: dict[int, tuple[list, list]] = {
        c["id"]: ([], []) for c in scan
    }
    # r16: table lookups hoisted out of the MCU loop (they are
    # constant per scan — formerly 3 dict probes per component per
    # MCU), the zigzag buffer is a plain Python list (per-element
    # ndarray stores were ~1/4 of the scan loop), and dequantization
    # moved into the batched matmul stage below (one broadcast
    # multiply per component instead of one 8×8 multiply per block —
    # identical elementwise arithmetic).
    comp_tabs = []
    for c in scan:
        dc_t = htables.get((0, c["dc"]))
        ac_t = htables.get((1, c["ac"]))
        qt = qtables.get(c["tq"])
        if dc_t is None or ac_t is None or qt is None:
            raise ValueError("missing Huffman/quant table")
        comp_tabs.append((c, dc_t, ac_t))
    for m in range(n_mcus):
        if dri and m and m % dri == 0:
            marker = br.resync_to_marker()
            if marker is None or not (0xFFD0 <= marker <= 0xFFD7):
                raise ValueError("expected restart marker")
            preds = {c["id"]: 0 for c in scan}
        my, mx = divmod(m, mcux)
        for c, dc_t, ac_t in comp_tabs:
            cid = c["id"]
            coefs_list, pos_list = pending[cid]
            for sy in range(c["v"]):
                for sx in range(c["h"]):
                    size = dc_t.decode(br)
                    diff = _extend(br.read_bits(size), size)
                    preds[cid] += diff
                    zz = [0] * 64
                    zz[0] = preds[cid]
                    k = 1
                    while k < 64:
                        rs = ac_t.decode(br)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break                     # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(br.read_bits(s), s)
                        k += 1
                    y0 = (my * c["v"] + sy) * 8
                    x0 = (mx * c["h"] + sx) * 8
                    coefs_list.append(zz)
                    pos_list.append((y0, x0))
    for c in scan:
        coefs, positions = pending[c["id"]]
        if not coefs:
            continue
        qt = qtables[c["tq"]]
        dezig = np.empty((len(coefs), 64), dtype=np.float64)
        dezig[:, ZIGZAG] = np.asarray(coefs, dtype=np.float64)
        blocks = (_A.T @ (dezig.reshape(-1, 8, 8) * qt) @ _A) + 128.0
        plane = planes[c["id"]]
        for blk, (y0, x0) in zip(blocks, positions):
            plane[y0:y0 + 8, x0:x0 + 8] = blk

    luma = scan[0]
    lp = planes[luma["id"]]
    # luma plane may itself be subsampled relative to the frame grid if
    # its factors are below hmax/vmax (not the case for any standard
    # layout, where Y carries the max factors) — replicate if so
    ry, rx = vmax // luma["v"], hmax // luma["h"]
    if ry > 1 or rx > 1:
        lp = np.repeat(np.repeat(lp, ry, axis=0), rx, axis=1)
    raster = np.clip(np.round(lp[:h0, :w0]), 0, 255).astype(np.uint8)
    return {
        "width": w0, "height": h0, "n_components": len(frame["comps"]),
        "pixels": raster.tobytes(),
    }
