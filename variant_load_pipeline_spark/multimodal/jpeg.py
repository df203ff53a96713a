"""Pure-stdlib baseline JPEG codec (struct + numpy) — a REAL compressed-
image decode path with no external image libraries, in the style of
``multimodal/png.py``.

Scope — the baseline-sequential subset a training-data pipeline's OWN
fixtures and thumbnails use, and the subset this module's encoder emits:

* decode: baseline DCT (SOF0), 8-bit, 1 component (grayscale) or 3
  components (YCbCr) with NO chroma subsampling (all sampling factors
  1x1), any number of DQT/DHT segments, no restart markers.  Progressive
  (SOF2), arithmetic coding, 12-bit, and subsampled scans raise
  ``ValueError`` with a clear message rather than mis-decoding.
* encode: baseline grayscale or 4:4:4 YCbCr with the ITU T.81 Annex K
  quantization + Huffman tables (the "typical" tables virtually every
  encoder ships), quality-scaled per the public IJG formula.

JPEG is lossy: round-trips are NOT bit-exact (DCT coefficient
quantization), so oracle queries gate on exact geometry + a bounded
reconstruction-error flag instead of exact pixel hashes — both codec
directions are deterministic, so the error (and therefore the flag) is
reproducible across runs and engines.

Scale stance: like png.py, this is the per-row kernel inside Arrow
batches (``binary_ops.decode_images(codec='jpeg')``); batching,
byte-aware partitioning, and fixed-schema outputs are the Spark-side
contract.  The 8x8 DCT/IDCT is a numpy matrix triple-product per block;
Huffman coding is the per-byte Python loop that a C codec would replace.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Tables from ITU-T T.81 (public spec): zigzag order, Annex K quantization
# and "typical" Huffman tables.
# --------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

STD_LUM_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

STD_CHR_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# (bits[1..16], values) — Annex K "typical" tables
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: forward D = C @ B @ C.T, inverse
    B = C.T @ D @ C."""
    c = np.zeros((8, 8))
    for k in range(8):
        a = np.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            c[k, n] = a * np.cos((2 * n + 1) * k * np.pi / 16.0)
    return c


_DCT = _dct_matrix()


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """Public IJG quality scaling (used by libjpeg and everything after)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (qt * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical T.81 assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the decoder."""
    return {(ln, c): s for s, (c, ln) in _canonical_codes(bits, vals).items()}


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker (EOI/RST) — treat as end of entropy data
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map the `size`-bit magnitude to a signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: no Huffman code matched in 16 bits")


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(img: np.ndarray) -> np.ndarray:
    y, cb, cr = img[..., 0], img[..., 1], img[..., 2]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def _encode_block(
    zz: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    writer: _BitWriter,
    pred: int,
) -> int:
    """Huffman-encode one zigzag-ordered quantized block (64 coefficients);
    returns the new DC predictor."""
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    size = _size_cat(diff)
    code, ln = dc_codes[size]
    writer.write(code, ln)
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    # AC run-length
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        size = _size_cat(v)
        code, ln = ac_codes[(run << 4) | size]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return pred


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(H, W) / (H, W, 1) grayscale or (H, W, 3) RGB uint8 -> baseline
    JFIF bytes (no subsampling)."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[..., 0]
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"expected (H,W)[,1|3] uint8, got {img.shape}")
    h, w = img.shape[:2]

    lum_qt = _quality_scale(STD_LUM_QT, quality)
    chr_qt = _quality_scale(STD_CHR_QT, quality)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    for tq, qt in ([(0, lum_qt)] if gray else [(0, lum_qt), (1, chr_qt)]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(qt[z]) for z in ZIGZAG)
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        tq = 0 if cid == 1 else 1
        sof += bytes([cid, 0x11, tq])  # 1x1 sampling
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT
    out += _dht_segment(0, 0, *DC_LUM)
    out += _dht_segment(1, 0, *AC_LUM)
    if not gray:
        out += _dht_segment(0, 1, *DC_CHR)
        out += _dht_segment(1, 1, *AC_CHR)
    # SOS
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        td_ta = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    if gray:
        planes = [_pad8(img.astype(np.float64))]
        qts = [lum_qt]
        tabs = [(_canonical_codes(*DC_LUM), _canonical_codes(*AC_LUM))]
    else:
        ycc = _rgb_to_ycbcr(img.astype(np.float64))
        planes = [_pad8(ycc[..., i]) for i in range(3)]
        qts = [lum_qt, chr_qt, chr_qt]
        lum = (_canonical_codes(*DC_LUM), _canonical_codes(*AC_LUM))
        chm = (_canonical_codes(*DC_CHR), _canonical_codes(*AC_CHR))
        tabs = [lum, chm, chm]

    writer = _BitWriter()
    # interleaved MCU scan; with 1x1 sampling an MCU is one block/component
    ph, pw = planes[0].shape
    preds = [0] * len(planes)
    q8 = [qt.reshape(8, 8).astype(np.float64) for qt in qts]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, plane in enumerate(planes):
                dc_codes, ac_codes = tabs[ci]
                block = plane[by : by + 8, bx : bx + 8] - 128.0
                quant = np.round(_DCT @ block @ _DCT.T / q8[ci]).astype(np.int64)
                zz = quant.reshape(-1)[ZIGZAG]
                preds[ci] = _encode_block(
                    zz, dc_codes, ac_codes, writer, preds[ci]
                )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W) uint8 (grayscale) or (H, W, 3) uint8
    (RGB).  Raises ValueError on progressive/subsampled/12-bit streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, tq)])
    scan = None  # ([(cid, td, ta)], entropy_offset)

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                table = np.zeros(64, dtype=np.int32)
                for z in range(64):
                    table[ZIGZAG[z]] = seg[p + z]
                qts[tq] = table
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                # sampling factors are irrelevant to a single-component
                # scan's layout (every MCU is one block), so grayscale
                # files with e.g. 2x2 factors decode fine; only
                # multi-component subsampled frames are out of scope
                if samp != 0x11 and nc > 1:
                    raise ValueError(
                        "chroma subsampling unsupported (sampling factors "
                        f"{samp >> 4}x{samp & 0xF}); this decoder covers the "
                        "4:4:4 / grayscale baseline subset"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0) is "
                "supported"
            )
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", seg[:2])
            if ri:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            comps = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i : 3 + 2 * i]
                comps.append((cid, tt >> 4, tt & 0xF))
            scan = (comps, pos + seg_len)
            break
        pos += seg_len

    if frame is None or scan is None:
        raise ValueError("truncated JPEG: missing SOF0 or SOS")
    h, w, fcomps = frame
    scomps, entropy_at = scan
    if len(scomps) != len(fcomps):
        raise ValueError("partial scans unsupported")

    reader = _BitReader(data[entropy_at:])
    nbx, nby = (w + 7) // 8, (h + 7) // 8
    planes = [np.zeros((nby * 8, nbx * 8)) for _ in fcomps]
    preds = [0] * len(fcomps)
    q_by_comp = [qts[tq].reshape(8, 8).astype(np.float64) for _, tq in fcomps]
    tabs = [(dc_tabs[td], ac_tabs[ta]) for _, td, ta in scomps]

    for by in range(nby):
        for bx in range(nbx):
            for ci in range(len(fcomps)):
                dc_t, ac_t = tabs[ci]
                zz = np.zeros(64, dtype=np.float64)
                size = _huff_decode(reader, dc_t)
                diff = _extend(reader.read_bits(size), size) if size else 0
                preds[ci] += diff
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = _huff_decode(reader, ac_t)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF
                    if size == 0:
                        if run != 15:
                            raise ValueError("invalid AC symbol")
                        k += 16  # ZRL
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC coefficient index overflow")
                    zz[k] = _extend(reader.read_bits(size), size)
                    k += 1
                coeffs = np.zeros(64, dtype=np.float64)
                coeffs[ZIGZAG] = zz
                block = coeffs.reshape(8, 8) * q_by_comp[ci]
                pix = _DCT.T @ block @ _DCT + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix

    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(planes, axis=-1)
    rgb = _ycbcr_to_rgb(ycc)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
