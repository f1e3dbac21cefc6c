"""Baseline JPEG codec — pure numpy + stdlib, no image library.

Completes the image-format surface next to the BMP and PNG lanes
(reference handles JPEG via PIL, utils.py:64-71 / core.py:119-134):
**baseline sequential DCT, 8-bit, 1 (gray) or 3 (YCbCr) components,
4:4:4 or 4:2:0 sampling, standard ITU T.81 Annex K quantization and
Huffman tables, JFIF markers, DRI/RST restart intervals.**  Outside
the frozen subset — progressive (SOF2), arithmetic coding, 12-bit,
CMYK — ``decode_jpeg`` raises ``ValueError`` (the PNG lane's honesty
contract).

Codec structure is spec-standard (markers → entropy-coded segments →
Huffman magnitude categories → zigzag → dequant → 8×8 IDCT →
level-shift → chroma upsample → BT.601 color transform); the DCT is
an exact orthonormal matrix product, so encode→decode error is pure
quantization error.  Per-image entropy decoding is inherently
sequential — it runs inside actor-pool batch stages like the other
per-document parse kernels (extract/tables/pdf lanes).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(ZIGZAG)

# ITU T.81 Annex K.1 / K.2 quantization tables (natural order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 Huffman specs: (bits[1..16], values)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])

# orthonormal 8-point DCT-II matrix: D @ x = DCT(x); D.T @ X = IDCT(X)
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * \
            (np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8))


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled, clamped table."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100 (got {quality})")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------- bit I/O

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:      # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec


class _BitReader:
    """Entropy-segment reader with 0xFF00 unstuffing and a 16-bit
    lookahead window (the standard fast-Huffman layout).  Any marker
    stops the fill (the byte stream virtually zero-pads past it —
    padding is only ever PEEKED on valid streams, and a 64-bit consumed
    cap turns endless garbage into ValueError)."""

    __slots__ = ("data", "pos", "acc", "nbits", "stopped", "padded")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.stopped = False
        self.padded = 0

    def _fill_byte(self) -> None:
        if not self.stopped and self.pos < len(self.data):
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] \
                    if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2
                else:          # RSTn / EOI / any marker: end of segment
                    self.stopped = True
            else:
                self.pos += 1
            if not self.stopped:
                self.acc = (self.acc << 8) | b
                self.nbits += 8
                return
        self.acc <<= 8         # virtual zero padding past the marker
        self.nbits += 8
        self.padded += 8
        if self.padded > 64:
            raise ValueError("truncated JPEG entropy stream")

    def peek16(self) -> int:
        while self.nbits < 16:
            self._fill_byte()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def consume(self, n: int) -> None:
        self.nbits -= n

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill_byte()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align_to_restart(self) -> bool:
        """Discard buffered bits, expect an RSTn at the current byte;
        consume it and resume.  Returns False when absent."""
        self.acc = 0
        self.nbits = 0
        self.padded = 0
        self.stopped = False
        if (self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2
            return True
        return False


# ---------------------------------------------------------------- huffman

def _build_encode_table(bits, values):
    code, k, table = 0, 0, {}
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


_DECODE_TABLE_CACHE: dict = {}


def _build_decode_table(bits, values):
    """16-bit lookahead arrays ``(sym[65536], length[65536])`` — every
    16-bit window whose prefix is a code maps to (symbol, code length);
    length 0 marks invalid prefixes.  Cached by table spec (the
    standard Annex K tables hit the cache after the first image)."""
    key = (tuple(bits), tuple(values))
    hit = _DECODE_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            start = code << (16 - length)
            end = (code + 1) << (16 - length)
            sym[start:end] = values[k]
            ln[start:end] = length
            code += 1
            k += 1
        code <<= 1
    _DECODE_TABLE_CACHE[key] = (sym, ln)
    return sym, ln


def _decode_symbol(reader: _BitReader, table) -> int:
    sym, ln = table
    w = reader.peek16()
    length = ln[w]
    if length == 0:
        raise ValueError("invalid JPEG Huffman code")
    reader.consume(int(length))
    return int(sym[w])


def _magnitude(v: int) -> tuple[int, int]:
    """value → (category s, s-bit representation) per spec F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _extend(v: int, s: int) -> int:
    """s-bit representation → value (spec F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------- encoder

def _quantize_plane(plane: np.ndarray, qtable: np.ndarray,
                    pad_to: int = 8) -> tuple[np.ndarray, int]:
    """Plane → (N, 64) quantized zigzag coefficient rows in raster
    block order (one batched FDCT einsum) + blocks-per-row count."""
    h, w = plane.shape
    H = (h + pad_to - 1) // pad_to * pad_to
    W = (w + pad_to - 1) // pad_to * pad_to
    p = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    blocks = (p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8).astype(np.float64) - 128.0)
    coef = np.einsum("ij,njk,kl->nil", _D, blocks, _D.T).reshape(-1, 64)
    q = np.round(coef / qtable).astype(np.int64)[:, ZIGZAG]
    return q, W // 8


def _encode_qz(writer, q, dc_tbl, ac_tbl, pred):
    """Huffman-encode one quantized zigzag row; touches NONZERO
    coefficients only (typical blocks are mostly zeros)."""
    diff = int(q[0]) - pred
    s, bitsv = _magnitude(diff)
    code, length = dc_tbl[s]
    writer.write(code, length)
    if s:
        writer.write(bitsv, s)
    nz = np.nonzero(q[1:])[0]
    prev = 0
    for i in nz:
        i = int(i) + 1
        run = i - prev - 1
        while run > 15:
            code, length = ac_tbl[0xF0]   # ZRL
            writer.write(code, length)
            run -= 16
        s, bitsv = _magnitude(int(q[i]))
        code, length = ac_tbl[(run << 4) | s]
        writer.write(code, length)
        writer.write(bitsv, s)
        prev = i
    if prev < 63:
        code, length = ac_tbl[0x00]       # EOB
        writer.write(code, length)
    return int(q[0])


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → baseline JFIF bytes.
    ``subsample=True`` emits 4:2:0 chroma (the common web layout);
    default 4:4:4.  ``restart_interval`` > 0 emits a DRI segment and
    RSTn markers every N MCUs (predictors reset — the resync feature
    real encoders use; exercises the decoder's restart path)."""
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg expects (h, w) gray or (h, w, 3) RGB")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)

    if gray:
        planes = [arr.astype(np.float64)]
    else:
        x = arr.astype(np.float64)
        r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            H2, W2 = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, H2 - h), (0, W2 - w)), mode="edge")
            crp = np.pad(cr, ((0, H2 - h), (0, W2 - w)), mode="edge")
            cb = cbp.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]

    out = bytearray(b"\xFF\xD8")                      # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"   # APP0
    for tid, qt in ((0, qt_l),) + (((1, qt_c),) if not gray else ()):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(int(v) for v in qt[ZIGZAG])
    # SOF0
    ncomp = 1 if gray else 3
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    samp_y = 0x22 if (subsample and not gray) else 0x11
    out += bytes([1, samp_y, 0])
    if not gray:
        out += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    # DHT
    for tc_th, (bits, vals) in (((0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA))
                                + (((0x01, HUFF_DC_CHROMA),
                                    (0x11, HUFF_AC_CHROMA))
                                   if not gray else ())):
        out += b"\xFF\xC4" + struct.pack(">H", 3 + 16 + len(vals)) \
            + bytes([tc_th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xFF\xDD" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    out += bytes([1, 0x00])
    if not gray:
        out += bytes([2, 0x11]) + bytes([3, 0x11])
    out += bytes([0, 63, 0])

    enc_dc_l = _build_encode_table(*HUFF_DC_LUMA)
    enc_ac_l = _build_encode_table(*HUFF_AC_LUMA)
    enc_dc_c = _build_encode_table(*HUFF_DC_CHROMA)
    enc_ac_c = _build_encode_table(*HUFF_AC_CHROMA)
    writer = _BitWriter()
    preds = [0, 0, 0]
    rst_n = 0
    mcu_count = 0

    def maybe_restart():
        nonlocal rst_n, preds, mcu_count
        mcu_count += 1
        if restart_interval and mcu_count % restart_interval == 0:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + rst_n])
            rst_n = (rst_n + 1) % 8
            preds = [0, 0, 0]

    if gray or not subsample:
        qz = [_quantize_plane(p, qt_l if c == 0 else qt_c)[0]
              for c, p in enumerate(planes)]
        n_blocks = qz[0].shape[0]
        for i in range(n_blocks):
            for c in range(len(planes)):
                dc = enc_dc_l if c == 0 else enc_dc_c
                ac = enc_ac_l if c == 0 else enc_ac_c
                preds[c] = _encode_qz(writer, qz[c][i], dc, ac, preds[c])
            if i < n_blocks - 1:
                maybe_restart()
    else:
        # 4:2:0 MCU = 4 luma blocks + 1 cb + 1 cr
        y, cb, cr = planes
        qz_y, nbx_y = _quantize_plane(y, qt_l, pad_to=16)
        H2, W2 = (h + 15) // 16 * 16 // 2, (w + 15) // 16 * 16 // 2
        qz_cb, nbx_c = _quantize_plane(
            np.pad(cb, ((0, H2 - cb.shape[0]), (0, W2 - cb.shape[1])),
                   mode="edge"), qt_c)
        qz_cr, _ = _quantize_plane(
            np.pad(cr, ((0, H2 - cr.shape[0]), (0, W2 - cr.shape[1])),
                   mode="edge"), qt_c)
        mys, mxs = (h + 15) // 16, (w + 15) // 16
        for my in range(mys):
            for mx in range(mxs):
                for sy in (0, 1):
                    for sx in (0, 1):
                        preds[0] = _encode_qz(
                            writer,
                            qz_y[(2 * my + sy) * nbx_y + 2 * mx + sx],
                            enc_dc_l, enc_ac_l, preds[0])
                preds[1] = _encode_qz(writer, qz_cb[my * nbx_c + mx],
                                      enc_dc_c, enc_ac_c, preds[1])
                preds[2] = _encode_qz(writer, qz_cr[my * nbx_c + mx],
                                      enc_dc_c, enc_ac_c, preds[2])
                if (my, mx) != (mys - 1, mxs - 1):
                    maybe_restart()
    writer.flush()
    out += writer.out
    out += b"\xFF\xD9"                                # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder

def _decode_coeffs(reader, dc_tbl, ac_tbl, pred):
    """One block's entropy decode → (zigzag int list, new DC pred).
    Dequant + IDCT happen BATCHED per component after the scan loop."""
    s = _decode_symbol(reader, dc_tbl)
    diff = _extend(reader.read_bits(s), s) if s else 0
    dc = pred + diff
    zz = [0] * 64
    zz[0] = dc
    i = 1
    while i < 64:
        rs = _decode_symbol(reader, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:       # ZRL
                i += 16
                continue
            break             # EOB
        i += r
        if i > 63:
            raise ValueError("JPEG AC run past block end")
        zz[i] = _extend(reader.read_bits(s), s)
        i += 1
    return zz, dc


def _idct_blocks(zz_rows: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """(N, 64) zigzag coefficients → (N, 8, 8) uint8 pixels, one
    batched einsum instead of N small matmuls."""
    coef = (zz_rows * qtable[ZIGZAG])[:, _UNZIGZAG] \
        .reshape(-1, 8, 8).astype(np.float64)
    px = np.einsum("ij,njk,kl->nil", _D.T, coef, _D) + 128.0
    return np.clip(np.round(px), 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w, channels) uint8 (1 = gray, 3 = RGB).
    Frozen subset: SOF0, 8-bit, ≤3 components, sampling 1×1 or 2×2
    luma; anything else — including any malformed stream — raises
    ValueError (totality fuzz-pinned)."""
    try:
        return _decode_jpeg(data)
    except (struct.error, IndexError) as exc:
        # lying segment lengths / truncated bodies surface as the same
        # loud-but-typed failure every malformed payload gets
        raise ValueError(f"malformed JPEG: {exc}") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[pos + 1]
        if marker == 0xD9:    # EOI without SOS
            break
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:    # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[p + 1:p + 65], dtype=np.uint8) \
                    .astype(np.int64)
                qtables[tq] = zz[_UNZIGZAG]
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc_th = body[p]
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                huff[tc_th] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential (SOF0) JPEG is in the frozen "
                "codec subset (progressive/arithmetic unsupported)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = body[0]
            scan_tbl = {}
            for c in range(ns):
                cid, tbls = body[1 + 2 * c], body[2 + 2 * c]
                scan_tbl[cid] = (tbls >> 4, tbls & 0x0F)
            return _decode_scan(data, pos + 2 + seglen, frame, scan_tbl,
                                qtables, huff, restart_interval)
        pos += 2 + seglen
    raise ValueError("JPEG has no scan data")


def _decode_scan(data, pos, frame, scan_tbl, qtables, huff,
                 restart_interval):
    h, w, comps = frame
    hs = [c[1] for c in comps]
    vs = [c[2] for c in comps]
    hmax, vmax = max(hs), max(vs)
    if not all(x in (1, 2) for x in hs + vs):
        raise ValueError("unsupported JPEG sampling factors")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = []
    for c, (cid, hi, vi, tq) in enumerate(comps):
        planes.append(np.zeros((mcus_y * vi * 8, mcus_x * hi * 8),
                               dtype=np.uint8))
        if tq not in qtables:
            raise ValueError(f"JPEG missing quant table {tq}")
    for cid, (td, ta) in scan_tbl.items():
        if (0x00 | td) not in huff or (0x10 | ta) not in huff:
            raise ValueError("JPEG missing Huffman table")

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    coeffs: list[list] = [[] for _ in comps]   # zigzag rows per component
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                if not reader.align_to_restart():
                    raise ValueError("missing JPEG restart marker")
                preds = [0] * len(comps)
            for c, (cid, hi, vi, tq) in enumerate(comps):
                td, ta = scan_tbl[cid]
                for by in range(vi):
                    for bx in range(hi):
                        zz, preds[c] = _decode_coeffs(
                            reader, huff[0x00 | td], huff[0x10 | ta],
                            preds[c])
                        coeffs[c].append(zz)
            mcu_count += 1

    # batched dequant + IDCT, then scatter blocks into the plane (the
    # per-component block order is MCU raster order)
    for c, (cid, hi, vi, tq) in enumerate(comps):
        px = _idct_blocks(np.asarray(coeffs[c], dtype=np.int64),
                          qtables[tq])
        i = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[c][y0:y0 + 8, x0:x0 + 8] = px[i]
                        i += 1

    out_planes = []
    for c, (cid, hi, vi, tq) in enumerate(comps):
        p = planes[c]
        if hi != hmax or vi != vmax:   # upsample chroma (nearest)
            p = p.repeat(vmax // vi, axis=0).repeat(hmax // hi, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return out_planes[0][:, :, None]
    y = out_planes[0].astype(np.float64)
    cb = out_planes[1].astype(np.float64) - 128.0
    cr = out_planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255) \
        .astype(np.uint8)
