"""JPEG codec — stdlib + numpy, no imaging library.

Implements the subset of ISO/IEC 10918-1 needed for real multimodal
pipelines: marker parsing, the standard Annex-K quantization and
Huffman tables, DC prediction, run-length AC coding, zigzag, float
IDCT/DCT, byte stuffing, grayscale and YCbCr 4:4:4 / 4:2:0 color,
baseline (SOF0) and extended-sequential (SOF1) frames, PROGRESSIVE
(SOF2) frames with spectral selection + successive approximation
(DC/AC first + refinement scans, EOB runs), and restart intervals
(DRI/RSTn) in both modes. Arithmetic coding and 12-bit precision
raise (explicitly — not silently wrong).

The reference platform renders JPEG through javax.imageio (Pencode.java)
rather than its own codec; this module exists so the multimodal tier's
decode step is real rather than stubbed.

Determinism note: JPEG is lossy, but a block-constant image whose gray
levels are multiples of the DC quantizer (16 at the standard table)
round-trips EXACTLY — DC-only blocks reconstruct to their input. The
oracled query uses that construction so DuckDB can replay pixel math
with no codec.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- Annex K tables (JPEG spec, public) -------------------------------

QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# (bits, values) per the spec's typical tables
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Progressive AC table: the typical sequential tables carry no EOBn
# (n>0) symbols, so progressive scans declare this flat 9-bit table in
# DHT instead — 176 symbols = EOB0..EOB14, ZRL, and every (run,size)
# with size 1..10. All codes 9 bits, none all-ones (spec C.2 constraint).
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = ([r << 4 for r in range(15)] + [0xF0]
                + [(r << 4) | s for r in range(16) for s in range(1, 11)])

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# DCT-II basis matrix: A[u, x] = C(u)/2 * cos((2x+1)uπ/16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _build_code_table(bits, vals):
    """(bits, vals) → {symbol: (code, length)} (canonical Huffman,
    spec figure C.1/C.2 procedure)."""
    sizes = []
    for length in range(1, 17):
        sizes += [length] * bits[length - 1]
    codes = {}
    code = 0
    prev = 0
    for sym, size in zip(vals, sizes):
        code <<= size - prev
        codes[sym] = (code, size)
        code += 1
        prev = size
    return codes


def _build_decode_table(bits, vals):
    """(bits, vals) → {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


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
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.buf)

    def restart(self, n: int) -> None:
        """1-pad to a byte boundary and emit RSTn (markers aren't stuffed)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf += bytes((0xFF, 0xD0 + (n & 7)))


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError("unexpected marker in entropy stream")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

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

    def read_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker (spec F.2.1.3.1)."""
        self.acc = 0
        self.nbits = 0
        if (self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


def _magnitude(v: int):
    """DC/AC magnitude category encoding (spec F.1.2.1): (size, bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits >> (size - 1):
        return bits
    return bits - (1 << size) + 1


# -------------------------------------------------------------- encoder

def _quantize_plane(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(h, w) int plane [0,255], multiple-of-8 dims → (by, bx, 64)
    zigzag-ordered quantized DCT coefficients (vectorized over blocks)."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.astype(np.float64).reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,ijxy,vy->ijuv", _A, blocks, _A)
    q = np.round(coef / qt).astype(np.int64)
    return q.reshape(by, bx, 64)[:, :, ZIGZAG]


def _encode_block_sequential(bw, zz, pred, dc_codes, ac_codes) -> int:
    """Entropy-code one zigzag block (spec F.1.2); returns the new DC
    predictor."""
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return pred


def _dqt_segment(tq: int, qt: np.ndarray) -> bytes:
    qz = qt.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + qz


def _dht_segments() -> bytes:
    out = bytearray()
    dht = bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    dht = bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    return bytes(out)


_JFIF = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"


def encode_jpeg_gray(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """8-bit grayscale baseline JPEG with the Annex-K luminance tables.
    Dimensions must be multiples of 8 (no edge replication — keeps the
    codec exact on block-constant inputs). ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs."""
    h, w = img.shape
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg_gray needs multiple-of-8 dimensions")
    zz = _quantize_plane(img, QUANT_LUMA)

    dc_codes = _build_code_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _build_code_table(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.restart(rst)
                rst = (rst + 1) & 7
                pred = 0
            pred = _encode_block_sequential(bw, zz[by, bx], pred, dc_codes, ac_codes)
            mcu += 1
    entropy = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _JFIF
    out += _dqt_segment(0, QUANT_LUMA)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    out += _dht_segments()
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_color(rgb: np.ndarray) -> bytes:
    """8-bit RGB → baseline YCbCr 4:4:4 JPEG (Annex-K luma + chroma
    quant tables; the typical luminance Huffman tables shared by all
    components, which is valid — tables are whatever DHT declares).
    Arbitrary dimensions: edges are replicated to the block grid and
    the decoder crops back to the SOF dimensions."""
    h, w = rgb.shape[:2]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if (ph, pw) != (h, w):
        rgb = np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    # ITU-R BT.601 forward transform (JFIF full-range)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]
    qts = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
    zzs = [_quantize_plane(p, qt) for p, qt in zip(planes, qts)]

    dc_codes = _build_code_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _build_code_table(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    preds = [0, 0, 0]
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(3):  # interleaved 4:4:4 MCU = one block each
                preds[ci] = _encode_block_sequential(
                    bw, zzs[ci][by, bx], preds[ci], dc_codes, ac_codes)
    entropy = bw.flush()

    out = bytearray(b"\xff\xd8")
    out += _JFIF
    out += _dqt_segment(0, QUANT_LUMA)
    out += _dqt_segment(1, QUANT_CHROMA)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes((1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    out += _dht_segments()
    out += b"\xff\xda" + struct.pack(">HB", 12, 3) + bytes((1, 0x00, 2, 0x00, 3, 0x00)) + b"\x00\x3f\x00"
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color_420(rgb: np.ndarray) -> bytes:
    """8-bit RGB → baseline YCbCr 4:2:0 JPEG (luma 2x2 sampling, chroma
    box-downsampled 2x): MCU = 4 Y blocks + 1 Cb + 1 Cr. Exercises the
    decoder's subsampled interleaved path and chroma upsampling."""
    h, w = rgb.shape[:2]
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16  # MCU = 16x16 pixels
    if (ph, pw) != (h, w):
        rgb = np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    y = np.clip(np.round(y), 0, 255)
    # chroma: 2x2 box average then round (the standard downsample)
    cb = np.clip(np.round(cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))), 0, 255)
    cr = np.clip(np.round(cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))), 0, 255)
    zy = _quantize_plane(y, QUANT_LUMA)
    zcb = _quantize_plane(cb, QUANT_CHROMA)
    zcr = _quantize_plane(cr, QUANT_CHROMA)

    dc_codes = _build_code_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _build_code_table(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(ph // 16):
        for mx in range(pw // 16):
            for by, bx in ((0, 0), (0, 1), (1, 0), (1, 1)):  # 4 luma blocks
                preds[0] = _encode_block_sequential(
                    bw, zy[my * 2 + by, mx * 2 + bx], preds[0], dc_codes, ac_codes)
            preds[1] = _encode_block_sequential(bw, zcb[my, mx], preds[1], dc_codes, ac_codes)
            preds[2] = _encode_block_sequential(bw, zcr[my, mx], preds[2], dc_codes, ac_codes)
    entropy = bw.flush()

    out = bytearray(b"\xff\xd8")
    out += _JFIF
    out += _dqt_segment(0, QUANT_LUMA)
    out += _dqt_segment(1, QUANT_CHROMA)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes((1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))  # Y 2x2, chroma 1x1
    out += _dht_segments()
    out += b"\xff\xda" + struct.pack(">HB", 12, 3) + bytes((1, 0x00, 2, 0x00, 3, 0x00)) + b"\x00\x3f\x00"
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---- progressive encoder (spec Annex G; scan script: DC first at Al=1,
# AC bands 1-5 / 6-63 first at Al=1, then DC + AC refinement to Al=0) ----

def _emit_eobrun(bw, ac_codes, eobrun: int) -> int:
    if eobrun > 0:
        nbits = eobrun.bit_length() - 1
        code, length = ac_codes[nbits << 4]
        bw.write(code, length)
        if nbits:
            bw.write(eobrun & ((1 << nbits) - 1), nbits)
    return 0


def _encode_scan_dc_first(bw, zzs, dc_codes, al: int, ri: int = 0) -> None:
    pred = 0
    n = 0
    rst = 0
    for by in range(zzs.shape[0]):
        for bx in range(zzs.shape[1]):
            if ri and n and n % ri == 0:
                bw.restart(rst)
                rst = (rst + 1) & 7
                pred = 0
            v = int(zzs[by, bx, 0]) >> al
            diff = v - pred
            pred = v
            size, bits = _magnitude(diff)
            code, length = dc_codes[size]
            bw.write(code, length)
            if size:
                bw.write(bits, size)
            n += 1


def _encode_scan_dc_first_interleaved(bw, zzs_list, dc_codes, al: int) -> None:
    """Interleaved (multi-component) progressive DC first scan: MCU
    order, one block per component per MCU (1x1 sampling), per-component
    DC predictors — the spec's only interleaved progressive scan kind."""
    preds = [0] * len(zzs_list)
    by_n, bx_n = zzs_list[0].shape[0], zzs_list[0].shape[1]
    for by in range(by_n):
        for bx in range(bx_n):
            for ci, zzs in enumerate(zzs_list):
                v = int(zzs[by, bx, 0]) >> al
                diff = v - preds[ci]
                preds[ci] = v
                size, bits = _magnitude(diff)
                code, length = dc_codes[size]
                bw.write(code, length)
                if size:
                    bw.write(bits, size)


def _encode_scan_dc_refine_interleaved(bw, zzs_list, al: int) -> None:
    by_n, bx_n = zzs_list[0].shape[0], zzs_list[0].shape[1]
    for by in range(by_n):
        for bx in range(bx_n):
            for zzs in zzs_list:
                bw.write((int(zzs[by, bx, 0]) >> al) & 1, 1)


def _encode_scan_dc_refine(bw, zzs, al: int, ri: int = 0) -> None:
    n = 0
    rst = 0
    for by in range(zzs.shape[0]):
        for bx in range(zzs.shape[1]):
            if ri and n and n % ri == 0:
                bw.restart(rst)
                rst = (rst + 1) & 7
            bw.write((int(zzs[by, bx, 0]) >> al) & 1, 1)
            n += 1


def _encode_scan_ac_first(bw, zzs, ac_codes, ss: int, se: int, al: int,
                          ri: int = 0) -> None:
    """Spectral-selection first scan with cross-block EOB runs
    (spec G.1.2.2; sign-magnitude point transform). A restart interval
    flushes any pending EOB run before each RSTn (runs cannot span a
    restart, F.2.1.3.1)."""
    eobrun = 0
    n_mcu = 0
    rst = 0
    for by in range(zzs.shape[0]):
        for bx in range(zzs.shape[1]):
            if ri and n_mcu and n_mcu % ri == 0:
                eobrun = _emit_eobrun(bw, ac_codes, eobrun)
                bw.restart(rst)
                rst = (rst + 1) & 7
            n_mcu += 1
            zz = zzs[by, bx]
            run = 0
            for k in range(ss, se + 1):
                t = int(zz[k])
                v = (abs(t) >> al) * (1 if t >= 0 else -1)
                if v == 0:
                    run += 1
                    continue
                eobrun = _emit_eobrun(bw, ac_codes, eobrun)
                while run > 15:
                    code, length = ac_codes[0xF0]
                    bw.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_codes[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if run > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _emit_eobrun(bw, ac_codes, eobrun)
    _emit_eobrun(bw, ac_codes, eobrun)


def _encode_scan_ac_refine(bw, zzs, ac_codes, ss: int, se: int, al: int,
                           ri: int = 0) -> None:
    """Successive-approximation AC refinement (spec G.1.2.3). EOB runs
    are flushed per block so correction bits never buffer across blocks
    (valid, marginally less compressed than libjpeg-style BE buffering);
    that also makes restart insertion a pure marker emission."""
    n_mcu = 0
    rst = 0
    for by in range(zzs.shape[0]):
        for bx in range(zzs.shape[1]):
            if ri and n_mcu and n_mcu % ri == 0:
                bw.restart(rst)
                rst = (rst + 1) & 7
            n_mcu += 1
            zz = zzs[by, bx]
            absv = [abs(int(zz[k])) >> al for k in range(64)]
            eob = 0  # last newly-significant index; 0 = none
            for k in range(ss, se + 1):
                if absv[k] == 1:
                    eob = k
            run = 0
            pending: list[int] = []  # correction bits since the last symbol
            for k in range(ss, se + 1):
                a = absv[k]
                if a == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                    for bit in pending:
                        bw.write(bit, 1)
                    pending = []
                if a > 1:  # history coefficient → one correction bit
                    pending.append((abs(int(zz[k])) >> al) & 1)
                    continue
                # newly significant at this Al
                code, length = ac_codes[(run << 4) | 1]
                bw.write(code, length)
                bw.write(1 if int(zz[k]) > 0 else 0, 1)
                for bit in pending:
                    bw.write(bit, 1)
                pending = []
                run = 0
            if run > 0 or pending:
                code, length = ac_codes[0x00]  # EOB (run of 1)
                bw.write(code, length)
                for bit in pending:
                    bw.write(bit, 1)


def encode_jpeg_gray_progressive(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """8-bit grayscale PROGRESSIVE (SOF2) JPEG: 6-scan script with
    spectral selection and one successive-approximation level
    (DC first Al=1 → AC 1-5 first Al=1 → AC 6-63 first Al=1 →
    DC refine → AC 1-5 refine → AC 6-63 refine). Reconstructs to the
    same pixels as the baseline encoding of the same image (identical
    quantized coefficients). ``restart_interval`` emits DRI + RSTn
    inside every scan (EOB runs flushed before each marker)."""
    h, w = img.shape
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg_gray_progressive needs multiple-of-8 dimensions")
    zzs = _quantize_plane(img, QUANT_LUMA)
    dc_codes = _build_code_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _build_code_table(PROG_AC_BITS, PROG_AC_VALS)
    ri = restart_interval

    out = bytearray(b"\xff\xd8")
    out += _JFIF
    out += _dqt_segment(0, QUANT_LUMA)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    dht = bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    dht = bytes([0x10]) + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if ri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, ri)

    def sos(ss, se, ah, al, body):
        return (b"\xff\xda" + struct.pack(">HB", 8, 1)
                + bytes((1, 0x00, ss, se, (ah << 4) | al)) + body)

    bw = _BitWriter(); _encode_scan_dc_first(bw, zzs, dc_codes, 1, ri)
    out += sos(0, 0, 0, 1, bw.flush())
    bw = _BitWriter(); _encode_scan_ac_first(bw, zzs, ac_codes, 1, 5, 1, ri)
    out += sos(1, 5, 0, 1, bw.flush())
    bw = _BitWriter(); _encode_scan_ac_first(bw, zzs, ac_codes, 6, 63, 1, ri)
    out += sos(6, 63, 0, 1, bw.flush())
    bw = _BitWriter(); _encode_scan_dc_refine(bw, zzs, 0, ri)  # bit Al=0 of DC
    out += sos(0, 0, 1, 0, bw.flush())
    bw = _BitWriter(); _encode_scan_ac_refine(bw, zzs, ac_codes, 1, 5, 0, ri)
    out += sos(1, 5, 1, 0, bw.flush())
    bw = _BitWriter(); _encode_scan_ac_refine(bw, zzs, ac_codes, 6, 63, 0, ri)
    out += sos(6, 63, 1, 0, bw.flush())
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_color_progressive(rgb: np.ndarray) -> bytes:
    """RGB → PROGRESSIVE (SOF2) YCbCr 4:4:4 JPEG: interleaved DC scans
    over all three components (the spec's only interleaved progressive
    form) + per-component AC first/refine scans. Reconstructs to the
    same pixels as encode_jpeg_color of the same image."""
    h, w = rgb.shape[:2]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if (ph, pw) != (h, w):
        rgb = np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]
    qts = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
    zzs = [_quantize_plane(p, qt) for p, qt in zip(planes, qts)]
    dc_codes = _build_code_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _build_code_table(PROG_AC_BITS, PROG_AC_VALS)

    out = bytearray(b"\xff\xd8")
    out += _JFIF
    out += _dqt_segment(0, QUANT_LUMA)
    out += _dqt_segment(1, QUANT_CHROMA)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes((1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    dht = bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    dht = bytes([0x10]) + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht

    def sos_multi(ss, se, ah, al, body):
        return (b"\xff\xda" + struct.pack(">HB", 12, 3)
                + bytes((1, 0x00, 2, 0x00, 3, 0x00, ss, se, (ah << 4) | al)) + body)

    def sos_one(cid, ss, se, ah, al, body):
        return (b"\xff\xda" + struct.pack(">HB", 8, 1)
                + bytes((cid, 0x00, ss, se, (ah << 4) | al)) + body)

    bw = _BitWriter(); _encode_scan_dc_first_interleaved(bw, zzs, dc_codes, 1)
    out += sos_multi(0, 0, 0, 1, bw.flush())
    for ci in range(3):  # AC scans are non-interleaved per spec
        bw = _BitWriter(); _encode_scan_ac_first(bw, zzs[ci], ac_codes, 1, 63, 1)
        out += sos_one(ci + 1, 1, 63, 0, 1, bw.flush())
    bw = _BitWriter(); _encode_scan_dc_refine_interleaved(bw, zzs, 0)  # bit Al=0
    out += sos_multi(0, 0, 1, 0, bw.flush())
    for ci in range(3):
        bw = _BitWriter(); _encode_scan_ac_refine(bw, zzs[ci], ac_codes, 1, 63, 0)
        out += sos_one(ci + 1, 1, 63, 1, 0, bw.flush())
    out += b"\xff\xd9"
    return bytes(out)


# -------------------------------------------------------------- decoder

def _decode_block_sequential(br, zz, dc_tbl, ac_tbl, pred: int) -> int:
    """Baseline entropy decode of one block into zigzag array ``zz``;
    returns the new DC predictor."""
    size = br.read_symbol(dc_tbl)
    diff = _extend(br.read_bits(size), size)
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = br.read_symbol(ac_tbl)
        run, size = rs >> 4, rs & 0xF
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += run
        if k > 63:
            raise ValueError("AC index overflow")
        zz[k] = _extend(br.read_bits(size), size)
        k += 1
    return pred


def _decode_dc_first(br, zz, dc_tbl, pred: int, al: int) -> int:
    size = br.read_symbol(dc_tbl)
    pred += _extend(br.read_bits(size), size)
    zz[0] = pred << al
    return pred


def _decode_dc_refine(br, zz, al: int) -> None:
    if br.read_bit():
        zz[0] |= 1 << al


def _decode_ac_first(br, zz, ac_tbl, ss, se, al, eobrun: int) -> int:
    """Spectral-selection first scan for one block (spec G.2/F.2.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.read_symbol(ac_tbl)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run < 15:  # EOBn
                eobrun = (1 << run) + (br.read_bits(run) if run else 0) - 1
                break
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        zz[k] = _extend(br.read_bits(size), size) << al
        k += 1
    return eobrun


def _refine_nonzero(br, zz, k: int, p1: int) -> None:
    """Append one correction bit to an already-nonzero coefficient
    (spec G.1.2.3: a 1-bit grows the magnitude by 2^Al toward its sign)."""
    if br.read_bit():
        c = int(zz[k])
        if (c & p1) == 0:
            zz[k] = c + (p1 if c >= 0 else -p1)


def _decode_ac_refine(br, zz, ac_tbl, ss, se, al, eobrun: int) -> int:
    """Successive-approximation AC refinement for one block."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.read_symbol(ac_tbl)
            run, size = rs >> 4, rs & 0xF
            if size == 0:
                if run < 15:  # EOBn — correct the rest of the band below
                    eobrun = (1 << run) + (br.read_bits(run) if run else 0)
                    break
                # ZRL: skip 16 zero-history slots — 15 via the walk's
                # countdown plus the final unconditional k += 1 below
                val = 0
            else:
                if size != 1:
                    raise ValueError("invalid refinement symbol")
                val = p1 if br.read_bit() else -p1
            # walk: correct nonzero-history coefs, count down zero-history
            while k <= se:
                if zz[k] != 0:
                    _refine_nonzero(br, zz, k, p1)
                    k += 1
                elif run == 0:
                    break
                else:
                    run -= 1
                    k += 1
            if val != 0 and k <= se:
                zz[k] = val
            k += 1  # consume the placement slot (16th zero for ZRL)
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                _refine_nonzero(br, zz, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _entropy_segment_end(data: bytes, start: int) -> int:
    """End offset of an entropy-coded segment: first FF xx that is not
    a stuffed 00 or an RSTn."""
    p = start
    n = len(data)
    while p < n:
        if data[p] == 0xFF and p + 1 < n:
            nxt = data[p + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return n


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG → (h, w) uint8 gray or (h, w, 3) uint8 RGB. Supports
    baseline/extended-sequential (SOF0/SOF1) and progressive (SOF2)
    frames, 1-component and 3-component YCbCr with 1x1 (4:4:4) or
    2x2-luma (4:2:0) sampling, restart intervals, EOB runs; raises on
    arithmetic coding / hierarchical / 12-bit streams.

    Two stages: every scan entropy-decodes into per-component zigzag
    coefficient arrays; reconstruction then dequantizes and runs one
    vectorized IDCT over all blocks."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    progressive = False
    ri = 0
    coefs: dict[int, np.ndarray] = {}
    preds: dict[int, int] = {}
    mcux = mcuy = hmax = vmax = 0

    def run_scan(scan, ss, se, ah, al, entropy: bytes) -> None:
        br = _BitReader(entropy)
        eobrun = 0
        for cid in preds:
            if any(s["id"] == cid for s in scan):
                preds[cid] = 0
        comps_by_id = {c["id"]: c for c in frame["comps"]}
        interleaved = len(scan) > 1
        if interleaved:
            units = []  # (cid, dc_tbl_id, ac_tbl_id, block_y, block_x) per MCU template
            for s in scan:
                c = comps_by_id[s["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        units.append((s, c, by, bx))
            n_mcu = mcux * mcuy
            for m in range(n_mcu):
                if ri and m and m % ri == 0:
                    br.sync_restart()
                    for s in scan:
                        preds[s["id"]] = 0
                    eobrun = 0
                my, mx = divmod(m, mcux)
                for s, c, by, bx in units:
                    zz = coefs[c["id"]][my * c["v"] + by, mx * c["h"] + bx]
                    if not progressive:
                        preds[c["id"]] = _decode_block_sequential(
                            br, zz, huff_dc[s["dc"]], huff_ac[s["ac"]], preds[c["id"]])
                    elif ss == 0 and ah == 0:
                        preds[c["id"]] = _decode_dc_first(
                            br, zz, huff_dc[s["dc"]], preds[c["id"]], al)
                    elif ss == 0:
                        _decode_dc_refine(br, zz, al)
                    else:
                        raise ValueError("progressive AC scans must be non-interleaved")
        else:
            s = scan[0]
            c = comps_by_id[s["id"]]
            # non-interleaved: the component's own block grid (spec A.2.2)
            cw = -(-(frame["w"] * c["h"]) // hmax)
            ch = -(-(frame["h"] * c["v"]) // vmax)
            bw_ = -(-cw // 8)
            bh_ = -(-ch // 8)
            n = 0
            for by in range(bh_):
                for bx in range(bw_):
                    if ri and n and n % ri == 0:
                        br.sync_restart()
                        preds[c["id"]] = 0
                        eobrun = 0
                    zz = coefs[c["id"]][by, bx]
                    if not progressive:
                        preds[c["id"]] = _decode_block_sequential(
                            br, zz, huff_dc[s["dc"]], huff_ac[s["ac"]], preds[c["id"]])
                    elif ss == 0 and ah == 0:
                        preds[c["id"]] = _decode_dc_first(
                            br, zz, huff_dc[s["dc"]], preds[c["id"]], al)
                    elif ss == 0:
                        _decode_dc_refine(br, zz, al)
                    elif ah == 0:
                        eobrun = _decode_ac_first(
                            br, zz, huff_ac[s["ac"]], ss, se, al, eobrun)
                    else:
                        eobrun = _decode_ac_refine(
                            br, zz, huff_ac[s["ac"]], ss, se, al, eobrun)
                    n += 1

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                quant[tq] = tbl.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            prec, fh, fw, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-fw // (8 * hmax))
            mcuy = -(-fh // (8 * vmax))
            for c in comps:
                coefs[c["id"]] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                preds[c["id"]] = 0
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "lossless / arithmetic / hierarchical JPEG unsupported "
                "(SOF0/SOF1 sequential and SOF2 progressive only)")
        elif marker == 0xDD:  # DRI
            ri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"id": cs, "dc": tables >> 4, "ac": tables & 0xF})
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            entropy_start = pos + seglen
            end = _entropy_segment_end(data, entropy_start)
            run_scan(scan, ss, se, ahal >> 4, ahal & 0xF, data[entropy_start:end])
            pos = end
            continue
        pos += seglen
    if frame is None:
        raise ValueError("missing SOF/SOS")

    # ---- reconstruction: dequantize + one vectorized IDCT per component
    planes = {}
    for c in frame["comps"]:
        zz = coefs[c["id"]].astype(np.float64)
        qt_zz = quant[c["tq"]].reshape(-1)[ZIGZAG].astype(np.float64)
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG] = zz * qt_zz
        by, bx = nat.shape[0], nat.shape[1]
        blocks = np.einsum("ux,ijuv,vy->ijxy", _A, nat.reshape(by, bx, 8, 8), _A)
        # assemble plane from (by, bx, 8, 8)
        planes[c["id"]] = blocks.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0

    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    if len(comps) == 1:
        out = np.clip(np.round(planes[comps[0]["id"]][:h, :w]), 0, 255)
        return out.astype(np.uint8)
    if len(comps) != 3:
        raise NotImplementedError("only 1- or 3-component frames supported")
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
