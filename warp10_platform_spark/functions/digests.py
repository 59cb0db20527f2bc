"""Pure-Python message digests for the WarpScript DIGEST surface.

The reference registers one DIGEST stack function per BouncyCastle digest
(script/WarpScriptLib.java:2283-2305, script/functions/DIGEST.java:46 —
pop byte[], push raw digest byte[]).  hashlib covers MD5/SHA1/SHA2 (bound
in warpscript/functions.py); this module supplies the remaining families
the reference exposes that hashlib lacks:

- MD2 (RFC 1319) and MD4 (RFC 1320)
- RIPEMD-128/160/256/320 (one parameterized core; the 160 variant is
  cross-validated against OpenSSL's implementation via hashlib in tests,
  which transitively validates the shared message-order/rotation tables
  used by all four variants)
- KECCAK.128/224/256/288/384/512 (original Keccak pad 0x01, rate
  1600-2n like BouncyCastle's KeccakDigest(n)).  The keccak-f[1600]
  permutation is shared with SHA-3; tests validate it bit-for-bit against
  hashlib.sha3_* by running this sponge with the SHA-3 pad byte 0x06.

Round constants and rotation offsets for keccak are derived from the
Keccak reference specification's LFSR / (x,y)->(y,2x+3y) walk at import
time rather than being transcribed, so a typo cannot silently corrupt
them.

WHIRLPOOL is implemented with its S-box derived from the spec's
E/E^-1/R mini-boxes and cross-validated bit-exact against OpenSSL's
legacy provider.  TIGER / GOST3411 are NOT implemented: no independent
implementation is available in this environment to validate their
S-boxes, and an unverifiable hash is worse than an absent one — they
are documented gaps in COVERAGE.md.
"""

from __future__ import annotations

import hashlib
import struct

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF


def _rol32(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & MASK32


# ---------------------------------------------------------------------------
# MD2 (RFC 1319).  The 256-byte substitution table is the RFC's PI-digit
# permutation; correctness is pinned by the RFC's own test vectors in
# tests/test_digests.py (a wrong entry breaks every vector).
# ---------------------------------------------------------------------------

_MD2_S = bytes([
    41, 46, 67, 201, 162, 216, 124, 1, 61, 54, 84, 161, 236, 240, 6, 19,
    98, 167, 5, 243, 192, 199, 115, 140, 152, 147, 43, 217, 188, 76, 130, 202,
    30, 155, 87, 60, 253, 212, 224, 22, 103, 66, 111, 24, 138, 23, 229, 18,
    190, 78, 196, 214, 218, 158, 222, 73, 160, 251, 245, 142, 187, 47, 238, 122,
    169, 104, 121, 145, 21, 178, 7, 63, 148, 194, 16, 137, 11, 34, 95, 33,
    128, 127, 93, 154, 90, 144, 50, 39, 53, 62, 204, 231, 191, 247, 151, 3,
    255, 25, 48, 179, 72, 165, 181, 209, 215, 94, 146, 42, 172, 86, 170, 198,
    79, 184, 56, 210, 150, 164, 125, 182, 118, 252, 107, 226, 156, 116, 4, 241,
    69, 157, 112, 89, 100, 113, 135, 32, 134, 91, 207, 101, 230, 45, 168, 2,
    27, 96, 37, 173, 174, 176, 185, 246, 28, 70, 97, 105, 52, 64, 126, 15,
    85, 71, 163, 35, 221, 81, 175, 58, 195, 92, 249, 206, 186, 197, 234, 38,
    44, 83, 13, 110, 133, 40, 132, 9, 211, 223, 205, 244, 65, 129, 77, 82,
    106, 220, 55, 200, 108, 193, 171, 250, 36, 225, 123, 8, 12, 189, 177, 74,
    120, 136, 149, 139, 227, 99, 232, 109, 233, 203, 213, 254, 59, 0, 29, 57,
    242, 239, 183, 14, 102, 88, 208, 228, 166, 119, 114, 248, 235, 117, 75, 10,
    49, 68, 80, 180, 143, 237, 31, 26, 219, 153, 141, 51, 159, 17, 131, 20,
])


def md2(data: bytes) -> bytes:
    pad = 16 - (len(data) % 16)
    msg = data + bytes([pad]) * pad
    # checksum block
    c = bytearray(16)
    l = 0
    for i in range(0, len(msg), 16):
        for j in range(16):
            b = msg[i + j]
            c[j] ^= _MD2_S[b ^ l]
            l = c[j]
    msg += bytes(c)
    x = bytearray(48)
    for i in range(0, len(msg), 16):
        for j in range(16):
            x[16 + j] = msg[i + j]
            x[32 + j] = x[16 + j] ^ x[j]
        t = 0
        for rnd in range(18):
            for k in range(48):
                t = x[k] = x[k] ^ _MD2_S[t]
            t = (t + rnd) & 0xFF
    return bytes(x[:16])


# ---------------------------------------------------------------------------
# MD4 (RFC 1320)
# ---------------------------------------------------------------------------

def md4(data: bytes) -> bytes:
    msg = bytearray(data)
    bitlen = (len(data) * 8) & MASK64
    msg.append(0x80)
    while len(msg) % 64 != 56:
        msg.append(0)
    msg += struct.pack("<Q", bitlen)

    a0, b0, c0, d0 = 0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476
    for off in range(0, len(msg), 64):
        x = struct.unpack("<16I", msg[off:off + 64])
        a, b, c, d = a0, b0, c0, d0
        # round 1: F = (b & c) | (~b & d)
        for i, s in zip(range(16), (3, 7, 11, 19) * 4):
            a = _rol32((a + ((b & c) | (~b & d)) + x[i]) & MASK32, s)
            a, b, c, d = d, a, b, c
        # round 2: G = (b & c) | (b & d) | (c & d), order 0,4,8,12,1,5,...
        for i, s in zip(
            (0, 4, 8, 12, 1, 5, 9, 13, 2, 6, 10, 14, 3, 7, 11, 15),
            (3, 5, 9, 13) * 4,
        ):
            a = _rol32(
                (a + ((b & c) | (b & d) | (c & d)) + x[i] + 0x5A827999) & MASK32, s
            )
            a, b, c, d = d, a, b, c
        # round 3: H = b ^ c ^ d, order 0,8,4,12,2,10,6,14,1,9,5,13,3,11,7,15
        for i, s in zip(
            (0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15),
            (3, 9, 11, 15) * 4,
        ):
            a = _rol32((a + (b ^ c ^ d) + x[i] + 0x6ED9EBA1) & MASK32, s)
            a, b, c, d = d, a, b, c
        a0 = (a0 + a) & MASK32
        b0 = (b0 + b) & MASK32
        c0 = (c0 + c) & MASK32
        d0 = (d0 + d) & MASK32
    return struct.pack("<4I", a0, b0, c0, d0)


# ---------------------------------------------------------------------------
# RIPEMD family.  One pair of message-order / shift tables drives all four
# variants; tests validate ripemd160 against hashlib('ripemd160') on random
# inputs, which exercises every entry of all four 80-long tables.
# ---------------------------------------------------------------------------

_RL = (
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
    3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
    1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
    4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13,
)
_RR = (
    5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
    6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
    15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
    8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
    12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11,
)
_SL = (
    11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
    7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
    11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
    11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
    9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6,
)
_SR = (
    8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
    9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
    9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
    15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
    8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11,
)

_KL160 = (0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xA953FD4E)
_KR160 = (0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0x00000000)
_KL128 = (0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC)
_KR128 = (0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x00000000)


def _f(j: int, x: int, y: int, z: int) -> int:
    if j < 16:
        return x ^ y ^ z
    if j < 32:
        return (x & y) | (~x & z)
    if j < 48:
        return (x | (~y & MASK32)) ^ z
    if j < 64:
        return (x & z) | (y & (~z & MASK32))
    return x ^ (y | (~z & MASK32))


def _ripemd_pad(data: bytes) -> bytes:
    msg = bytearray(data)
    bitlen = (len(data) * 8) & MASK64
    msg.append(0x80)
    while len(msg) % 64 != 56:
        msg.append(0)
    msg += struct.pack("<Q", bitlen)
    return bytes(msg)


def _ripemd_160_320(data: bytes, double: bool) -> bytes:
    """RIPEMD-160 (double=False) / RIPEMD-320 (double=True), 80 steps."""
    h = [0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0]
    if double:
        h += [0x76543210, 0xFEDCBA98, 0x89ABCDEF, 0x01234567, 0x3C2D1E0F]
    msg = _ripemd_pad(data)
    for off in range(0, len(msg), 64):
        x = struct.unpack("<16I", msg[off:off + 64])
        if double:
            al, bl, cl, dl, el = h[0:5]
            ar, br, cr, dr, er = h[5:10]
        else:
            al, bl, cl, dl, el = h
            ar, br, cr, dr, er = h
        for j in range(80):
            rnd = j // 16
            t = (al + _f(j, bl, cl, dl) + x[_RL[j]] + _KL160[rnd]) & MASK32
            t = (_rol32(t, _SL[j]) + el) & MASK32
            al, el, dl, cl, bl = el, dl, _rol32(cl, 10), bl, t
            t = (ar + _f(79 - j, br, cr, dr) + x[_RR[j]] + _KR160[rnd]) & MASK32
            t = (_rol32(t, _SR[j]) + er) & MASK32
            ar, er, dr, cr, br = er, dr, _rol32(cr, 10), br, t
            if double and j % 16 == 15:
                # RIPEMD-320 exchanges one register pair per round:
                # B, D, A, C, E after rounds 1..5 respectively
                if rnd == 0:
                    bl, br = br, bl
                elif rnd == 1:
                    dl, dr = dr, dl
                elif rnd == 2:
                    al, ar = ar, al
                elif rnd == 3:
                    cl, cr = cr, cl
                else:
                    el, er = er, el
        if double:
            h[0] = (h[0] + al) & MASK32
            h[1] = (h[1] + bl) & MASK32
            h[2] = (h[2] + cl) & MASK32
            h[3] = (h[3] + dl) & MASK32
            h[4] = (h[4] + el) & MASK32
            h[5] = (h[5] + ar) & MASK32
            h[6] = (h[6] + br) & MASK32
            h[7] = (h[7] + cr) & MASK32
            h[8] = (h[8] + dr) & MASK32
            h[9] = (h[9] + er) & MASK32
        else:
            t = (h[1] + cl + dr) & MASK32
            h[1] = (h[2] + dl + er) & MASK32
            h[2] = (h[3] + el + ar) & MASK32
            h[3] = (h[4] + al + br) & MASK32
            h[4] = (h[0] + bl + cr) & MASK32
            h[0] = t
    return struct.pack("<%dI" % len(h), *h)


def _ripemd_128_256(data: bytes, double: bool) -> bytes:
    """RIPEMD-128 (double=False) / RIPEMD-256 (double=True), 64 steps."""
    h = [0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476]
    if double:
        h += [0x76543210, 0xFEDCBA98, 0x89ABCDEF, 0x01234567]
    msg = _ripemd_pad(data)
    for off in range(0, len(msg), 64):
        x = struct.unpack("<16I", msg[off:off + 64])
        if double:
            al, bl, cl, dl = h[0:4]
            ar, br, cr, dr = h[4:8]
        else:
            al, bl, cl, dl = h
            ar, br, cr, dr = h
        for j in range(64):
            rnd = j // 16
            t = (al + _f(j, bl, cl, dl) + x[_RL[j]] + _KL128[rnd]) & MASK32
            t = _rol32(t, _SL[j])
            al, dl, cl, bl = dl, cl, bl, t
            t = (ar + _f(63 - j, br, cr, dr) + x[_RR[j]] + _KR128[rnd]) & MASK32
            t = _rol32(t, _SR[j])
            ar, dr, cr, br = dr, cr, br, t
            if double and j % 16 == 15:
                # RIPEMD-256 exchanges A, B, C, D after rounds 1..4
                if rnd == 0:
                    al, ar = ar, al
                elif rnd == 1:
                    bl, br = br, bl
                elif rnd == 2:
                    cl, cr = cr, cl
                else:
                    dl, dr = dr, dl
        if double:
            for i, v in enumerate((al, bl, cl, dl, ar, br, cr, dr)):
                h[i] = (h[i] + v) & MASK32
        else:
            t = (h[1] + cl + dr) & MASK32
            h[1] = (h[2] + dl + ar) & MASK32
            h[2] = (h[3] + al + br) & MASK32
            h[3] = (h[0] + bl + cr) & MASK32
            h[0] = t
    return struct.pack("<%dI" % len(h), *h)


def ripemd128(data: bytes) -> bytes:
    return _ripemd_128_256(data, False)


def ripemd160(data: bytes) -> bytes:
    try:  # OpenSSL fast path when the provider ships it
        return hashlib.new("ripemd160", data).digest()
    except ValueError:
        return _ripemd_160_320(data, False)


def ripemd160_pure(data: bytes) -> bytes:
    """Pure-Python path, exposed for the hashlib cross-validation test."""
    return _ripemd_160_320(data, False)


def ripemd256(data: bytes) -> bytes:
    return _ripemd_128_256(data, True)


def ripemd320(data: bytes) -> bytes:
    return _ripemd_160_320(data, True)


# ---------------------------------------------------------------------------
# Keccak.  Tables generated from the spec at import; see module docstring.
# ---------------------------------------------------------------------------

def _keccak_tables():
    # round constants via the spec's LFSR over x^8 + x^6 + x^5 + x^4 + 1
    rc = []
    r = 1
    for _ in range(24):
        c = 0
        for j in range(7):
            if r & 1:
                c ^= 1 << ((1 << j) - 1)
            r = ((r << 1) ^ (0x71 if r & 0x80 else 0)) & 0xFF
        rc.append(c)
    # rotation offsets via the (x,y) -> (y, 2x+3y) walk from (1,0)
    rot = [[0] * 5 for _ in range(5)]
    x, y = 1, 0
    for t in range(24):
        rot[x][y] = ((t + 1) * (t + 2) // 2) % 64
        x, y = y, (2 * x + 3 * y) % 5
    return rc, rot


_KECCAK_RC, _KECCAK_ROT = _keccak_tables()


def _rol64(v: int, n: int) -> int:
    n %= 64
    return ((v << n) | (v >> (64 - n))) & MASK64 if n else v


def _keccak_f(a):
    for rc in _KECCAK_RC:
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol64(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol64(a[x][y], _KECCAK_ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y] & MASK64) & b[(x + 2) % 5][y])
        # iota
        a[0][0] ^= rc
    return a


def keccak_sponge(data: bytes, rate_bytes: int, out_bytes: int, pad_byte: int) -> bytes:
    a = [[0] * 5 for _ in range(5)]
    msg = bytearray(data)
    msg.append(pad_byte)
    while len(msg) % rate_bytes != 0:
        msg.append(0)
    msg[-1] |= 0x80
    for off in range(0, len(msg), rate_bytes):
        block = msg[off:off + rate_bytes]
        for i in range(rate_bytes // 8):
            lane = struct.unpack_from("<Q", block, i * 8)[0]
            a[i % 5][i // 5] ^= lane
        _keccak_f(a)
    out = bytearray()
    while len(out) < out_bytes:
        for i in range(rate_bytes // 8):
            out += struct.pack("<Q", a[i % 5][i // 5])
            if len(out) >= out_bytes:
                break
        if len(out) < out_bytes:
            _keccak_f(a)
    return bytes(out[:out_bytes])


def keccak(data: bytes, bits: int) -> bytes:
    """Original Keccak (pad 0x01) at BouncyCastle's KeccakDigest(bits)
    parameters: capacity 2*bits, rate 1600-2*bits, output = bits."""
    if bits not in (128, 224, 256, 288, 384, 512):
        raise ValueError("unsupported keccak size: %d" % bits)
    rate = (1600 - 2 * bits) // 8
    return keccak_sponge(data, rate, bits // 8, 0x01)


def sha3(data: bytes, bits: int) -> bytes:
    """NIST SHA-3 (pad 0x06) — used by tests to validate the sponge
    against hashlib.sha3_*; not part of the reference surface."""
    rate = (1600 - 2 * bits) // 8
    return keccak_sponge(data, rate, bits // 8, 0x06)


# ---------------------------------------------------------------------------
# WHIRLPOOL (ISO/IEC 10118-3).  The S-box is DERIVED from the spec's
# E / E^-1 / R mini-boxes at import (not transcribed), and the whole
# implementation is cross-validated bit-exact against OpenSSL's legacy
# provider in tests — the same strategy as RIPEMD-160.
# ---------------------------------------------------------------------------

def _whirlpool_tables():
    E = [0x1, 0xB, 0x9, 0xC, 0xD, 0x6, 0xF, 0x3, 0xE, 0x8, 0x7, 0x4, 0xA, 0x2, 0x5, 0x0]
    R = [0x7, 0xC, 0xB, 0xD, 0xE, 0x4, 0x9, 0xF, 0x6, 0x3, 0x8, 0xA, 0x2, 0x5, 0x1, 0x0]
    Einv = [0] * 16
    for i, v in enumerate(E):
        Einv[v] = i
    sbox = [0] * 256
    for x in range(256):
        u, l = x >> 4, x & 15
        y1, y2 = E[u], Einv[l]
        r = R[y1 ^ y2]
        sbox[x] = (E[y1 ^ r] << 4) | Einv[y2 ^ r]

    def gmul(a, b):  # GF(2^8) mod x^8+x^4+x^3+x^2+1 (0x11D)
        p = 0
        while b:
            if b & 1:
                p ^= a
            a <<= 1
            if a & 0x100:
                a ^= 0x11D
            b >>= 1
        return p

    C = (1, 1, 4, 1, 8, 5, 2, 9)  # circulant MDS row
    mul = {c: [gmul(b, c) for b in range(256)] for c in set(C)}
    return sbox, C, mul


_WP_SBOX, _WP_C, _WP_MUL = _whirlpool_tables()


def _wp_round(state, key_mat):
    # gamma (S-box), pi (cyclic column shift), theta (MDS), sigma (xor key)
    g = [[_WP_SBOX[b] for b in row] for row in state]
    p = [[g[(i - j) % 8][j] for j in range(8)] for i in range(8)]
    out = []
    for i in range(8):
        row = []
        for j in range(8):
            v = 0
            for k in range(8):
                v ^= _WP_MUL[_WP_C[(j - k) % 8]][p[i][k]]
            row.append(v)
        out.append([a ^ b for a, b in zip(row, key_mat[i])])
    return out


def whirlpool(data: bytes) -> bytes:
    bitlen = len(data) * 8
    msg = bytearray(data)
    msg.append(0x80)
    while len(msg) % 64 != 32:
        msg.append(0)
    msg += bitlen.to_bytes(32, "big")
    H = bytes(64)
    for off in range(0, len(msg), 64):
        blk = bytes(msg[off : off + 64])
        K = [list(H[8 * i : 8 * i + 8]) for i in range(8)]
        S = [
            [a ^ b for a, b in zip(blk[8 * i : 8 * i + 8], K[i])] for i in range(8)
        ]
        for r in range(10):
            rc = [[_WP_SBOX[8 * r + j] if i == 0 else 0 for j in range(8)] for i in range(8)]
            K = _wp_round(K, rc)
            S = _wp_round(S, K)
        Hn = bytes(b for row in S for b in row)
        H = bytes(a ^ b ^ c for a, b, c in zip(Hn, H, blk))
    return H
