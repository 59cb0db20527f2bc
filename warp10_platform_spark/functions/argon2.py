"""Argon2 (RFC 9106) — pure-Python, hashlib.blake2b-based.

Implements Argon2d / Argon2i / Argon2id, version 0x13, single-threaded
(the reference's ARGON2.java builds BouncyCastle Argon2Parameters with
the same surface: type/iterations/memory/parallelism/salt/secret/
additional/size/password, WarpScriptLib.java:2279). Parallel lanes are
computed sequentially — identical output to a threaded implementation by
construction, and the stack function caps lanes at 1 without capability
anyway.

Correctness is cross-validated in tests/test_argon2.py against OpenSSL's
ARGON2D/ARGON2I/ARGON2ID KDFs (`openssl kdf`) across parameter combos —
the same external-validation bar the WHIRLPOOL digest met.
"""

from __future__ import annotations

import hashlib
import struct

_M64 = (1 << 64) - 1
_TYPE = {"d": 0, "i": 1, "id": 2}
_VERSION = 0x13


def _h(data: bytes, outlen: int = 64) -> bytes:
    return hashlib.blake2b(data, digest_size=outlen).digest()


def _h_prime(x: bytes, t: int) -> bytes:
    """Variable-length hash H' (RFC 9106 §3.3)."""
    if t <= 64:
        return _h(struct.pack("<I", t) + x, t)
    r = (t + 31) // 32 - 2
    v = _h(struct.pack("<I", t) + x, 64)
    out = [v[:32]]
    for _ in range(r - 1):
        v = _h(v, 64)
        out.append(v[:32])
    out.append(_h(v, t - 32 * r))
    return b"".join(out)


def _gb(v, a, b, c, d):
    """BLAKE2b mixing with Argon2's 32-bit-multiply addition (§3.5)."""
    v[a] = (v[a] + v[b] + 2 * ((v[a] & 0xFFFFFFFF) * (v[b] & 0xFFFFFFFF))) & _M64
    x = v[d] ^ v[a]
    v[d] = ((x >> 32) | (x << 32)) & _M64
    v[c] = (v[c] + v[d] + 2 * ((v[c] & 0xFFFFFFFF) * (v[d] & 0xFFFFFFFF))) & _M64
    x = v[b] ^ v[c]
    v[b] = ((x >> 24) | (x << 40)) & _M64
    v[a] = (v[a] + v[b] + 2 * ((v[a] & 0xFFFFFFFF) * (v[b] & 0xFFFFFFFF))) & _M64
    x = v[d] ^ v[a]
    v[d] = ((x >> 16) | (x << 48)) & _M64
    v[c] = (v[c] + v[d] + 2 * ((v[c] & 0xFFFFFFFF) * (v[d] & 0xFFFFFFFF))) & _M64
    x = v[b] ^ v[c]
    v[b] = ((x >> 63) | (x << 1)) & _M64


def _p(v, idx):
    """Permutation P over 16 u64 words selected by idx (§3.6)."""
    w = [v[i] for i in idx]
    _gb(w, 0, 4, 8, 12)
    _gb(w, 1, 5, 9, 13)
    _gb(w, 2, 6, 10, 14)
    _gb(w, 3, 7, 11, 15)
    _gb(w, 0, 5, 10, 15)
    _gb(w, 1, 6, 11, 12)
    _gb(w, 2, 7, 8, 13)
    _gb(w, 3, 4, 9, 14)
    for i, j in enumerate(idx):
        v[j] = w[i]


_ROWS = [list(range(16 * i, 16 * i + 16)) for i in range(8)]
_COLS = [
    [2 * j + 16 * k + o for k in range(8) for o in (0, 1)]
    for j in range(8)
]


def _g(x, y):
    """Compression function G over 1024-byte blocks as 128 u64 (§3.5)."""
    r = [a ^ b for a, b in zip(x, y)]
    q = list(r)
    for row in _ROWS:
        _p(q, row)
    for col in _COLS:
        _p(q, col)
    return [a ^ b for a, b in zip(q, r)]


def _block_from_bytes(b: bytes):
    return list(struct.unpack("<128Q", b))


def _block_to_bytes(blk) -> bytes:
    return struct.pack("<128Q", *blk)


_ZERO = [0] * 128


def argon2(
    password: bytes,
    salt: bytes,
    *,
    time_cost: int = 3,
    memory_kib: int = 32,
    lanes: int = 1,
    tag_len: int = 32,
    variant: str = "id",
    secret: bytes = b"",
    ad: bytes = b"",
) -> bytes:
    if variant not in _TYPE:
        raise ValueError("variant must be 'd', 'i' or 'id'")
    if memory_kib < 8 * lanes:
        raise ValueError("memory must be >= 8*lanes KiB")
    y = _TYPE[variant]
    p = lanes
    h0 = _h(
        struct.pack("<IIIIII", p, tag_len, memory_kib, time_cost, _VERSION, y)
        + struct.pack("<I", len(password)) + password
        + struct.pack("<I", len(salt)) + salt
        + struct.pack("<I", len(secret)) + secret
        + struct.pack("<I", len(ad)) + ad,
        64,
    )
    m_prime = 4 * p * (memory_kib // (4 * p))
    q = m_prime // p
    seg = q // 4
    lanes_b = [[None] * q for _ in range(p)]
    for i in range(p):
        lanes_b[i][0] = _block_from_bytes(_h_prime(h0 + struct.pack("<II", 0, i), 1024))
        lanes_b[i][1] = _block_from_bytes(_h_prime(h0 + struct.pack("<II", 1, i), 1024))

    for r in range(time_cost):
        for sl in range(4):
            for lane in range(p):
                addr = None
                n_addr = 0
                first = 2 if (r == 0 and sl == 0) else 0
                for idx in range(first, seg):
                    j = sl * seg + idx
                    prev = lanes_b[lane][(j - 1) % q]
                    di = y == 1 or (y == 2 and r == 0 and sl < 2)
                    if di:
                        if idx // 128 + 1 > n_addr:
                            n_addr = idx // 128 + 1
                            ctr = [0] * 128
                            ctr[0], ctr[1], ctr[2] = r, lane, sl
                            ctr[3], ctr[4], ctr[5] = m_prime, time_cost, y
                            ctr[6] = n_addr
                            addr = _g(_ZERO, _g(_ZERO, ctr))
                        jv = addr[idx % 128]
                    else:
                        jv = prev[0]
                    j1 = jv & 0xFFFFFFFF
                    j2 = (jv >> 32) & 0xFFFFFFFF
                    ref_lane = lane if (r == 0 and sl == 0) else j2 % p
                    if r == 0:
                        if ref_lane == lane:
                            w = sl * seg + idx - 1
                        else:
                            w = sl * seg - (1 if idx == 0 else 0)
                    else:
                        if ref_lane == lane:
                            w = 3 * seg + idx - 1
                        else:
                            w = 3 * seg - (1 if idx == 0 else 0)
                    x = (j1 * j1) >> 32
                    yy = (w * x) >> 32
                    zz = w - 1 - yy
                    start = 0 if r == 0 else ((sl + 1) % 4) * seg
                    ref = lanes_b[ref_lane][(start + zz) % q]
                    new = _g(prev, ref)
                    if r > 0:
                        old = lanes_b[lane][j]
                        new = [a ^ b for a, b in zip(new, old)]
                    lanes_b[lane][j] = new

    c = lanes_b[0][q - 1]
    for i in range(1, p):
        c = [a ^ b for a, b in zip(c, lanes_b[i][q - 1])]
    return _h_prime(_block_to_bytes(c), tag_len)
