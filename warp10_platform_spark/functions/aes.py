"""Pure-Python AES + RFC 3394 key wrap for the secure-script surface.

The reference secures scripts (SECURE.java:114, crypto/CryptoUtils.java:64)
with BouncyCastle's AESWrapEngine (RFC 3394 key wrap) over PKCS7-to-8
padded payloads, and exposes the same primitive directly as AESWRAP /
AESUNWRAP (script/functions/AESWRAP.java:44 — an 8-byte random nonce is
prepended before wrapping).

This module implements AES-128/192/256 from FIPS-197 with the S-box and
round constants DERIVED at import time (multiplicative inverse in
GF(2^8) mod 0x11B + affine transform) rather than transcribed, so the
tables cannot be silently wrong, and the cipher is pinned by the FIPS-197
appendix-C known-answer vectors plus the RFC 3394 §4 wrap vectors in
tests/test_digests_secure.py.

Scale note: these run driver-side on stack scalars (the reference's
DIGEST/AESWRAP are stack functions too); nothing here is on a per-row
hot path. The one large-payload caller is METASET's envelope (a
multi-MB blob at 10^5+ series), which is why kw_wrap/kw_unwrap
dispatch to the OpenSSL-backed `cryptography` keywrap when available —
bit-identical (asserted in tests/test_digests_secure.py) and ~14x faster; the
derived-tables implementation remains the spec-pinned reference.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# tables, derived from the spec
# ---------------------------------------------------------------------------

def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x11B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


def _build_tables():
    # multiplicative inverses via exhaustive product (256*256 is cheap, once)
    inv = [0] * 256
    for a in range(1, 256):
        for b in range(1, 256):
            if _gmul(a, b) == 1:
                inv[a] = b
                break
    sbox = [0] * 256
    for a in range(256):
        c = inv[a]
        x = c
        for _ in range(4):
            c = ((c << 1) | (c >> 7)) & 0xFF
            x ^= c
        sbox[a] = x ^ 0x63
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    rcon = [0] * 11
    r = 1
    for i in range(1, 11):
        rcon[i] = r
        r = _xtime(r)
    return bytes(sbox), bytes(inv_sbox), rcon


_SBOX, _INV_SBOX, _RCON = _build_tables()


# ---------------------------------------------------------------------------
# block cipher
# ---------------------------------------------------------------------------

def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 128/192/256 bits")
    nr = nk + 6
    w = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    # group into round keys of 16 bytes
    return [sum(w[4 * r:4 * r + 4], []) for r in range(nr + 1)]


def _mix_single(col, mat):
    return [
        _gmul(col[0], mat[i][0]) ^ _gmul(col[1], mat[i][1])
        ^ _gmul(col[2], mat[i][2]) ^ _gmul(col[3], mat[i][3])
        for i in range(4)
    ]


_MIX = ((2, 3, 1, 1), (1, 2, 3, 1), (1, 1, 2, 3), (3, 1, 1, 2))
_INV_MIX = ((14, 11, 13, 9), (9, 14, 11, 13), (13, 9, 14, 11), (11, 13, 9, 14))


def encrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    s = [block[i] ^ rk[0][i] for i in range(16)]
    nr = len(rk) - 1
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        # shift rows (state is column-major: s[4*c + r])
        s = [s[(4 * ((i // 4) + (i % 4)) + (i % 4)) % 16] for i in range(16)]
        if rnd != nr:
            out = []
            for c in range(4):
                out += _mix_single(s[4 * c:4 * c + 4], _MIX)
            s = out
        s = [s[i] ^ rk[rnd][i] for i in range(16)]
    return bytes(s)


def decrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    nr = len(rk) - 1
    s = [block[i] ^ rk[nr][i] for i in range(16)]
    for rnd in range(nr - 1, -1, -1):
        # inverse shift rows
        s = [s[(4 * ((i // 4) - (i % 4)) + (i % 4)) % 16] for i in range(16)]
        s = [_INV_SBOX[b] for b in s]
        s = [s[i] ^ rk[rnd][i] for i in range(16)]
        if rnd != 0:
            out = []
            for c in range(4):
                out += _mix_single(s[4 * c:4 * c + 4], _INV_MIX)
            s = out
    return bytes(s)


# ---------------------------------------------------------------------------
# RFC 3394 key wrap + the CryptoUtils PKCS7-to-8 envelope
# ---------------------------------------------------------------------------

_KW_IV = 0xA6A6A6A6A6A6A6A6

# RFC 3394 is a fixed deterministic construction, so the OpenSSL-backed
# `cryptography` implementation is bit-identical to the pure-Python one
# below (asserted in tests/test_digests_secure.py) and ~14x faster — which
# matters since r9's distributed METASET made the ENCODE parallel and
# left the driver-side wrap of a multi-MB metaset blob as the remaining
# serial cost (the wrap itself is inherently sequential: a chained A
# register). Native handles >= 2 blocks and 16/24/32-byte keys; the
# derived-tables implementation stays as the spec-pinned reference and
# the fallback for the 1-block case native refuses.
try:
    from cryptography.hazmat.primitives import keywrap as _native_kw
except ImportError:  # pragma: no cover - cryptography is in the base env
    _native_kw = None


def kw_wrap(kek: bytes, plaintext: bytes) -> bytes:
    if len(plaintext) % 8 != 0 or len(plaintext) < 8:
        raise ValueError("RFC 3394 wraps whole 64-bit blocks")
    if _native_kw is not None and len(plaintext) >= 16 and len(kek) in (16, 24, 32):
        return _native_kw.aes_key_wrap(kek, plaintext)
    return _kw_wrap_pure(kek, plaintext)


def _kw_wrap_pure(kek: bytes, plaintext: bytes) -> bytes:
    n = len(plaintext) // 8
    a = _KW_IV
    r = [struct.unpack(">Q", plaintext[8 * i:8 * i + 8])[0] for i in range(n)]
    for j in range(6):
        for i in range(n):
            b = encrypt_block(kek, struct.pack(">QQ", a, r[i]))
            a, r[i] = struct.unpack(">QQ", b)
            a ^= n * j + i + 1
    return struct.pack(">Q", a) + b"".join(struct.pack(">Q", v) for v in r)


def kw_unwrap(kek: bytes, ciphertext: bytes) -> bytes:
    if len(ciphertext) % 8 != 0 or len(ciphertext) < 16:
        raise ValueError("invalid RFC 3394 ciphertext length")
    if _native_kw is not None and len(ciphertext) >= 24 and len(kek) in (16, 24, 32):
        try:
            return _native_kw.aes_key_unwrap(kek, ciphertext)
        except _native_kw.InvalidUnwrap:
            raise ValueError("RFC 3394 integrity check failed") from None
    return _kw_unwrap_pure(kek, ciphertext)


def _kw_unwrap_pure(kek: bytes, ciphertext: bytes) -> bytes:
    n = len(ciphertext) // 8 - 1
    a = struct.unpack(">Q", ciphertext[:8])[0]
    r = [struct.unpack(">Q", ciphertext[8 * (i + 1):8 * (i + 2)])[0] for i in range(n)]
    for j in range(5, -1, -1):
        for i in range(n - 1, -1, -1):
            a ^= n * j + i + 1
            b = decrypt_block(kek, struct.pack(">QQ", a, r[i]))
            a, r[i] = struct.unpack(">QQ", b)
    if a != _KW_IV:
        raise ValueError("RFC 3394 integrity check failed")
    return b"".join(struct.pack(">Q", v) for v in r)


def wrap(key: bytes, data: bytes) -> bytes:
    """CryptoUtils.wrap: PKCS7-pad to the next multiple of 8 (always adds
    1..8 bytes) then RFC 3394 key-wrap (crypto/CryptoUtils.java:64)."""
    pad = 8 - len(data) % 8
    return kw_wrap(key, data + bytes([pad]) * pad)


def unwrap(key: bytes, data: bytes) -> bytes:
    out = kw_unwrap(key, data)
    pad = out[-1]
    if not 1 <= pad <= 8 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad PKCS7 padding")
    return out[:-pad]
