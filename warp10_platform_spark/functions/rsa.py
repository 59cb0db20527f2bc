"""Pure-Python RSA for the RSA* WarpScript surface.

Reference semantics (script/functions/RSAGEN.java, RSAPUBLIC.java,
RSAPRIVATE.java, RSASIGN.java, RSAVERIFY.java, RSAENCRYPT.java,
RSADECRYPT.java):

- `exponent strength RSAGEN` → private param map {modulus, algorithm:
  'RSA', exponent=d} then public map {modulus, 'RSA', exponent=e}, all
  decimal strings.
- RSAPUBLIC / RSAPRIVATE turn those maps into key objects.
- `data alg key RSASIGN` → signature bytes where alg is the Java
  Signature name ("SHA256withRSA", …) — i.e. RSASSA-PKCS1-v1_5
  (RFC 8017 §8.2) over the named digest.  The DigestInfo prefixes are
  DER-encoded from the digest OIDs at import time, not transcribed.
- RSAENCRYPT prepends an 8-byte random nonce then encrypts; RSADECRYPT
  strips it.  The reference delegates the block cipher to the external
  com.geoxp.oss CryptoHelper whose source is not available here, so the
  block format below is standard RSAES-PKCS1-v1_5 (RFC 8017 §7.2),
  chunked — self-consistent encrypt/decrypt, but wire parity with that
  specific helper is NOT claimed (documented gap, unlike the
  signature path which follows the RFC exactly).

Keygen uses Miller-Rabin with 64 rounds (matching the reference's
certainty parameter, RSAGEN.java:71).
"""

from __future__ import annotations

import hashlib
import secrets

KEY_MODULUS = "modulus"
KEY_ALGORITHM = "algorithm"
KEY_EXPONENT = "exponent"

_DIGESTS = {
    "MD5WITHRSA": ("md5", (1, 2, 840, 113549, 2, 5)),
    "SHA1WITHRSA": ("sha1", (1, 3, 14, 3, 2, 26)),
    "SHA256WITHRSA": ("sha256", (2, 16, 840, 1, 101, 3, 4, 2, 1)),
    "SHA384WITHRSA": ("sha384", (2, 16, 840, 1, 101, 3, 4, 2, 2)),
    "SHA512WITHRSA": ("sha512", (2, 16, 840, 1, 101, 3, 4, 2, 3)),
}


class RSAPublicKey:
    __slots__ = ("n", "e")

    def __init__(self, n: int, e: int):
        self.n, self.e = n, e

    def __repr__(self):
        return f"RSAPublicKey({self.n.bit_length()} bits)"


class RSAPrivateKey:
    __slots__ = ("n", "d")

    def __init__(self, n: int, d: int):
        self.n, self.d = n, d

    def __repr__(self):
        return f"RSAPrivateKey({self.n.bit_length()} bits)"


# ---------------------------------------------------------------------------
# DER helpers — DigestInfo built from the OID, so a typo cannot survive
# ---------------------------------------------------------------------------

def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def _der_oid(arcs: tuple) -> bytes:
    body = bytearray([40 * arcs[0] + arcs[1]])
    for a in arcs[2:]:
        enc = bytearray()
        enc.append(a & 0x7F)
        a >>= 7
        while a:
            enc.append(0x80 | (a & 0x7F))
            a >>= 7
        body += bytes(reversed(enc))
    return bytes([0x06]) + _der_len(len(body)) + bytes(body)


def _digest_info(alg: str, data: bytes) -> bytes:
    hname, oid = _DIGESTS[alg]
    digest = hashlib.new(hname, data).digest()
    alg_id = _der_oid(oid) + b"\x05\x00"  # AlgorithmIdentifier(oid, NULL)
    alg_seq = bytes([0x30]) + _der_len(len(alg_id)) + alg_id
    octets = bytes([0x04]) + _der_len(len(digest)) + digest
    inner = alg_seq + octets
    return bytes([0x30]) + _der_len(len(inner)) + inner


# ---------------------------------------------------------------------------
# keygen (Miller-Rabin, 64 rounds like the reference's certainty)
# ---------------------------------------------------------------------------

_SMALL_PRIMES = [3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67]


def _is_prime(n: int, rounds: int = 64) -> bool:
    if n < 2:
        return False
    for p in _SMALL_PRIMES:
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(rounds):
        a = secrets.randbelow(n - 3) + 2
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = (x * x) % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_prime(bits: int) -> int:
    while True:
        p = secrets.randbits(bits) | (1 << (bits - 1)) | 1
        if _is_prime(p):
            return p


def generate(bits: int, e: int = 65537) -> tuple[RSAPrivateKey, RSAPublicKey]:
    while True:
        p = _gen_prime(bits // 2)
        q = _gen_prime(bits - bits // 2)
        if p == q:
            continue
        n = p * q
        phi = (p - 1) * (q - 1)
        try:
            d = pow(e, -1, phi)
        except ValueError:  # e not invertible mod phi
            continue
        if n.bit_length() >= bits:
            return RSAPrivateKey(n, d), RSAPublicKey(n, e)


# ---------------------------------------------------------------------------
# RSASSA-PKCS1-v1_5 sign/verify (RFC 8017 §8.2)
# ---------------------------------------------------------------------------

def _emsa(alg: str, data: bytes, em_len: int) -> bytes:
    t = _digest_info(alg, data)
    if em_len < len(t) + 11:
        raise ValueError("RSA modulus too small for this digest")
    return b"\x00\x01" + b"\xff" * (em_len - len(t) - 3) + b"\x00" + t


def sign(alg: str, key: RSAPrivateKey, data: bytes) -> bytes:
    alg = alg.upper()
    if alg not in _DIGESTS:
        raise ValueError(f"invalid algorithm {alg!r}")
    k = (key.n.bit_length() + 7) // 8
    em = int.from_bytes(_emsa(alg, data, k), "big")
    return pow(em, key.d, key.n).to_bytes(k, "big")


def verify(alg: str, key: RSAPublicKey, data: bytes, signature: bytes) -> bool:
    alg = alg.upper()
    if alg not in _DIGESTS:
        raise ValueError(f"invalid algorithm {alg!r}")
    k = (key.n.bit_length() + 7) // 8
    if len(signature) != k:
        return False
    em = pow(int.from_bytes(signature, "big"), key.e, key.n).to_bytes(k, "big")
    try:
        return em == _emsa(alg, data, k)
    except ValueError:
        return False


# ---------------------------------------------------------------------------
# RSAES-PKCS1-v1_5 encrypt/decrypt (RFC 8017 §7.2), chunked
# ---------------------------------------------------------------------------

def _enc_block(key, block: bytes, k: int) -> bytes:
    ps_len = k - 3 - len(block)
    ps = bytes(b or secrets.randbelow(255) + 1 for b in secrets.token_bytes(ps_len))
    em = b"\x00\x02" + ps + b"\x00" + block
    exp, mod = (key.e, key.n) if isinstance(key, RSAPublicKey) else (key.d, key.n)
    return pow(int.from_bytes(em, "big"), exp, mod).to_bytes(k, "big")


def _dec_block(key, block: bytes, k: int) -> bytes:
    exp, mod = (key.d, key.n) if isinstance(key, RSAPrivateKey) else (key.e, key.n)
    em = pow(int.from_bytes(block, "big"), exp, mod).to_bytes(k, "big")
    if em[0] != 0 or em[1] != 2:
        raise ValueError("RSA decryption failed (bad padding)")
    sep = em.index(0, 2)
    return em[sep + 1:]


def encrypt(key, data: bytes) -> bytes:
    k = (key.n.bit_length() + 7) // 8
    step = k - 11
    out = bytearray()
    offsets = range(0, len(data), step) if data else [0]
    for i in offsets:
        out += _enc_block(key, data[i : i + step], k)
    return bytes(out)


def decrypt(key, data: bytes) -> bytes:
    k = (key.n.bit_length() + 7) // 8
    if len(data) % k != 0:
        raise ValueError("ciphertext length not a multiple of the modulus size")
    out = bytearray()
    for i in range(0, len(data), k):
        out += _dec_block(key, data[i : i + k], k)
    return bytes(out)
