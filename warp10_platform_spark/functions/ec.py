"""Pure-Python elliptic-curve crypto for the EC* WarpScript surface.

Reference semantics (script/functions/ECGEN.java, ECPUBLIC/ECPRIVATE,
ECSIGN/ECVERIFY.java, ECDH.java, ECRECOVER.java): key parameter maps
{curve, d} / {curve, q}, Java Signature names ("SHA256withECDSA" → DER
(r,s)), ECDH pushes the shared-secret x-coordinate as an even-length
hex string, ECRECOVER yields candidate public keys as ISO-8859-1
strings of the uncompressed point encoding.

Supported named curves: secp256k1 and secp256r1 — the two the
reference's users overwhelmingly sign with.  The curve constants are
SELF-CHECKED at import (G satisfies the curve equation and n·G = O), so
a mistyped parameter fails immediately rather than producing garbage.

Signing uses RFC 6979 deterministic nonces; correctness is pinned by
the RFC's own A.2.5 P-256/SHA-256 test vector in
tests/test_digests_secure.py — an end-to-end external validation of the
curve constants, scalar multiplication, nonce derivation and ECDSA.
"""

from __future__ import annotations

import hashlib
import hmac
import secrets

KEY_CURVE = "curve"
KEY_D = "d"
KEY_Q = "q"


class Curve:
    __slots__ = ("name", "p", "a", "b", "gx", "gy", "n", "h")

    def __init__(self, name, p, a, b, gx, gy, n, h=1):
        self.name, self.p, self.a, self.b = name, p, a, b
        self.gx, self.gy, self.n, self.h = gx, gy, n, h
        # self-check: G on curve, n*G at infinity
        assert (gy * gy - (gx * gx * gx + a * gx + b)) % p == 0, f"{name}: G not on curve"
        assert point_mul(self, n, (gx, gy)) is None, f"{name}: n*G != O"


def _inv(x: int, m: int) -> int:
    return pow(x, -1, m)


def point_add(c: "Curve", P, Q):
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2:
        if (y1 + y2) % c.p == 0:
            return None
        lam = (3 * x1 * x1 + c.a) * _inv(2 * y1, c.p) % c.p
    else:
        lam = (y2 - y1) * _inv(x2 - x1, c.p) % c.p
    x3 = (lam * lam - x1 - x2) % c.p
    return (x3, (lam * (x1 - x3) - y1) % c.p)


def point_mul(c: "Curve", k: int, P):
    R = None
    while k:
        if k & 1:
            R = point_add(c, R, P)
        P = point_add(c, P, P)
        k >>= 1
    return R


CURVES: dict[str, Curve] = {}
for _c in (
    Curve(
        "secp256k1",
        p=2**256 - 2**32 - 977,
        a=0,
        b=7,
        gx=0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
        gy=0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
        n=0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141,
    ),
    Curve(
        "secp256r1",
        p=2**256 - 2**224 + 2**192 + 2**96 - 1,
        a=-3,
        b=0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B,
        gx=0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
        gy=0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5,
        n=0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551,
    ),
):
    CURVES[_c.name] = _c


class ECPrivateKey:
    __slots__ = ("curve", "d")

    def __init__(self, curve: Curve, d: int):
        self.curve, self.d = curve, d

    def __repr__(self):
        return f"ECPrivateKey({self.curve.name})"


class ECPublicKey:
    __slots__ = ("curve", "q")

    def __init__(self, curve: Curve, q):
        self.curve, self.q = curve, q

    def __repr__(self):
        return f"ECPublicKey({self.curve.name})"


def _fe_len(c: Curve) -> int:
    return (c.p.bit_length() + 7) // 8


def encode_point(c: Curve, P, compressed: bool = False) -> bytes:
    if P is None:
        return b"\x00"
    L = _fe_len(c)
    x, y = P
    if compressed:
        return bytes([0x02 + (y & 1)]) + x.to_bytes(L, "big")
    return b"\x04" + x.to_bytes(L, "big") + y.to_bytes(L, "big")


def decode_point(c: Curve, data: bytes):
    L = _fe_len(c)
    if data[0] == 0x04:
        return (int.from_bytes(data[1 : 1 + L], "big"), int.from_bytes(data[1 + L :], "big"))
    if data[0] in (0x02, 0x03):
        x = int.from_bytes(data[1 : 1 + L], "big")
        y2 = (x * x * x + c.a * x + c.b) % c.p
        y = pow(y2, (c.p + 1) // 4, c.p)  # p ≡ 3 mod 4 for both curves
        if (y * y - y2) % c.p != 0:
            raise ValueError("point not on curve")
        if y & 1 != data[0] & 1:
            y = c.p - y
        return (x, y)
    raise ValueError("unsupported point encoding")


def generate(curve_name: str) -> tuple[ECPrivateKey, ECPublicKey]:
    c = CURVES[curve_name]
    d = secrets.randbelow(c.n - 1) + 1
    return ECPrivateKey(c, d), ECPublicKey(c, point_mul(c, d, (c.gx, c.gy)))


def public_from_private(priv: ECPrivateKey) -> ECPublicKey:
    c = priv.curve
    return ECPublicKey(c, point_mul(c, priv.d, (c.gx, c.gy)))


# ---------------------------------------------------------------------------
# ECDSA (RFC 6979 deterministic nonce; DER (r,s) signatures like Java)
# ---------------------------------------------------------------------------

_EC_DIGESTS = {
    "SHA1WITHECDSA": "sha1",
    "SHA256WITHECDSA": "sha256",
    "SHA384WITHECDSA": "sha384",
    "SHA512WITHECDSA": "sha512",
}


def _bits2int(b: bytes, n: int) -> int:
    z = int.from_bytes(b, "big")
    extra = len(b) * 8 - n.bit_length()
    return z >> extra if extra > 0 else z


def _rfc6979_k(c: Curve, d: int, h1: bytes, hashname: str) -> int:
    qlen = (c.n.bit_length() + 7) // 8
    x = d.to_bytes(qlen, "big")
    z = (_bits2int(h1, c.n) % c.n).to_bytes(qlen, "big")
    hlen = hashlib.new(hashname).digest_size
    V = b"\x01" * hlen
    K = b"\x00" * hlen
    K = hmac.new(K, V + b"\x00" + x + z, hashname).digest()
    V = hmac.new(K, V, hashname).digest()
    K = hmac.new(K, V + b"\x01" + x + z, hashname).digest()
    V = hmac.new(K, V, hashname).digest()
    while True:
        t = b""
        while len(t) < qlen:
            V = hmac.new(K, V, hashname).digest()
            t += V
        k = _bits2int(t[:qlen], c.n)
        if 1 <= k < c.n:
            return k
        K = hmac.new(K, V + b"\x00", hashname).digest()
        V = hmac.new(K, V, hashname).digest()


def _der_int(v: int) -> bytes:
    b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return b"\x02" + bytes([len(b)]) + b


def _der_sig(r: int, s: int) -> bytes:
    body = _der_int(r) + _der_int(s)
    if len(body) < 0x80:
        return b"\x30" + bytes([len(body)]) + body
    return b"\x30\x81" + bytes([len(body)]) + body


def _parse_der_sig(sig: bytes) -> tuple[int, int]:
    if sig[0] != 0x30:
        raise ValueError("not a DER signature")
    pos = 2
    if sig[1] & 0x80:
        pos = 2 + (sig[1] & 0x7F)
    if sig[pos] != 0x02:
        raise ValueError("bad DER integer")
    rlen = sig[pos + 1]
    r = int.from_bytes(sig[pos + 2 : pos + 2 + rlen], "big")
    pos += 2 + rlen
    if sig[pos] != 0x02:
        raise ValueError("bad DER integer")
    slen = sig[pos + 1]
    s = int.from_bytes(sig[pos + 2 : pos + 2 + slen], "big")
    return r, s


def sign(alg: str, key: ECPrivateKey, data: bytes) -> bytes:
    hashname = _EC_DIGESTS[alg.upper()]
    c = key.curve
    h1 = hashlib.new(hashname, data).digest()
    z = _bits2int(h1, c.n) % c.n
    k = _rfc6979_k(c, key.d, h1, hashname)
    x, _y = point_mul(c, k, (c.gx, c.gy))
    r = x % c.n
    s = _inv(k, c.n) * (z + r * key.d) % c.n
    return _der_sig(r, s)


def verify(alg: str, key: ECPublicKey, data: bytes, sig: bytes) -> bool:
    hashname = _EC_DIGESTS[alg.upper()]
    c = key.curve
    try:
        r, s = _parse_der_sig(sig)
    except (ValueError, IndexError):
        return False
    if not (1 <= r < c.n and 1 <= s < c.n):
        return False
    h1 = hashlib.new(hashname, data).digest()
    z = _bits2int(h1, c.n) % c.n
    w = _inv(s, c.n)
    u1 = z * w % c.n
    u2 = r * w % c.n
    P = point_add(c, point_mul(c, u1, (c.gx, c.gy)), point_mul(c, u2, key.q))
    return P is not None and P[0] % c.n == r


def ecdh(priv: ECPrivateKey, pub: ECPublicKey) -> str:
    """Shared-secret x-coordinate as an even-length hex string
    (ECDH.java:110-125)."""
    x, _y = point_mul(priv.curve, priv.d, pub.q)
    hx = format(x, "x")
    return "0" + hx if len(hx) % 2 else hx


def recover(c: Curve, z: int, r: int, s: int, j_range, types) -> list:
    """ECRECOVER.java:208-270: candidate public keys Q = r^-1(sR - zG)
    for R at x = r + j·n with each requested y-parity, plus the
    conjugate R' — uncompressed-encoded, order-preserving dedup."""
    out = []
    seen = set()
    rinv = _inv(r, c.n)
    for j in j_range:
        x = r + j * c.n
        if x >= c.p:
            continue
        for t in types:
            try:
                R = decode_point(c, bytes([t]) + x.to_bytes(_fe_len(c), "big"))
            except ValueError:
                continue
            if point_mul(c, c.n, R) is not None:
                continue
            for Rpt in (R, (R[0], c.p - R[1])):
                sR = point_mul(c, s, Rpt)
                zG = point_mul(c, z, (c.gx, c.gy))
                neg_zG = None if zG is None else (zG[0], c.p - zG[1])
                Q = point_mul(c, rinv, point_add(c, sR, neg_zG))
                enc = encode_point(c, Q)
                if enc not in seen:
                    seen.add(enc)
                    out.append(enc)
    return out
