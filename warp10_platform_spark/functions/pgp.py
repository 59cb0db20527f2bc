"""Pure-Python OpenPGP (RFC 4880 subset) for the PGP* WarpScript surface.

Reference semantics (script/functions/PGPRING.java, PGPPUBLIC/PGPPRIVATE,
PGPSIGN/PGPVERIFY.java, PGPENCRYPT/PGPDECRYPT.java, PGPINFO.java): key
rings parsed from armored or binary blobs, key selection by 64-bit key
id (long or hex-string tail), v4 signatures over BINARY_DOCUMENT
(detached or one-pass inline), public-key encryption as PKESK + SEIPD
with MDC integrity, ASCII armor in and out.

Scope: v4 RSA keys (sign + encrypt), SHA-1/256/384/512 digests, AES
session ciphers, iterated-salted S2K secret-key protection, zlib/zip
compressed-data read path.  That is exactly what GnuPG 2.2 produces for
an RSA key, and the tests cross-validate BOTH directions against the
gpg binary present in this environment: our signatures verify under
``gpg --verify``, gpg's detached signatures verify here, our messages
decrypt under ``gpg --decrypt``, and gpg-encrypted messages decrypt
here.  Elliptic/EdDSA keys and AEAD (v5/v6) raise cleanly.

This is driver-side scalar machinery like the rest of the crypto tier —
nothing here touches a per-row Spark path.
"""

from __future__ import annotations

import hashlib
import secrets
import struct
import time
import zlib

from warp10_platform_spark.functions import aes as _aes
from warp10_platform_spark.functions import rsa as _rsa

# packet tags
TAG_PKESK = 1
TAG_SIGNATURE = 2
TAG_ONEPASS = 4
TAG_SECRET_KEY = 5
TAG_PUBLIC_KEY = 6
TAG_SECRET_SUBKEY = 7
TAG_COMPRESSED = 8
TAG_SYM_ENC = 9
TAG_LITERAL = 11
TAG_USER_ID = 13
TAG_PUBLIC_SUBKEY = 14
TAG_SEIPD = 18
TAG_MDC = 19

ALGO_RSA = 1
ALGO_RSA_ENCRYPT = 2
ALGO_RSA_SIGN = 3

SYM_ALGOS = {"AES_128": (7, 16), "AES_192": (8, 24), "AES_256": (9, 32)}
SYM_BY_ID = {7: 16, 8: 24, 9: 32}

HASH_IDS = {"MD5": 1, "SHA1": 2, "SHA256": 8, "SHA384": 9, "SHA512": 10, "SHA224": 11}
HASH_NAMES = {v: k for k, v in HASH_IDS.items()}
_HASHLIB = {1: "md5", 2: "sha1", 8: "sha256", 9: "sha384", 10: "sha512", 11: "sha224"}


# ---------------------------------------------------------------------------
# MPI + packet framing
# ---------------------------------------------------------------------------

def _mpi(v: int) -> bytes:
    if v == 0:
        return b"\x00\x00"
    nb = v.bit_length()
    return struct.pack(">H", nb) + v.to_bytes((nb + 7) // 8, "big")


def _read_mpi(buf: bytes, pos: int) -> tuple[int, int]:
    nb = struct.unpack_from(">H", buf, pos)[0]
    ln = (nb + 7) // 8
    return int.from_bytes(buf[pos + 2 : pos + 2 + ln], "big"), pos + 2 + ln


def _new_packet(tag: int, body: bytes) -> bytes:
    hdr = bytes([0xC0 | tag])
    n = len(body)
    if n < 192:
        return hdr + bytes([n]) + body
    if n < 8384:
        n -= 192
        return hdr + bytes([192 + (n >> 8), n & 0xFF]) + body
    return hdr + b"\xff" + struct.pack(">I", len(body)) + body


def parse_packets(data: bytes) -> list[tuple[int, bytes]]:
    """→ [(tag, body)] — old + new format headers, partial lengths."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        c = data[pos]
        if not c & 0x80:
            raise ValueError("not an OpenPGP packet stream")
        pos += 1
        if c & 0x40:  # new format
            tag = c & 0x3F
            body = bytearray()
            while True:
                l0 = data[pos]
                pos += 1
                if l0 < 192:
                    ln, partial = l0, False
                elif l0 < 224:
                    ln = ((l0 - 192) << 8) + data[pos] + 192
                    pos += 1
                    partial = False
                elif l0 == 255:
                    ln = struct.unpack_from(">I", data, pos)[0]
                    pos += 4
                    partial = False
                else:
                    ln, partial = 1 << (l0 & 0x1F), True
                body += data[pos : pos + ln]
                pos += ln
                if not partial:
                    break
        else:  # old format
            tag = (c >> 2) & 0x0F
            lt = c & 0x03
            if lt == 0:
                ln = data[pos]
                pos += 1
            elif lt == 1:
                ln = struct.unpack_from(">H", data, pos)[0]
                pos += 2
            elif lt == 2:
                ln = struct.unpack_from(">I", data, pos)[0]
                pos += 4
            else:
                ln = n - pos  # indeterminate: to end of input
            body = data[pos : pos + ln]
            pos += ln
        out.append((tag, bytes(body)))
    return out


# ---------------------------------------------------------------------------
# armor
# ---------------------------------------------------------------------------

def _crc24(data: bytes) -> int:
    crc = 0xB704CE
    for b in data:
        crc ^= b << 16
        for _ in range(8):
            crc <<= 1
            if crc & 0x1000000:
                crc ^= 0x1864CFB
    return crc & 0xFFFFFF


def armor(kind: str, data: bytes) -> str:
    import base64

    b64 = base64.b64encode(data).decode("ascii")
    lines = [b64[i : i + 64] for i in range(0, len(b64), 64)]
    crc = base64.b64encode(_crc24(data).to_bytes(3, "big")).decode("ascii")
    return (
        f"-----BEGIN PGP {kind}-----\n\n"
        + "\n".join(lines)
        + f"\n={crc}\n-----END PGP {kind}-----\n"
    )


def dearmor(text: str) -> bytes:
    import base64

    lines = text.replace("\r", "").split("\n")
    body = []
    inside = False
    past_headers = False
    for ln in lines:
        if ln.startswith("-----BEGIN PGP"):
            inside, past_headers = True, False
            continue
        if ln.startswith("-----END PGP"):
            break
        if not inside:
            continue
        if not past_headers:
            if ln.strip() == "":
                past_headers = True
            elif ":" not in ln:  # armor without blank line after headers
                past_headers = True
                body.append(ln.strip())
            continue
        s = ln.strip()
        if s.startswith("="):
            continue  # CRC line
        if s:
            body.append(s)
    if not body:
        raise ValueError("no armored payload found")
    return base64.b64decode("".join(body))


def _maybe_dearmor(blob) -> bytes:
    if isinstance(blob, str):
        if "-----BEGIN PGP" in blob:
            return dearmor(blob)
        return blob.encode("utf-8")
    b = bytes(blob)
    if b[:1] == b"-" and b"-----BEGIN PGP" in b[:64]:
        return dearmor(b.decode("utf-8", "replace"))
    return b


# ---------------------------------------------------------------------------
# keys
# ---------------------------------------------------------------------------

class PGPPublicKey:
    __slots__ = ("algo", "n", "e", "creation", "fingerprint", "keyid",
                 "is_subkey", "uids")

    def __init__(self, algo, n, e, creation, body, is_subkey):
        self.algo, self.n, self.e, self.creation = algo, n, e, creation
        h = hashlib.sha1(b"\x99" + struct.pack(">H", len(body)) + body).digest()
        self.fingerprint = h
        self.keyid = int.from_bytes(h[-8:], "big")
        self.is_subkey = is_subkey
        self.uids: list[str] = []

    @property
    def bits(self) -> int:
        return self.n.bit_length()

    def encode_body(self) -> bytes:
        return (
            b"\x04" + struct.pack(">I", self.creation) + bytes([self.algo])
            + _mpi(self.n) + _mpi(self.e)
        )

    def __repr__(self):
        return f"PGPPublicKey(0x{self.keyid:016x})"


class PGPSecretKey:
    """Secret (sub)key: public part + either plaintext RSA secrets or the
    S2K-protected payload (decrypted lazily with the passphrase)."""

    __slots__ = ("public", "s2k_usage", "sym_id", "s2k", "iv", "enc", "d", "p", "q", "u")

    def __init__(self, public, s2k_usage, sym_id, s2k, iv, enc, d=None, p=None, q=None, u=None):
        self.public, self.s2k_usage = public, s2k_usage
        self.sym_id, self.s2k, self.iv, self.enc = sym_id, s2k, iv, enc
        self.d, self.p, self.q, self.u = d, p, q, u

    def unlock(self, passphrase: str) -> _rsa.RSAPrivateKey:
        if self.d is not None:
            return _rsa.RSAPrivateKey(self.public.n, self.d)
        if self.s2k_usage not in (254, 255):
            raise ValueError("unsupported secret-key protection")
        key = _s2k_derive(self.s2k, passphrase, SYM_BY_ID[self.sym_id])
        plain = _cfb_decrypt(key, self.iv, self.enc)
        if self.s2k_usage == 254:
            if hashlib.sha1(plain[:-20]).digest() != plain[-20:]:
                raise ValueError("wrong passphrase (SHA1 check failed)")
            payload = plain[:-20]
        else:
            payload = plain[:-2]
        d, pos = _read_mpi(payload, 0)
        p, pos = _read_mpi(payload, pos)
        q, pos = _read_mpi(payload, pos)
        self.d, self.p, self.q = d, p, q
        return _rsa.RSAPrivateKey(self.public.n, d)

    def __repr__(self):
        return f"PGPSecretKey(0x{self.public.keyid:016x})"


class PGPPublicKeyRing:
    def __init__(self, keys, uids):
        self.keys: list[PGPPublicKey] = keys
        self.uids: list[str] = uids

    def get_key(self, keyid: int):
        for k in self.keys:
            if k.keyid == keyid:
                return k
        return None

    def encoded(self) -> bytes:
        out = bytearray()
        for i, k in enumerate(self.keys):
            tag = TAG_PUBLIC_KEY if not k.is_subkey else TAG_PUBLIC_SUBKEY
            out += _new_packet(tag, k.encode_body())
            if i == 0:
                for u in self.uids:
                    out += _new_packet(TAG_USER_ID, u.encode("utf-8"))
        return bytes(out)

    def __repr__(self):
        return f"PGPPublicKeyRing({[hex(k.keyid) for k in self.keys]})"


class PGPSecretKeyRing:
    def __init__(self, keys, uids):
        self.keys: list[PGPSecretKey] = keys
        self.uids: list[str] = uids

    def get_secret_key(self, keyid: int):
        for k in self.keys:
            if k.public.keyid == keyid:
                return k
        return None

    def get_public_key(self, keyid: int = None):
        for k in self.keys:
            if keyid is None or k.public.keyid == keyid:
                return k.public
        return None

    def public_ring(self) -> PGPPublicKeyRing:
        return PGPPublicKeyRing([k.public for k in self.keys], list(self.uids))

    def __repr__(self):
        return f"PGPSecretKeyRing({[hex(k.public.keyid) for k in self.keys]})"


def _parse_pubkey_body(body: bytes, is_subkey: bool) -> PGPPublicKey:
    if body[0] != 4:
        raise ValueError(f"only v4 keys supported (got v{body[0]})")
    creation = struct.unpack_from(">I", body, 1)[0]
    algo = body[5]
    if algo not in (ALGO_RSA, ALGO_RSA_ENCRYPT, ALGO_RSA_SIGN):
        raise ValueError(f"unsupported public-key algorithm {algo} (RSA only)")
    n, pos = _read_mpi(body, 6)
    e, pos = _read_mpi(body, pos)
    return PGPPublicKey(algo, n, e, creation, body, is_subkey)


def _parse_s2k(buf: bytes, pos: int):
    t = buf[pos]
    if t == 0:
        return ("simple", buf[pos + 1], b"", 0), pos + 2
    if t == 1:
        return ("salted", buf[pos + 1], buf[pos + 2 : pos + 10], 0), pos + 10
    if t == 3:
        c = buf[pos + 10]
        count = (16 + (c & 15)) << ((c >> 4) + 6)
        return ("iterated", buf[pos + 1], buf[pos + 2 : pos + 10], count), pos + 11
    raise ValueError(f"unsupported S2K type {t}")


def _s2k_derive(s2k, passphrase: str, keylen: int) -> bytes:
    kind, hash_id, salt, count = s2k
    pw = passphrase.encode("utf-8")
    out = b""
    ctx_prefix = 0
    while len(out) < keylen:
        h = hashlib.new(_HASHLIB[hash_id])
        h.update(b"\x00" * ctx_prefix)
        if kind == "simple":
            h.update(pw)
        elif kind == "salted":
            h.update(salt + pw)
        else:
            block = salt + pw
            total = max(count, len(block))
            full, rem = divmod(total, len(block))
            h.update(block * full + block[:rem])
        out += h.digest()
        ctx_prefix += 1
    return out[:keylen]


def _parse_secret_body(body: bytes, is_subkey: bool) -> PGPSecretKey:
    pos = 6
    _n, pos = _read_mpi(body, pos)
    _e, pos = _read_mpi(body, pos)
    # the fingerprint hashes ONLY the public portion (RFC 4880 §12.2)
    pub = _parse_pubkey_body(body[:pos], is_subkey)
    usage = body[pos]
    pos += 1
    if usage == 0:  # unprotected
        d, pos = _read_mpi(body, pos)
        p, pos = _read_mpi(body, pos)
        q, pos = _read_mpi(body, pos)
        u, pos = _read_mpi(body, pos)
        return PGPSecretKey(pub, 0, None, None, None, None, d, p, q, u)
    if usage in (254, 255):
        sym_id = body[pos]
        pos += 1
        if sym_id not in SYM_BY_ID:
            raise ValueError(f"unsupported secret-key cipher {sym_id}")
        s2k, pos = _parse_s2k(body, pos)
        iv = body[pos : pos + 16]
        pos += 16
        return PGPSecretKey(pub, usage, sym_id, s2k, iv, body[pos:])
    raise ValueError(f"unsupported S2K usage {usage}")


def parse_rings(blob) -> list:
    """PGPRING: blob (armored or binary) → list of key rings."""
    data = _maybe_dearmor(blob)
    rings = []
    cur_keys, cur_uids, secret = [], [], False
    for tag, body in parse_packets(data):
        if tag in (TAG_PUBLIC_KEY, TAG_SECRET_KEY):
            if cur_keys:
                rings.append(
                    PGPSecretKeyRing(cur_keys, cur_uids) if secret
                    else PGPPublicKeyRing(cur_keys, cur_uids)
                )
            cur_keys, cur_uids = [], []
            secret = tag == TAG_SECRET_KEY
            cur_keys.append(
                _parse_secret_body(body, False) if secret
                else _parse_pubkey_body(body, False)
            )
        elif tag in (TAG_PUBLIC_SUBKEY, TAG_SECRET_SUBKEY):
            cur_keys.append(
                _parse_secret_body(body, True) if tag == TAG_SECRET_SUBKEY
                else _parse_pubkey_body(body, True)
            )
        elif tag == TAG_USER_ID:
            cur_uids.append(body.decode("utf-8", "replace"))
        # signatures/trust packets are retained implicitly (not validated)
    if cur_keys:
        rings.append(
            PGPSecretKeyRing(cur_keys, cur_uids) if secret
            else PGPPublicKeyRing(cur_keys, cur_uids)
        )
    return rings


# ---------------------------------------------------------------------------
# CFB (OpenPGP uses standard CFB-128 for SEIPD; zero IV)
# ---------------------------------------------------------------------------

def _cfb_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    out = bytearray()
    fb = bytes(iv)
    for i in range(0, len(data), 16):
        ks = _aes.encrypt_block(key, fb)
        block = data[i : i + 16]
        ct = bytes(a ^ b for a, b in zip(block, ks))
        out += ct
        fb = ct if len(ct) == 16 else (ct + fb[len(ct):])
    return bytes(out)


def _cfb_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    out = bytearray()
    fb = bytes(iv)
    for i in range(0, len(data), 16):
        ks = _aes.encrypt_block(key, fb)
        block = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(block, ks))
        fb = block if len(block) == 16 else (block + fb[len(block):])
    return bytes(out)


# ---------------------------------------------------------------------------
# signatures (v4, RSA)
# ---------------------------------------------------------------------------

def _subpacket(t: int, body: bytes) -> bytes:
    return bytes([len(body) + 1, t]) + body


def _sig_trailer(hashed: bytes, sigtype: int, pk_algo: int, hash_id: int) -> bytes:
    head = bytes([4, sigtype, pk_algo, hash_id]) + struct.pack(">H", len(hashed)) + hashed
    return head + b"\x04\xff" + struct.pack(">I", len(head))


def sign_detached(priv: _rsa.RSAPrivateKey, keyid: int, data: bytes,
                  hash_name: str = "SHA512", when: int | None = None) -> bytes:
    """v4 BINARY_DOCUMENT detached signature packet (binary, no armor)."""
    hash_id = HASH_IDS[hash_name.upper()]
    when = int(time.time()) if when is None else when
    hashed = _subpacket(2, struct.pack(">I", when))  # creation time
    unhashed = _subpacket(16, keyid.to_bytes(8, "big"))  # issuer
    trailer = _sig_trailer(hashed, 0x00, ALGO_RSA, hash_id)
    h = hashlib.new(_HASHLIB[hash_id], data + trailer).digest()
    k = (priv.n.bit_length() + 7) // 8
    em = int.from_bytes(
        _rsa._emsa(f"{hash_name.upper()}WITHRSA", data + trailer, k), "big"
    )
    sig_int = pow(em, priv.d, priv.n)
    body = (
        bytes([4, 0x00, ALGO_RSA, hash_id])
        + struct.pack(">H", len(hashed)) + hashed
        + struct.pack(">H", len(unhashed)) + unhashed
        + h[:2]
        + _mpi(sig_int)
    )
    return _new_packet(TAG_SIGNATURE, body)


def sign_onepass(priv: _rsa.RSAPrivateKey, keyid: int, data: bytes,
                 hash_name: str = "SHA512", when: int | None = None) -> bytes:
    """One-pass signed message: OPS + literal + signature."""
    hash_id = HASH_IDS[hash_name.upper()]
    ops = bytes([3, 0x00, hash_id, ALGO_RSA]) + keyid.to_bytes(8, "big") + b"\x01"
    lit = _literal_packet(data, when)
    sig = sign_detached(priv, keyid, data, hash_name, when)
    return _new_packet(TAG_ONEPASS, ops) + lit + sig


def _literal_packet(data: bytes, when: int | None = None) -> bytes:
    when = int(time.time()) if when is None else when
    name = b"_CONSOLE"
    body = b"b" + bytes([len(name)]) + name + struct.pack(">I", when) + data
    return _new_packet(TAG_LITERAL, body)


class ParsedSignature:
    __slots__ = ("sigtype", "pk_algo", "hash_id", "hashed", "keyid", "left2", "sig_int")

    def __init__(self, body: bytes):
        if body[0] != 4:
            raise ValueError(f"only v4 signatures supported (got v{body[0]})")
        self.sigtype, self.pk_algo, self.hash_id = body[1], body[2], body[3]
        hl = struct.unpack_from(">H", body, 4)[0]
        self.hashed = body[6 : 6 + hl]
        pos = 6 + hl
        ul = struct.unpack_from(">H", body, pos)[0]
        unhashed = body[pos + 2 : pos + 2 + ul]
        pos += 2 + ul
        self.left2 = body[pos : pos + 2]
        pos += 2
        self.sig_int, _ = _read_mpi(body, pos)
        self.keyid = self._find_issuer(self.hashed) or self._find_issuer(unhashed)

    @staticmethod
    def _find_issuer(subs: bytes):
        pos = 0
        while pos < len(subs):
            l0 = subs[pos]
            if l0 < 192:
                ln = l0
                pos += 1
            elif l0 < 255:
                ln = ((l0 - 192) << 8) + subs[pos + 1] + 192
                pos += 2
            else:
                ln = struct.unpack_from(">I", subs, pos + 1)[0]
                pos += 5
            t = subs[pos]
            if t & 0x7F == 16:
                return int.from_bytes(subs[pos + 1 : pos + 9], "big")
            if t & 0x7F == 33 and ln >= 21:  # issuer fingerprint (v4)
                return int.from_bytes(subs[pos + 2 + 12 : pos + 2 + 20], "big")
            pos += ln
        return None


def verify_signature(pub: PGPPublicKey, data: bytes, sig_body: bytes) -> bool:
    sig = ParsedSignature(sig_body)
    if sig.pk_algo not in (ALGO_RSA, ALGO_RSA_SIGN):
        raise ValueError("only RSA signatures supported")
    trailer = _sig_trailer(sig.hashed, sig.sigtype, sig.pk_algo, sig.hash_id)
    msg = data + trailer
    h = hashlib.new(_HASHLIB[sig.hash_id], msg).digest()
    if h[:2] != sig.left2:
        return False
    k = (pub.n.bit_length() + 7) // 8
    em = pow(sig.sig_int, pub.e, pub.n).to_bytes(k, "big")
    try:
        want = _rsa._emsa(f"{HASH_NAMES[sig.hash_id]}WITHRSA", msg, k)
    except (KeyError, ValueError):
        return False
    return em == want


# ---------------------------------------------------------------------------
# encryption (PKESK v3 + SEIPD v1 with MDC)
# ---------------------------------------------------------------------------

def encrypt(pub: PGPPublicKey, data: bytes, sym_name: str = "AES_256",
            throw_keyid: bool = True, when: int | None = None) -> bytes:
    sym_id, keylen = SYM_ALGOS[sym_name]
    session = secrets.token_bytes(keylen)
    checksum = sum(session) & 0xFFFF
    info = bytes([sym_id]) + session + struct.pack(">H", checksum)
    k = (pub.n.bit_length() + 7) // 8
    # EME-PKCS1-v1_5
    ps = bytes(b or secrets.randbelow(255) + 1 for b in secrets.token_bytes(k - 3 - len(info)))
    em = b"\x00\x02" + ps + b"\x00" + info
    enc = pow(int.from_bytes(em, "big"), pub.e, pub.n)
    keyid = 0 if throw_keyid else pub.keyid
    pkesk = bytes([3]) + keyid.to_bytes(8, "big") + bytes([ALGO_RSA]) + _mpi(enc)
    # SEIPD v1
    lit = _literal_packet(data, when)
    prefix = secrets.token_bytes(16)
    prefix += prefix[14:16]
    mdc_body = hashlib.sha1(prefix + lit + b"\xd3\x14").digest()
    plain = prefix + lit + b"\xd3\x14" + mdc_body
    ct = _cfb_encrypt(session, b"\x00" * 16, plain)
    seipd = b"\x01" + ct
    return _new_packet(TAG_PKESK, pkesk) + _new_packet(TAG_SEIPD, seipd)


def decrypt(secret: PGPSecretKey, passphrase: str, blob) -> bytes:
    data = _maybe_dearmor(blob)
    priv = secret.unlock(passphrase)
    session = None
    sym_id = None
    for tag, body in parse_packets(data):
        if tag == TAG_PKESK:
            if body[0] != 3:
                raise ValueError(f"unsupported PKESK version {body[0]}")
            if body[9] != ALGO_RSA and body[9] != ALGO_RSA_ENCRYPT:
                raise ValueError("only RSA PKESK supported")
            enc, _ = _read_mpi(body, 10)
            k = (priv.n.bit_length() + 7) // 8
            em = pow(enc, priv.d, priv.n).to_bytes(k, "big")
            if em[0] != 0 or em[1] != 2:
                continue  # not for this key
            info = em[em.index(0, 2) + 1 :]
            cand_sym = info[0]
            if cand_sym not in SYM_BY_ID:
                continue
            keylen = SYM_BY_ID[cand_sym]
            cand_session = info[1 : 1 + keylen]
            want = struct.unpack_from(">H", info, 1 + keylen)[0]
            if sum(cand_session) & 0xFFFF != want:
                continue
            session, sym_id = cand_session, cand_sym
        elif tag == TAG_SEIPD:
            if session is None:
                raise ValueError("no decryptable PKESK before SEIPD")
            if body[0] != 1:
                raise ValueError(f"unsupported SEIPD version {body[0]}")
            plain = _cfb_decrypt(session, b"\x00" * 16, body[1:])
            if plain[14:16] != plain[16:18]:
                raise ValueError("session-key check failed")
            inner = plain[18:]
            # MDC: last 22 bytes are 0xD3 0x14 + SHA1
            if inner[-22:-20] != b"\xd3\x14":
                raise ValueError("missing MDC")
            if hashlib.sha1(plain[:-20]).digest() != inner[-20:]:
                raise ValueError("MDC integrity check failed")
            return _extract_literal(inner[:-22])
        elif tag == TAG_SYM_ENC:
            raise ValueError("non-integrity-protected data not supported")
    raise ValueError("no SEIPD packet found")


def _extract_literal(data: bytes) -> bytes:
    for tag, body in parse_packets(data):
        if tag == TAG_LITERAL:
            nl = body[1]
            return body[2 + nl + 4 :]
        if tag == TAG_COMPRESSED:
            algo = body[0]
            if algo == 1:  # zip (raw deflate)
                return _extract_literal(zlib.decompress(body[1:], -15))
            if algo == 2:  # zlib
                return _extract_literal(zlib.decompress(body[1:]))
            raise ValueError(f"unsupported compression algorithm {algo}")
    raise ValueError("no literal data packet found")
