"""Secure-script tier: SECUREKEY / SECURE / UNSECURE / EVALSECURE,
plus the raw AESWRAP / AESUNWRAP primitives.

Reference semantics (script/functions/SECURE.java, UNSECURE.java,
EVALSECURE.java, SECUREKEY.java, AESWRAP.java, crypto/CryptoUtils.java):

- SECUREKEY pops a string and stores it as the stack's secure key
  attribute.
- SECURE pops a *script string*, builds a thrift SecureScript
  {1: i64 timestamp, 2: string key, 3: binary script, 4: bool compressed}
  (io_warp10_script_thrift_data.thrift:65-84), gzips the script when that
  shrinks it, TCompact-serializes, AES-keywraps (RFC 3394 over a
  PKCS7-to-8 padded payload) with the *instance* key, and pushes the
  OrderPreservingBase64 encoding.
- UNSECURE reverses it, refusing when the embedded key differs from the
  stack's secure key.  EVALSECURE executes the recovered script without
  ever pushing its source.
- `data key AESWRAP` prepends an 8-byte random nonce then
  CryptoUtils.wrap's; AESUNWRAP strips the nonce (AESWRAP.java:44-75).

The instance key is a deployment secret in the reference (keystore entry
AES_SECURESCRIPTS), so secured blobs were never portable across
instances; here it defaults to a fixed development key and can be
overridden via the stack attribute ``secure.master.key`` (byte[16/24/32])
— the wire ENVELOPE (thrift struct + RFC 3394 + OPB64) is byte-faithful,
so a deployment that loads the same master key interoperates with
reference blobs.
"""

from __future__ import annotations

import gzip
import os

from warp10_platform_spark.core import gtscodec as gc
from warp10_platform_spark.functions import aes
from warp10_platform_spark.warpscript.functions import REGISTRY, register

_SECURE_KEY_ATTR = "secure.key"
_MASTER_KEY_ATTR = "secure.master.key"
# development default for the instance master key (reference: keystore
# entry warp.aes.securescripts); override via the stack attribute above
_DEFAULT_MASTER = bytes(range(32))

_CT_STOP = 0
_CT_TRUE = 1
_CT_FALSE = 2
_CT_I64 = 6
_CT_BINARY = 8


def _master(st) -> bytes:
    k = getattr(st, "attributes", {}).get(_MASTER_KEY_ATTR)
    return k if isinstance(k, (bytes, bytearray)) else _DEFAULT_MASTER


def _secure_key(st) -> str:
    k = getattr(st, "attributes", {}).get(_SECURE_KEY_ATTR)
    if k is None:
        raise RuntimeError("You need to set the secure key first.")
    return str(k)


def _serialize_secure(timestamp_ms: int, key: str, script: str) -> bytes:
    raw = script.encode("utf-8")
    gz = gc._gzip_det(raw)
    compressed = len(gz) < len(raw)
    body = gz if compressed else raw
    out = bytearray()
    prev = 0
    prev = gc._w_field(out, prev, 1, _CT_I64)
    gc.write_svarint(out, timestamp_ms)
    prev = gc._w_field(out, prev, 2, _CT_BINARY)
    gc._w_binary(out, key.encode("utf-8"))
    prev = gc._w_field(out, prev, 3, _CT_BINARY)
    gc._w_binary(out, body)
    prev = gc._w_field(out, prev, 4, _CT_TRUE if compressed else _CT_FALSE)
    out.append(_CT_STOP)
    return bytes(out)


def _deserialize_secure(buf: bytes) -> dict:
    pos = 0
    prev = 0
    fields: dict[int, object] = {}
    while pos < len(buf):
        hdr = buf[pos]
        pos += 1
        if hdr == _CT_STOP:
            break
        ctype = hdr & 0x0F
        delta = hdr >> 4
        if delta:
            fid = prev + delta
        else:
            fid, pos = gc.read_svarint(buf, pos)
        prev = fid
        if ctype in (_CT_TRUE, _CT_FALSE):
            fields[fid] = ctype == _CT_TRUE
        elif ctype == _CT_I64:
            fields[fid], pos = gc.read_svarint(buf, pos)
        elif ctype == _CT_BINARY:
            fields[fid], pos = gc._r_binary(buf, pos)
        else:
            pos = gc._skip(buf, pos, ctype)
    script = fields.get(3, b"")
    if fields.get(4, False):
        script = gzip.decompress(script)
    return {
        "timestamp": fields.get(1, 0),
        "key": (fields.get(2, b"") or b"").decode("utf-8"),
        "script": script.decode("utf-8"),
    }


def secure(master: bytes, key: str, script: str, timestamp_ms: int = 0) -> str:
    serialized = _serialize_secure(timestamp_ms, key, script)
    return gc.opb64_encode(aes.wrap(master, serialized))


def unsecure(master: bytes, blob: str) -> dict:
    return _deserialize_secure(aes.unwrap(master, gc.opb64_decode(blob)))


@register("SECUREKEY")
def _securekey(st):
    """SECUREKEY (SECUREKEY.java:42): store the secure key attribute."""
    if not hasattr(st, "attributes"):
        st.attributes = {}
    st.attributes[_SECURE_KEY_ATTR] = str(st.pop())


@register("SECURE")
def _secure(st):
    """SECURE (SECURE.java:49-133): script string → opaque secured blob."""
    import time

    o = st.pop()
    if not isinstance(o, str):
        raise TypeError("SECURE operates on a string.")
    st.push(secure(_master(st), _secure_key(st), o, int(time.time() * 1000)))


@register("UNSECURE")
def _unsecure(st):
    """UNSECURE (UNSECURE.java, checkkey=true): secured blob → script,
    refusing when the embedded key differs from the stack's."""
    blob = str(st.pop())
    s = unsecure(_master(st), blob)
    if s["key"] != _secure_key(st):
        raise RuntimeError("Invalid secure key.")
    st.push(s["script"])


@register("EVALSECURE")
def _evalsecure(st):
    """EVALSECURE (EVALSECURE.java:76-78): execute a secured script
    without exposing its source (no key check, like the reference's
    UNSECURE(checkkey=false) path)."""
    blob = str(st.pop())
    st.exec(unsecure(_master(st), blob)["script"])


@register("AESWRAP")
def _aeswrap(st):
    """data key AESWRAP (AESWRAP.java:44-75): nonce-prefixed keywrap."""
    key = st.pop()
    if not isinstance(key, (bytes, bytearray)) or len(key) not in (16, 24, 32):
        raise TypeError("AESWRAP expects a 128/192/256-bit AES key byte array")
    data = st.pop()
    if isinstance(data, str):
        data = data.encode("utf-8")
    if not isinstance(data, (bytes, bytearray)):
        raise TypeError("AESWRAP operates on a byte array or a String.")
    st.push(aes.wrap(bytes(key), os.urandom(8) + bytes(data)))


@register("AESUNWRAP")
def _aesunwrap(st):
    """data key AESUNWRAP (AESUNWRAP.java:40-76): unwrap, strip nonce."""
    key = st.pop()
    if not isinstance(key, (bytes, bytearray)) or len(key) not in (16, 24, 32):
        raise TypeError("AESUNWRAP expects a 128/192/256-bit AES key byte array")
    data = st.pop()
    if not isinstance(data, (bytes, bytearray)):
        raise TypeError("AESUNWRAP operates on a byte array.")
    st.push(aes.unwrap(bytes(key), bytes(data))[8:])


# ---------------------------------------------------------------------------
# RSA tier (RSAGEN.java, RSAPUBLIC/RSAPRIVATE.java, RSASIGN/RSAVERIFY.java,
# RSAENCRYPT/RSADECRYPT.java) — engine in functions/rsa.py
# ---------------------------------------------------------------------------

from warp10_platform_spark.functions import rsa as _rsa


@register("RSAGEN")
def _rsagen(st):
    """exponent strength RSAGEN → private param map, public param map
    (decimal-string values, RSAGEN.java:60-87)."""
    strength = st.pop()
    if not isinstance(strength, int):
        raise TypeError("RSAGEN expects a key length.")
    e = int(str(st.pop()))
    priv, pub = _rsa.generate(int(strength), e)
    st.push({
        _rsa.KEY_MODULUS: str(priv.n),
        _rsa.KEY_ALGORITHM: "RSA",
        _rsa.KEY_EXPONENT: str(priv.d),
    })
    st.push({
        _rsa.KEY_MODULUS: str(pub.n),
        _rsa.KEY_ALGORITHM: "RSA",
        _rsa.KEY_EXPONENT: str(pub.e),
    })


def _key_map(st, cls):
    m = st.pop()
    if not isinstance(m, dict):
        raise TypeError("expects a map on top of the stack.")
    if m.get(_rsa.KEY_ALGORITHM) != "RSA":
        raise ValueError("invalid value for key 'algorithm', expected value 'RSA'.")
    n = int(str(m[_rsa.KEY_MODULUS]))
    x = int(str(m[_rsa.KEY_EXPONENT]))
    return cls(n, x)


REGISTRY["RSAPUBLIC"] = lambda st: st.push(_key_map(st, _rsa.RSAPublicKey))
REGISTRY["RSAPRIVATE"] = lambda st: st.push(_key_map(st, _rsa.RSAPrivateKey))


@register("RSASIGN")
def _rsasign(st):
    """data alg privkey RSASIGN → RSASSA-PKCS1-v1_5 signature bytes."""
    key = st.pop()
    if not isinstance(key, _rsa.RSAPrivateKey):
        raise TypeError("RSASIGN expects a private key on top of the stack.")
    alg = str(st.pop())
    data = st.pop()
    if not isinstance(data, (bytes, bytearray)):
        raise TypeError("RSASIGN operates on a byte array.")
    st.push(_rsa.sign(alg, key, bytes(data)))


@register("RSAVERIFY")
def _rsaverify(st):
    """data sig alg pubkey RSAVERIFY → boolean."""
    key = st.pop()
    if not isinstance(key, _rsa.RSAPublicKey):
        raise TypeError("RSAVERIFY expects a public key on top of the stack.")
    alg = str(st.pop())
    sig = st.pop()
    data = st.pop()
    if not isinstance(sig, (bytes, bytearray)) or not isinstance(data, (bytes, bytearray)):
        raise TypeError("RSAVERIFY operates on byte arrays.")
    st.push(_rsa.verify(alg, key, bytes(data), bytes(sig)))


@register("RSAENCRYPT")
def _rsaencrypt(st):
    """data key RSAENCRYPT: 8-byte nonce prefix then chunked
    RSAES-PKCS1-v1_5 (RSAENCRYPT.java:55-67; block format documented in
    functions/rsa.py — the reference's external helper's exact padding
    is not reproducible here)."""
    key = st.pop()
    if not isinstance(key, (_rsa.RSAPublicKey, _rsa.RSAPrivateKey)):
        raise TypeError("RSAENCRYPT expects a key on top of the stack.")
    data = st.pop()
    if not isinstance(data, (bytes, bytearray)):
        raise TypeError("RSAENCRYPT operates on a byte array.")
    st.push(_rsa.encrypt(key, os.urandom(8) + bytes(data)))


@register("RSADECRYPT")
def _rsadecrypt(st):
    """data key RSADECRYPT: decrypt, strip the 8-byte nonce."""
    key = st.pop()
    if not isinstance(key, (_rsa.RSAPublicKey, _rsa.RSAPrivateKey)):
        raise TypeError("RSADECRYPT expects a key on top of the stack.")
    data = st.pop()
    if not isinstance(data, (bytes, bytearray)):
        raise TypeError("RSADECRYPT operates on a byte array.")
    st.push(_rsa.decrypt(key, bytes(data))[8:])


# ---------------------------------------------------------------------------
# EC tier (ECGEN/ECPUBLIC/ECPRIVATE/ECSIGN/ECVERIFY/ECDH/ECRECOVER.java)
# — engine in functions/ec.py (curves self-checked, RFC 6979 vector-pinned)
# ---------------------------------------------------------------------------

from warp10_platform_spark.functions import ec as _ec


def _curve_of(name):
    c = _ec.CURVES.get(str(name))
    if c is None:
        raise ValueError(
            f"unsupported curve {name!r} (supported: {', '.join(_ec.CURVES)})"
        )
    return c


@register("ECGEN")
def _ecgen(st):
    """curvename ECGEN → private map {curve, d}, public map {curve, q}
    (ECGEN.java:104-152; q = hex of the uncompressed point)."""
    c = _curve_of(st.pop())
    priv, pub = _ec.generate(c.name)
    st.push({_ec.KEY_CURVE: c.name, _ec.KEY_D: str(priv.d)})
    st.push({_ec.KEY_CURVE: c.name, _ec.KEY_Q: _ec.encode_point(c, pub.q).hex()})


@register("ECPRIVATE")
def _ecprivate(st):
    """map {curve, d} ECPRIVATE → private key object."""
    m = st.pop()
    if not isinstance(m, dict):
        raise TypeError("ECPRIVATE expects a parameter map.")
    c = _curve_of(m[_ec.KEY_CURVE])
    st.push(_ec.ECPrivateKey(c, int(str(m[_ec.KEY_D]))))


@register("ECPUBLIC")
def _ecpublic(st):
    """ECPUBLIC (ECPUBLIC.java:100-140): map {curve, q|d} → public key
    object; a private key object → its public key; a public key object
    → its parameter map (the ECGEN double-apply idiom)."""
    v = st.pop()
    if isinstance(v, _ec.ECPrivateKey):
        st.push(_ec.public_from_private(v))
        return
    if isinstance(v, _ec.ECPublicKey):
        st.push({
            _ec.KEY_CURVE: v.curve.name,
            _ec.KEY_Q: _ec.encode_point(v.curve, v.q).hex(),
        })
        return
    if not isinstance(v, dict):
        raise TypeError("ECPUBLIC expects a parameter map or key.")
    c = _curve_of(v[_ec.KEY_CURVE])
    if v.get(_ec.KEY_Q) is not None:
        q = _ec.decode_point(c, bytes.fromhex(str(v[_ec.KEY_Q])))
    elif v.get(_ec.KEY_D) is not None:
        q = _ec.point_mul(c, int(str(v[_ec.KEY_D])), (c.gx, c.gy))
    else:
        raise ValueError("ECPUBLIC needs 'q' or 'd'")
    st.push(_ec.ECPublicKey(c, q))


@register("ECSIGN")
def _ecsign(st):
    """data alg privkey ECSIGN → DER (r,s) signature (deterministic,
    RFC 6979 nonce — the reference's random-k signatures verify
    identically)."""
    key = st.pop()
    if not isinstance(key, _ec.ECPrivateKey):
        raise TypeError("ECSIGN expects an ECC private key.")
    alg = str(st.pop())
    data = st.pop()
    if not isinstance(data, (bytes, bytearray)):
        raise TypeError("ECSIGN operates on a byte array.")
    st.push(_ec.sign(alg, key, bytes(data)))


@register("ECVERIFY")
def _ecverify(st):
    """data sig alg pubkey ECVERIFY → boolean."""
    key = st.pop()
    if not isinstance(key, _ec.ECPublicKey):
        raise TypeError("ECVERIFY expects an ECC public key.")
    alg = str(st.pop())
    sig = st.pop()
    data = st.pop()
    if not isinstance(sig, (bytes, bytearray)) or not isinstance(data, (bytes, bytearray)):
        raise TypeError("ECVERIFY operates on byte arrays.")
    st.push(_ec.verify(alg, key, bytes(data), bytes(sig)))


@register("ECDH")
def _ecdh(st):
    """pubkey privkey ECDH → shared-secret x-coordinate hex string."""
    priv = st.pop()
    if not isinstance(priv, _ec.ECPrivateKey):
        raise TypeError("ECDH expects an ECC private key.")
    pub = st.pop()
    if not isinstance(pub, _ec.ECPublicKey):
        raise TypeError("ECDH expects an ECC public key.")
    st.push(_ec.ecdh(priv, pub))


@register("ECRECOVER")
def _ecrecover(st):
    """map ECRECOVER → list of candidate public keys (ISO-8859-1 strings
    of the uncompressed encoding, ECRECOVER.java:208-270). Map keys:
    curve, hash (bytes), sig (DER bytes) or r/s (decimal or 0x hex
    strings), optional i (cofactor index) and even (y parity)."""
    m = st.pop()
    if not isinstance(m, dict):
        raise TypeError("ECRECOVER expects a MAP.")
    c = _curve_of(m[_ec.KEY_CURVE])
    h = m.get("hash")
    if not isinstance(h, (bytes, bytearray)):
        raise TypeError("ECRECOVER invalid 'hash', expected BYTES.")
    if m.get("sig") is not None:
        r, s = _ec._parse_der_sig(bytes(m["sig"]))
    elif m.get("r") is not None and m.get("s") is not None:
        def _num(x):
            x = str(x).lower()
            return int(x[2:], 16) if x.startswith("0x") else int(x)
        r, s = _num(m["r"]), _num(m["s"])
    else:
        raise ValueError("ECRECOVER expects 'sig' or 'r' and 's'.")
    if not (1 <= r <= c.n and 1 <= s <= c.n):
        raise ValueError("ECRECOVER r/s out of range")
    z = _ec._bits2int(bytes(h), c.n)
    if isinstance(m.get("i"), int):
        j_range = [int(m["i"])]
    else:
        j_range = range(0, c.h + 1)
    if isinstance(m.get("even"), bool):
        types = (0x02,) if m["even"] else (0x03,)
    else:
        types = (0x02, 0x03)
    cands = _ec.recover(c, z % c.n, r, s, j_range, types)
    st.push([e.decode("latin-1") for e in cands])


# ---------------------------------------------------------------------------
# Macro signing (MSIGN/MSIG/MVERIFY/MCHECKSIG/MSIGCOUNT/MSIGINFO/MDETACH
# .java) — ECDSA SHA256WITHECDSA over the macro's canonical source; the
# signature travels as a 4-statement trailer [curve pubhex sighex MSIG]
# appended to the macro, and MSIG pops its three strings when the macro
# executes so a signed macro runs identically (MSIG.java:25-80).
# ---------------------------------------------------------------------------

MSIG_ALG = "SHA256WITHECDSA"


def _macro_source(st, macro) -> bytes:
    """Canonical macro source via the MACRO-> renderer (the engine's
    snapshot form — self-consistent across sign and verify)."""
    from warp10_platform_spark.warpscript.stack import Macro

    class _TmpStack:
        def __init__(self):
            self.stack = []

        def push(self, v):
            self.stack.append(v)

        def pop(self):
            return self.stack.pop()

    tmp = _TmpStack()
    tmp.push(macro if isinstance(macro, Macro) else Macro(list(macro)))
    REGISTRY["MACRO->"](tmp)
    return str(tmp.pop()).encode("utf-8")


def _sig_trailer_of(macro):
    """MSIG.getSignature: the trailing [str str str MSIG] statements."""
    t = macro.tokens
    if (
        len(t) >= 4
        and t[-1].kind == "stmt" and t[-1].value == "MSIG"
        and all(x.kind == "string" for x in t[-4:-1])
    ):
        return [x.value for x in t[-4:-1]]
    return None


def _strip_one_sig(macro):
    from warp10_platform_spark.warpscript.stack import Macro

    return Macro(macro.tokens[:-4]) if _sig_trailer_of(macro) else macro


@register("MSIG")
def _msig(st):
    """macro MSIG → macro + its signature trailer values (or, executed
    inside a signed macro, pops the 3 signature strings: transparent)."""
    from warp10_platform_spark.warpscript.stack import Macro

    top = st.pop()
    if isinstance(top, Macro):
        st.push(top)
        st.push(_sig_trailer_of(top) or [])
        return
    # executing inside a signed macro: consume pubhex and curve below
    st.pop()
    st.pop()


@register("MSIGN")
def _msign(st):
    """macro privkey MSIGN → signed macro (signature trailer appended).
    Signs the canonical source of the macro AS GIVEN — a countersignature
    therefore covers the inner signatures too, like the reference's
    snapshot-then-sign (MSIGN.java:45-95)."""
    from warp10_platform_spark.warpscript.stack import Macro
    from warp10_platform_spark.warpscript.tokenizer import Token

    key = st.pop()
    if not isinstance(key, _ec.ECPrivateKey):
        raise TypeError("MSIGN expects an ECC private key.")
    macro = st.pop()
    if not isinstance(macro, Macro):
        raise TypeError("MSIGN operates on a macro.")
    data = _macro_source(st, macro)
    sig = _ec.sign(MSIG_ALG, key, data)
    pub = _ec.public_from_private(key)
    ln = macro.tokens[-1].lineno if macro.tokens else 0
    trailer = [
        Token("string", key.curve.name, ln),
        Token("string", _ec.encode_point(pub.curve, pub.q).hex(), ln),
        Token("string", sig.hex(), ln),
        Token("stmt", "MSIG", ln),
    ]
    st.push(Macro(macro.tokens + trailer))


def _mverify(macro) -> bool:
    trailer = _sig_trailer_of(macro)
    if not trailer:
        return False
    curve_name, pubhex, sighex = trailer
    c = _ec.CURVES.get(curve_name)
    if c is None:
        return False
    pub = _ec.ECPublicKey(c, _ec.decode_point(c, bytes.fromhex(pubhex)))
    data = _macro_source(None, _strip_one_sig(macro))
    return _ec.verify(MSIG_ALG, pub, data, bytes.fromhex(sighex))


@register("MVERIFY")
def _mverify_fn(st):
    """macro MVERIFY → macro + boolean."""
    from warp10_platform_spark.warpscript.stack import Macro

    macro = st.pop()
    if not isinstance(macro, Macro):
        raise TypeError("MVERIFY operates on a macro.")
    ok = _mverify(macro)
    st.push(macro)
    st.push(ok)


@register("MCHECKSIG")
def _mchecksig(st):
    """macro MCHECKSIG → macro, raising when the signature is invalid
    (MVERIFY with verify=true)."""
    from warp10_platform_spark.warpscript.stack import Macro

    macro = st.pop()
    if not isinstance(macro, Macro):
        raise TypeError("MCHECKSIG operates on a macro.")
    if not _mverify(macro):
        raise RuntimeError("MCHECKSIG unable to verify macro.")
    st.push(macro)


@register("MSIGCOUNT")
def _msigcount(st):
    """macro MSIGCOUNT → macro + number of stacked signature trailers."""
    from warp10_platform_spark.warpscript.stack import Macro

    macro = st.pop()
    if not isinstance(macro, Macro):
        raise TypeError("MSIGCOUNT operates on a macro.")
    n = 0
    m = macro
    while _sig_trailer_of(m):
        n += 1
        m = _strip_one_sig(m)
    st.push(macro)
    st.push(n)


@register("MSIGINFO")
def _msiginfo(st):
    """macro MSIGINFO → macro + list of {curve, pubkey, sig, valid}
    maps, outermost signature first."""
    from warp10_platform_spark.warpscript.stack import Macro

    macro = st.pop()
    if not isinstance(macro, Macro):
        raise TypeError("MSIGINFO operates on a macro.")
    infos = []
    m = macro
    while True:
        trailer = _sig_trailer_of(m)
        if not trailer:
            break
        infos.append({
            "curve": trailer[0],
            "pubkey": trailer[1],
            "sig": trailer[2],
            "valid": _mverify(m),
        })
        m = _strip_one_sig(m)
    st.push(macro)
    st.push(infos)


@register("MDETACH")
def _mdetach(st):
    """macro MDETACH → macro without its outermost signature trailer +
    the detached trailer values."""
    from warp10_platform_spark.warpscript.stack import Macro

    macro = st.pop()
    if not isinstance(macro, Macro):
        raise TypeError("MDETACH operates on a macro.")
    trailer = _sig_trailer_of(macro)
    st.push(_strip_one_sig(macro))
    st.push(trailer or [])


# ---------- ARGON2 (functions/ARGON2.java, WarpScriptLib.java:2279) ----------

def _caps(st) -> dict:
    return getattr(st, "attributes", {}).get("capabilities", {}) or {}


def _argon2_gate(st, key: str, value: int, default_max: int, cap: str) -> None:
    """ARGON2.java:84-147 — params beyond the open default need the
    matching capability, and must not exceed its value."""
    if value <= default_max:
        return
    caps = _caps(st)
    if cap not in caps:
        raise PermissionError(f"ARGON2 missing capability '{cap}'.")
    if value > int(caps[cap]):
        raise ValueError(f"ARGON2 {key} exceeds capability value.")


@register("ARGON2")
def _argon2(st):
    """params-map ARGON2 → tag bytes (ARGON2.java:60-168): keys type
    (d/i/id, default id), iterations/memory/parallelism (BouncyCastle
    defaults 3/4096 KiB/1 when absent), salt/secret/additional (BYTES),
    size (default 32), password (STRING or BYTES, required). Limits
    beyond iter 3 / mem 32 KiB / par 1 / size 32 are gated by the
    argon2.maxiter/maxmem/maxpar/maxsize capabilities, as in the
    reference."""
    from warp10_platform_spark.functions.argon2 import argon2 as _a2

    m = st.pop()
    if not isinstance(m, dict):
        raise TypeError("ARGON2 expects a parameter map.")
    variant = str(m.get("type", "id")).lower()
    if variant not in ("d", "i", "id"):
        variant = "id"
    t = int(m.get("iterations", 3))
    mem = int(m.get("memory", 4096))
    par = int(m.get("parallelism", 1))
    size = int(m.get("size", 32))
    _argon2_gate(st, "iterations", t, 3, "argon2.maxiter")
    _argon2_gate(st, "memory", mem, 32, "argon2.maxmem")
    _argon2_gate(st, "parallelism", par, 1, "argon2.maxpar")
    _argon2_gate(st, "size", size, 32, "argon2.maxsize")
    pw = m.get("password")
    if isinstance(pw, str):
        pw = pw.encode()
    if not isinstance(pw, (bytes, bytearray)):
        raise TypeError("ARGON2 missing password as either STRING or BYTES.")
    salt = m.get("salt", b"")
    secret = m.get("secret", b"")
    ad = m.get("additional", b"")
    st.push(
        _a2(
            bytes(pw),
            bytes(salt),
            time_cost=t,
            memory_kib=mem,
            lanes=par,
            tag_len=size,
            variant=variant,
            secret=bytes(secret),
            ad=bytes(ad),
        )
    )
