"""Digest + AES + secure-script tier tests.

Validation strategy (no external crypto libs available):
- MD2/MD4: RFC 1319/1320 appendix test vectors.
- RIPEMD-160: cross-validated bit-for-bit against OpenSSL (hashlib
  'ripemd160') across block-boundary sizes — this exercises every entry
  of the four 80-long message-order/shift tables shared by ALL RIPEMD
  variants, so 128/256/320 only additionally need their published
  empty/'abc' vectors.
- Keccak: the sponge run with SHA-3 padding must equal hashlib.sha3_*
  (same permutation); KECCAK.* then only differs in the pad byte, pinned
  by the well-known Keccak-256/512 empty-string vectors.
- AES: FIPS-197 appendix-C known-answer vectors for all three key sizes;
  RFC 3394 §4.1 key-wrap vector; envelope round-trip properties.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from warp10_platform_spark.functions import aes
from warp10_platform_spark.functions import digests as dg
from warp10_platform_spark.warpscript import functions_secure as fs
from warp10_platform_spark.warpscript.functions import REGISTRY


class _Stack:
    """Minimal stack double for scalar stack-function tests."""

    def __init__(self):
        self.stack = []
        self.attributes = {}
        self.executed = None

    def push(self, v):
        self.stack.append(v)

    def pop(self):
        return self.stack.pop()

    def exec(self, s):
        self.executed = s


# ---------------------------------------------------------------------------
# digests
# ---------------------------------------------------------------------------

MD2_VECTORS = {
    b"": "8350e5a3e24c153df2275c9f80692773",
    b"a": "32ec01ec4a6dac72c0ab96fb34c0b5d1",
    b"abc": "da853b0d3f88d99b30283a69e6ded6bb",
    b"message digest": "ab4f496bfb2a530b219ff33031fe06b0",
}

MD4_VECTORS = {
    b"": "31d6cfe0d16ae931b73c59d7e0c089c0",
    b"a": "bde52cb31de33e46245e05fbdbd6fb24",
    b"abc": "a448017aaf21d8525fc10ae87aa6729d",
    b"message digest": "d9130a8164549fe818874806e1c7014b",
}


def test_md2_rfc_vectors():
    for msg, want in MD2_VECTORS.items():
        assert dg.md2(msg).hex() == want


def test_md4_rfc_vectors():
    for msg, want in MD4_VECTORS.items():
        assert dg.md4(msg).hex() == want


def test_ripemd160_matches_openssl():
    for n in (0, 1, 3, 55, 56, 57, 63, 64, 65, 127, 128, 129, 1000):
        data = os.urandom(n)
        assert dg.ripemd160_pure(data) == hashlib.new("ripemd160", data).digest()


def test_ripemd_variant_vectors():
    assert dg.ripemd128(b"").hex() == "cdf26213a150dc3ecb610f18f6b38b46"
    assert dg.ripemd128(b"abc").hex() == "c14a12199c66e4ba84636b0f69144c77"
    assert dg.ripemd256(b"").hex() == (
        "02ba4c4e5f8ecd1877fc52d64d30e37a2d9774fb1e5d026380ae0168e3c5522d"
    )
    assert dg.ripemd320(b"").hex() == (
        "22d65d5661536cdc75c1fdf5c6de7b41b9f27325ebc61e8557177d705a0ec880"
        "151c3a32a00899b8"
    )


def test_keccak_sponge_matches_hashlib_sha3():
    for n in (0, 1, 135, 136, 137, 500):
        data = os.urandom(n)
        for bits, ref in (
            (224, hashlib.sha3_224),
            (256, hashlib.sha3_256),
            (384, hashlib.sha3_384),
            (512, hashlib.sha3_512),
        ):
            assert dg.sha3(data, bits) == ref(data).digest()


def test_keccak_known_vectors():
    assert dg.keccak(b"", 256).hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert dg.keccak(b"", 512).hex() == (
        "0eab42de4c3ceb9235fc91acffe746b29c29a8c366b7c60e4e67c466f36a4304"
        "c00fa9caf9d87976ba469bcbe06713b435f091ef2769fb160cdab33d3670680e"
    )
    # every registered size produces bits/8 bytes and is deterministic
    for bits in (128, 224, 256, 288, 384, 512):
        d = dg.keccak(b"warp", bits)
        assert len(d) == bits // 8
        assert d == dg.keccak(b"warp", bits)


def test_digest_registry_bindings():
    st = _Stack()
    for name, fn in [
        ("MD2", dg.md2),
        ("MD4", dg.md4),
        ("RIPEMD128", dg.ripemd128),
        ("RIPEMD160", dg.ripemd160),
        ("RIPEMD256", dg.ripemd256),
        ("RIPEMD320", dg.ripemd320),
    ]:
        st.push(b"payload")
        REGISTRY[name](st)
        assert st.pop() == fn(b"payload")
    for bits in (128, 224, 256, 288, 384, 512):
        st.push(b"payload")
        REGISTRY["KECCAK.%d" % bits](st)
        assert st.pop() == dg.keccak(b"payload", bits)


# ---------------------------------------------------------------------------
# AES / RFC 3394
# ---------------------------------------------------------------------------

def test_aes_fips197_vectors():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = {
        16: "69c4e0d86a7b0430d8cdb78070b4c55a",
        24: "dda97ca4864cdfe06eaf70a0ec0d7191",
        32: "8ea2b7ca516745bfeafc49904b496089",
    }
    for klen, want in cases.items():
        key = bytes(range(klen))
        ct = aes.encrypt_block(key, pt)
        assert ct.hex() == want
        assert aes.decrypt_block(key, ct) == pt


def test_rfc3394_wrap_vector():
    kek = bytes.fromhex("000102030405060708090A0B0C0D0E0F")
    kd = bytes.fromhex("00112233445566778899AABBCCDDEEFF")
    wrapped = aes.kw_wrap(kek, kd)
    assert wrapped.hex().upper() == (
        "1FA68B0A8112B447AEF34BD8FB5A7B829D3E862371D2CFE5"
    )
    assert aes.kw_unwrap(kek, wrapped) == kd


def test_rfc3394_pure_path_vector_and_native_equality():
    """The r9 fast path dispatches kw_wrap/kw_unwrap to the OpenSSL-backed
    `cryptography` keywrap for >=2-block payloads (METASET envelopes are
    multi-MB at 10^5+ series); this pins (a) the PURE derived-tables
    implementation against the RFC 3394 4.1 vector regardless of
    dispatch, and (b) bit-equality of the two implementations across
    payload sizes and key widths, including the 1-block case only the
    pure path serves."""
    kek = bytes.fromhex("000102030405060708090A0B0C0D0E0F")
    kd = bytes.fromhex("00112233445566778899AABBCCDDEEFF")
    wrapped = aes._kw_wrap_pure(kek, kd)
    assert wrapped.hex().upper() == "1FA68B0A8112B447AEF34BD8FB5A7B829D3E862371D2CFE5"
    assert aes._kw_unwrap_pure(kek, wrapped) == kd
    import random
    rnd = random.Random(9)
    for klen in (16, 24, 32):
        key = bytes(rnd.randrange(256) for _ in range(klen))
        for size in (8, 16, 24, 256):
            data = bytes(rnd.randrange(256) for _ in range(size))
            w_pub = aes.kw_wrap(key, data)
            assert w_pub == aes._kw_wrap_pure(key, data)
            assert aes.kw_unwrap(key, w_pub) == data
            assert aes._kw_unwrap_pure(key, w_pub) == data


def test_rfc3394_integrity_check():
    kek = bytes(16)
    wrapped = bytearray(aes.kw_wrap(kek, bytes(16)))
    wrapped[0] ^= 1
    with pytest.raises(ValueError):
        aes.kw_unwrap(kek, bytes(wrapped))


def test_envelope_roundtrip_all_paddings():
    for klen in (16, 24, 32):
        key = bytes(range(klen))
        for n in range(0, 25):
            data = os.urandom(n)
            assert aes.unwrap(key, aes.wrap(key, data)) == data


# ---------------------------------------------------------------------------
# secure-script stack surface
# ---------------------------------------------------------------------------

def test_secure_unsecure_evalsecure_roundtrip():
    st = _Stack()
    st.push("s3cret")
    REGISTRY["SECUREKEY"](st)
    script = "1 2 + 3 *"
    st.push(script)
    REGISTRY["SECURE"](st)
    blob = st.stack[-1]
    assert script not in blob  # opaque
    REGISTRY["UNSECURE"](st)
    assert st.pop() == script
    st.push(blob)
    REGISTRY["EVALSECURE"](st)
    assert st.executed == script


def test_unsecure_rejects_wrong_key():
    st = _Stack()
    st.push("right")
    REGISTRY["SECUREKEY"](st)
    st.push("NOW")
    REGISTRY["SECURE"](st)
    blob = st.pop()
    st.push("wrong")
    REGISTRY["SECUREKEY"](st)
    st.push(blob)
    with pytest.raises(RuntimeError, match="Invalid secure key"):
        REGISTRY["UNSECURE"](st)


def test_secure_requires_key():
    st = _Stack()
    st.push("script")
    with pytest.raises(RuntimeError, match="secure key"):
        REGISTRY["SECURE"](st)


def test_secure_compresses_large_scripts():
    # a large compressible script must round-trip through the gzip branch
    st = _Stack()
    st.push("k")
    REGISTRY["SECUREKEY"](st)
    script = "NOW ISO8601 " * 500
    st.push(script)
    REGISTRY["SECURE"](st)
    blob = st.stack[-1]
    assert len(blob) < len(script)  # compression engaged
    REGISTRY["UNSECURE"](st)
    assert st.pop() == script


def test_secure_envelope_structure():
    # the envelope is thrift SecureScript + RFC3394 + OPB64; decode by hand
    blob = fs.secure(bytes(range(32)), "k", "NOW", timestamp_ms=1234)
    s = fs.unsecure(bytes(range(32)), blob)
    assert s == {"timestamp": 1234, "key": "k", "script": "NOW"}


def test_aeswrap_aesunwrap_stack_roundtrip():
    st = _Stack()
    key = bytes(range(24))
    st.push(b"some payload")
    st.push(key)
    REGISTRY["AESWRAP"](st)
    wrapped = st.pop()
    assert len(wrapped) % 8 == 0 and len(wrapped) >= 24
    st.push(wrapped)
    st.push(key)
    REGISTRY["AESUNWRAP"](st)
    assert st.pop() == b"some payload"


def test_aeswrap_accepts_string_rejects_bad_key():
    st = _Stack()
    st.push("text payload")
    st.push(bytes(range(16)))
    REGISTRY["AESWRAP"](st)
    wrapped = st.pop()
    st.push(wrapped)
    st.push(bytes(range(16)))
    REGISTRY["AESUNWRAP"](st)
    assert st.pop() == b"text payload"
    st.push(b"x")
    st.push(b"shortkey")
    with pytest.raises(TypeError):
        REGISTRY["AESWRAP"](st)


# ---------------------------------------------------------------------------
# encrypted GTS stream sections (GTSEncoder.java:785-824 / GTSDecoder:214)
# ---------------------------------------------------------------------------

def test_encrypted_gts_stream_roundtrip():
    from warp10_platform_spark.core.gtscodec import (
        decode_gts,
        encode_gts,
        encrypt_gts,
    )

    key = bytes(32)
    now = 1_700_000_000_000_000
    pts = [(now, 1), (now + 1_000_000, 2)]
    enc = encrypt_gts(encode_gts(pts, base=0), key)
    # GTSEncoderTest.testEncrypt: flag byte 0x00 and 26 total bytes for
    # this exact two-point long series
    assert enc[0] == 0x00
    assert len(enc) == 26
    assert [(t, v) for t, v, _ in decode_gts(enc, base=0, key=key)] == pts
    # no key → encrypted data silently skipped (the reference contract)
    assert decode_gts(enc, base=0) == []
    # wrong key → integrity failure surfaces
    with pytest.raises(ValueError):
        decode_gts(enc, base=0, key=bytes(range(32)))


def test_encrypted_and_plain_sections_mix():
    from warp10_platform_spark.core.gtscodec import (
        decode_gts,
        encode_gts,
        encrypt_gts,
    )

    key = bytes(range(16))
    now = 1_700_000_000_000_000
    enc = encrypt_gts(encode_gts([(now, 1.5), (now + 1, 2.5)], base=0), key)
    plain_tail = encode_gts([(now + 2, 3.5)], base=0)
    got = decode_gts(enc + plain_tail, base=0, key=key)
    assert [(t, v) for t, v, _ in got] == [(now, 1.5), (now + 1, 2.5), (now + 2, 3.5)]
    # without the key only the plain tail survives
    got2 = decode_gts(enc + plain_tail, base=0)
    assert [(t, v) for t, v, _ in got2] == [(now + 2, 3.5)]


# ---------------------------------------------------------------------------
# RSA tier (functions/rsa.py + RSA* stack bindings)
# ---------------------------------------------------------------------------

def test_rsa_digestinfo_prefixes_match_published_constants():
    # the DER encoder derives DigestInfo from the OIDs; the results must
    # equal the RFC 8017 §9.2 note-1 published prefixes
    from warp10_platform_spark.functions import rsa

    cases = {
        "SHA256WITHRSA": ("3031300d060960864801650304020105000420", 32),
        "SHA1WITHRSA": ("3021300906052b0e03021a05000414", 20),
        "MD5WITHRSA": ("3020300c06082a864886f70d020505000410", 16),
        "SHA384WITHRSA": ("3041300d060960864801650304020205000430", 48),
        "SHA512WITHRSA": ("3051300d060960864801650304020305000440", 64),
    }
    for alg, (prefix, dlen) in cases.items():
        di = rsa._digest_info(alg, b"abc")
        assert di[:-dlen].hex() == prefix, alg


def test_rsa_sign_is_rfc8017_deterministic():
    # RSASSA-PKCS1-v1_5 is deterministic: sig^e mod n must equal the
    # EMSA encoding exactly (the RFC definition, checked structurally)
    from warp10_platform_spark.functions import rsa

    priv, pub = rsa.generate(768)
    msg = b"payload"
    sig = rsa.sign("SHA256withRSA", priv, msg)
    assert sig == rsa.sign("SHA256withRSA", priv, msg)  # deterministic
    k = (pub.n.bit_length() + 7) // 8
    em = pow(int.from_bytes(sig, "big"), pub.e, pub.n).to_bytes(k, "big")
    assert em == rsa._emsa("SHA256WITHRSA", msg, k)
    assert em[:2] == b"\x00\x01" and b"\x00" in em[2:]


def test_rsa_stack_surface_end_to_end():
    from warp10_platform_spark.functions import rsa

    st = _Stack()
    st.push("65537")
    st.push(512)
    REGISTRY["RSAGEN"](st)
    pubmap = st.pop()
    privmap = st.pop()
    assert pubmap["algorithm"] == "RSA" and pubmap["exponent"] == "65537"
    assert int(privmap["modulus"]) == int(pubmap["modulus"])
    st.push(privmap)
    REGISTRY["RSAPRIVATE"](st)
    priv = st.pop()
    st.push(pubmap)
    REGISTRY["RSAPUBLIC"](st)
    pub = st.pop()
    assert isinstance(priv, rsa.RSAPrivateKey) and isinstance(pub, rsa.RSAPublicKey)
    # sign → verify; tampered data must fail
    st.push(b"data")
    st.push("SHA256withRSA")
    st.push(priv)
    REGISTRY["RSASIGN"](st)
    sig = st.pop()
    st.push(b"data")
    st.push(sig)
    st.push("SHA256withRSA")
    st.push(pub)
    REGISTRY["RSAVERIFY"](st)
    assert st.pop() is True
    st.push(b"tampered")
    st.push(sig)
    st.push("SHA256withRSA")
    st.push(pub)
    REGISTRY["RSAVERIFY"](st)
    assert st.pop() is False
    # encrypt with public, decrypt with private (nonce stripped)
    st.push(b"secret bytes")
    st.push(pub)
    REGISTRY["RSAENCRYPT"](st)
    ct = st.pop()
    assert ct != b"secret bytes"
    st.push(ct)
    st.push(priv)
    REGISTRY["RSADECRYPT"](st)
    assert st.pop() == b"secret bytes"


def test_rsa_long_payload_chunks():
    from warp10_platform_spark.functions import rsa

    priv, pub = rsa.generate(512)
    data = os.urandom(300)  # forces multiple PKCS1 blocks at 512 bits
    assert rsa.decrypt(priv, rsa.encrypt(pub, data)) == data
    assert rsa.decrypt(pub, rsa.encrypt(priv, data)) == data


# ---------------------------------------------------------------------------
# EC tier (functions/ec.py + EC* stack bindings)
# ---------------------------------------------------------------------------

def test_ecdsa_rfc6979_a25_vector():
    # RFC 6979 A.2.5 (P-256, SHA-256, message "sample") — end-to-end
    # external validation of curve constants, point mul, nonce, ECDSA
    from warp10_platform_spark.functions import ec

    c = ec.CURVES["secp256r1"]
    d = 0xC9AFA9D845BA75166B5C215767B1D6934E50C3DB36E89B127B8A622B120F6721
    priv = ec.ECPrivateKey(c, d)
    h1 = hashlib.sha256(b"sample").digest()
    k = ec._rfc6979_k(c, d, h1, "sha256")
    assert format(k, "x").upper() == (
        "A6E3C57DD01ABE90086538398355DD4C3B17AA873382B0F24D6129493D8AAD60"
    )
    r, s = ec._parse_der_sig(ec.sign("SHA256withECDSA", priv, b"sample"))
    assert format(r, "x").upper() == (
        "EFD48B2AACB6A8FD1140DD9CD45E81D69D2C877B56AAF991C34D0EA84EAF3716"
    )
    assert format(s, "x").upper() == (
        "F7CB1C942D657C41D436C7A1B6E29F65F3E900DBB9AFF4064DC4AB2F843ACDA8"
    )
    pub = ec.public_from_private(priv)
    assert format(pub.q[0], "x").upper() == (
        "60FED4BA255A9D31C961EB74C6356D68C049B8923B61FA6CE669622E60F29FB6"
    )


def test_ec_stack_surface_end_to_end():
    from warp10_platform_spark.functions import ec

    st = _Stack()
    st.push("secp256k1")
    REGISTRY["ECGEN"](st)
    pubmap = st.pop()
    privmap = st.pop()
    assert sorted(privmap) == ["curve", "d"] and sorted(pubmap) == ["curve", "q"]
    st.push(privmap)
    REGISTRY["ECPRIVATE"](st)
    priv = st.pop()
    st.push(pubmap)
    REGISTRY["ECPUBLIC"](st)
    pub = st.pop()
    # the ECGEN double-apply idiom: priv obj → pub obj → map
    st.push(priv)
    REGISTRY["ECPUBLIC"](st)
    REGISTRY["ECPUBLIC"](st)
    assert st.pop() == pubmap
    # sign / verify / tamper
    st.push(b"data")
    st.push("SHA256withECDSA")
    st.push(priv)
    REGISTRY["ECSIGN"](st)
    sig = st.pop()
    st.push(b"data")
    st.push(sig)
    st.push("SHA256withECDSA")
    st.push(pub)
    REGISTRY["ECVERIFY"](st)
    assert st.pop() is True
    st.push(b"tampered")
    st.push(sig)
    st.push("SHA256withECDSA")
    st.push(pub)
    REGISTRY["ECVERIFY"](st)
    assert st.pop() is False
    # ECDH symmetry
    st.push("secp256k1")
    REGISTRY["ECGEN"](st)
    pubmap2 = st.pop()
    privmap2 = st.pop()
    st.push(privmap2)
    REGISTRY["ECPRIVATE"](st)
    priv2 = st.pop()
    st.push(pubmap2)
    REGISTRY["ECPUBLIC"](st)
    pub2 = st.pop()
    st.push(pub2)
    st.push(priv)
    REGISTRY["ECDH"](st)
    s1 = st.pop()
    st.push(pub)
    st.push(priv2)
    REGISTRY["ECDH"](st)
    assert st.pop() == s1
    # ECRECOVER finds the signing key among candidates
    st.push({"curve": "secp256k1", "hash": hashlib.sha256(b"data").digest(), "sig": sig})
    REGISTRY["ECRECOVER"](st)
    cands = st.pop()
    enc = ec.encode_point(ec.CURVES["secp256k1"], pub.q).decode("latin-1")
    assert enc in cands and len(cands) <= 4


def test_ec_compressed_point_roundtrip():
    from warp10_platform_spark.functions import ec

    for name in ("secp256k1", "secp256r1"):
        c = ec.CURVES[name]
        priv, pub = ec.generate(name)
        comp = ec.encode_point(c, pub.q, compressed=True)
        assert len(comp) == 33
        assert ec.decode_point(c, comp) == pub.q


# ---------------------------------------------------------------------------
# macro signing (MSIGN/MSIG/MVERIFY/MCHECKSIG/MSIGCOUNT/MSIGINFO/MDETACH)
# ---------------------------------------------------------------------------

def _ec_priv(st):
    st.push("secp256k1")
    REGISTRY["ECGEN"](st)
    st.pop()
    privmap = st.pop()
    st.push(privmap)
    REGISTRY["ECPRIVATE"](st)
    return st.pop()


def _macro(src):
    from warp10_platform_spark.warpscript.stack import Macro
    from warp10_platform_spark.warpscript.tokenizer import tokenize

    return Macro(tokenize(src))


def test_macro_sign_verify_countersign_detach():
    from warp10_platform_spark.warpscript.stack import Macro

    st = _Stack()
    priv = _ec_priv(st)
    m = _macro("1 2 + 3 *")
    st.push(m)
    st.push(priv)
    REGISTRY["MSIGN"](st)
    signed = st.pop()
    assert len(signed.tokens) == len(m.tokens) + 4
    st.push(signed)
    REGISTRY["MVERIFY"](st)
    assert st.pop() is True
    st.pop()
    # countersign: both signatures valid, count = 2
    st.push(signed)
    st.push(priv)
    REGISTRY["MSIGN"](st)
    twice = st.pop()
    st.push(twice)
    REGISTRY["MSIGCOUNT"](st)
    assert st.pop() == 2
    st.pop()
    st.push(twice)
    REGISTRY["MSIGINFO"](st)
    infos = st.pop()
    st.pop()
    assert [i["valid"] for i in infos] == [True, True]
    # tampered body fails MVERIFY, MCHECKSIG raises
    bad = Macro(_macro("1 2 + 4 *").tokens + signed.tokens[-4:])
    st.push(bad)
    REGISTRY["MVERIFY"](st)
    assert st.pop() is False
    st.pop()
    st.push(bad)
    with pytest.raises(RuntimeError, match="unable to verify"):
        REGISTRY["MCHECKSIG"](st)
    # MDETACH strips one trailer and returns it
    st = _Stack()
    st.push(twice)
    REGISTRY["MDETACH"](st)
    trailer = st.pop()
    stripped = st.pop()
    assert len(trailer) == 3
    assert len(stripped.tokens) == len(signed.tokens)


def test_signed_macro_executes_identically(spark):
    # the MSIG trailer must be execution-transparent: a signed macro
    # computes the same value as the unsigned one
    from warp10_platform_spark.warpscript.stack import WarpScriptStack

    helper = _Stack()
    priv = _ec_priv(helper)
    st = WarpScriptStack(spark, "/root/testdata/sf0.001")
    st.exec("<% 1 2 + 3 * %>")
    macro = st.pop()
    st.push(macro)
    st.push(priv)
    REGISTRY["MSIGN"](st)
    signed = st.pop()
    st.exec_macro(macro)
    plain_result = st.pop()
    st.exec_macro(signed)
    assert st.pop() == plain_result == 9


def test_whirlpool_matches_openssl():
    # the S-box is derived from the spec's mini-boxes; cross-validate the
    # whole hash bit-exact against OpenSSL's legacy provider
    import shutil
    import subprocess

    assert dg.whirlpool(b"").hex() == (
        "19fa61d75522a4669b44e39c1d2e1726c530232130d407f89afee0964997f7a7"
        "3e83be698b288febcf88e3e03c4f0757ea8964e59b63d93708b138cc42a66eb3"
    )
    if shutil.which("openssl"):
        for n in (1, 31, 32, 33, 64, 200):
            data = os.urandom(n)
            r = subprocess.run(
                ["openssl", "dgst", "-whirlpool", "-provider", "legacy"],
                input=data, capture_output=True,
            )
            if r.returncode == 0 and b"= " in r.stdout:
                want = r.stdout.decode().strip().split("= ")[1]
                assert dg.whirlpool(data).hex() == want
    st = _Stack()
    st.push(b"payload")
    REGISTRY["WHIRLPOOL"](st)
    assert st.pop() == dg.whirlpool(b"payload")
