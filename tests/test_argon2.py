"""Argon2 (RFC 9106) cross-validation against OpenSSL's ARGON2 KDFs —
the same external-validation bar the WHIRLPOOL digest met: every
parameter combination is checked bit-for-bit against an independent
implementation."""

import shutil
import subprocess

import pytest

from warp10_platform_spark.functions.argon2 import argon2

_OPENSSL = shutil.which("openssl")


def _openssl_has_argon2() -> bool:
    """The ARGON2 KDFs landed in OpenSSL 3.2; probe instead of assuming
    so the suite stays green on older system OpenSSL builds (the RFC
    9106 vector test below keeps correctness covered either way)."""
    if _OPENSSL is None:
        return False
    probe = subprocess.run(
        [_OPENSSL, "kdf", "-keylen", "16",
         "-kdfopt", "hexpass:70617373776f7264",
         "-kdfopt", "hexsalt:736f6d6573616c74736f6d6573616c74",
         "-kdfopt", "iter:1", "-kdfopt", "memcost:32", "-kdfopt", "lanes:1",
         "ARGON2ID"],
        capture_output=True,
    )
    return probe.returncode == 0


_HAS_ARGON2 = _openssl_has_argon2()
_needs_openssl_argon2 = pytest.mark.skipif(
    not _HAS_ARGON2, reason="openssl lacks ARGON2 KDF (needs >= 3.2)"
)


def _openssl_argon2(variant, password, salt, t, m, p, keylen, secret=b"", ad=b""):
    args = [
        _OPENSSL, "kdf", "-keylen", str(keylen),
        "-kdfopt", "hexpass:" + password.hex(),
        "-kdfopt", "hexsalt:" + salt.hex(),
        "-kdfopt", f"iter:{t}",
        "-kdfopt", f"memcost:{m}",
        "-kdfopt", f"lanes:{p}",
    ]
    if secret:
        args += ["-kdfopt", "hexsecret:" + secret.hex()]
    if ad:
        args += ["-kdfopt", "hexad:" + ad.hex()]
    args.append("ARGON2" + variant.upper())
    out = subprocess.run(args, capture_output=True, text=True, check=True).stdout.strip()
    return bytes.fromhex(out.replace(":", ""))


@_needs_openssl_argon2
@pytest.mark.parametrize("variant", ["d", "i", "id"])
@pytest.mark.parametrize("t,m,p,keylen", [
    (3, 32, 1, 32),    # the reference ARGON2.java defaults
    (1, 32, 1, 16),
    (3, 64, 4, 32),    # multi-lane
    (2, 96, 2, 64),    # tag > 64 exercises the long H' path
])
def test_argon2_matches_openssl(variant, t, m, p, keylen):
    pw, salt = b"password", b"somesaltsomesalt"
    ours = argon2(pw, salt, time_cost=t, memory_kib=m, lanes=p,
                  tag_len=keylen, variant=variant)
    assert ours == _openssl_argon2(variant, pw, salt, t, m, p, keylen)


@_needs_openssl_argon2
def test_argon2_secret_and_ad_match_openssl():
    pw, salt = b"pw", b"somesaltsomesalt"
    ours = argon2(pw, salt, time_cost=1, memory_kib=64, lanes=2, tag_len=16,
                  variant="d", secret=bytes.fromhex("aabbcc"),
                  ad=bytes.fromhex("deadbeef"))
    assert ours == _openssl_argon2("d", pw, salt, 1, 64, 2, 16,
                                   secret=bytes.fromhex("aabbcc"),
                                   ad=bytes.fromhex("deadbeef"))


# RFC 9106 §5.1-5.3 test vectors (t=3, m=32 KiB, p=4, 32-byte password of
# 0x01, 16-byte salt of 0x02, 8-byte secret of 0x03, 12-byte ad of 0x04).
# These are published vectors, so correctness stays externally anchored
# even when the system OpenSSL predates the ARGON2 KDF.
_RFC9106 = {
    "d": "512b391b6f1162975371d30919734294"
         "f868e3be3984f3c1a13a4db9fabe4acb",
    "i": "c814d9d1dc7f37aa13f0d77f2494bda1"
         "c8de6b016dd388d29952a4c4672b6ce8",
    "id": "0d640df58d78766c08c037a34a8b53c9"
          "d01ef0452d75b65eb52520e96b01e659",
}


@pytest.mark.parametrize("variant", ["d", "i", "id"])
def test_argon2_rfc9106_vectors(variant):
    tag = argon2(
        b"\x01" * 32, b"\x02" * 16, time_cost=3, memory_kib=32, lanes=4,
        tag_len=32, variant=variant, secret=b"\x03" * 8, ad=b"\x04" * 12,
    )
    assert tag.hex() == _RFC9106[variant]


def test_argon2_parameter_validation():
    with pytest.raises(ValueError):
        argon2(b"x", b"saltsalt", variant="x")
    with pytest.raises(ValueError):
        argon2(b"x", b"saltsalt", memory_kib=4, lanes=1)


def test_argon2_stack_function_and_gates():
    """ARGON2 via the script registry: params-map contract, OpenSSL-
    validated output, and the reference's capability gates
    (ARGON2.java:84-147)."""
    from warp10_platform_spark.warpscript.stack import WarpScriptStack

    st = WarpScriptStack(None, "/root/testdata/sf0.001")
    st.exec(
        "{ 'type' 'id' 'iterations' 3 'memory' 32 'parallelism' 1 'size' 32 "
        "'password' 'password' 'salt' 'somesaltsomesalt' ->BYTES } ARGON2 ->HEX"
    )
    assert st.stack[-1] == (
        "825a45eb17d866fa3e66ba5a7f6d66e319212bee3f21086a036a039669929453"
    )

    st2 = WarpScriptStack(None, "/root/testdata/sf0.001")
    with pytest.raises(PermissionError):
        st2.exec("{ 'iterations' 10 'memory' 32 'password' 'x' } ARGON2")

    # with the capability, the same call is allowed
    st3 = WarpScriptStack(None, "/root/testdata/sf0.001")
    st3.attributes = {"capabilities": {"argon2.maxiter": "16"}}
    st3.exec("{ 'iterations' 4 'memory' 32 'password' 'x' 'size' 16 } ARGON2 SIZE")
    assert st3.stack[-1] == 16


@_needs_openssl_argon2
def test_argon2_randomized_differential_vs_openssl():
    """Randomized differential testing: arbitrary passwords/salts/params
    (within fast bounds) must match OpenSSL bit-for-bit."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        pw=st.binary(min_size=0, max_size=40),
        salt=st.binary(min_size=8, max_size=24),
        variant=st.sampled_from(["d", "i", "id"]),
        t=st.integers(1, 3),
        m_mult=st.integers(2, 8),
        p=st.integers(1, 3),
        keylen=st.integers(4, 48),
    )
    def check(pw, salt, variant, t, m_mult, p, keylen):
        m = 8 * p * m_mult  # keep memory small and valid (>= 8*lanes)
        ours = argon2(pw, salt, time_cost=t, memory_kib=m, lanes=p,
                      tag_len=keylen, variant=variant)
        assert ours == _openssl_argon2(variant, pw, salt, t, m, p, keylen)

    check()
