"""Argon2 (RFC 9106) cross-validation against OpenSSL's ARGON2 KDFs —
the same external-validation bar the WHIRLPOOL digest met: every
parameter combination is checked bit-for-bit against an independent
implementation."""

import shutil
import subprocess

import pytest

from warp10_platform_spark.functions.argon2 import argon2

_OPENSSL = shutil.which("openssl")


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


@pytest.mark.skipif(_OPENSSL is None, reason="openssl not available")
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


@pytest.mark.skipif(_OPENSSL is None, reason="openssl not available")
def test_argon2_secret_and_ad_match_openssl():
    pw, salt = b"pw", b"somesaltsomesalt"
    ours = argon2(pw, salt, time_cost=1, memory_kib=64, lanes=2, tag_len=16,
                  variant="d", secret=bytes.fromhex("aabbcc"),
                  ad=bytes.fromhex("deadbeef"))
    assert ours == _openssl_argon2("d", pw, salt, 1, 64, 2, 16,
                                   secret=bytes.fromhex("aabbcc"),
                                   ad=bytes.fromhex("deadbeef"))


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


@pytest.mark.skipif(_OPENSSL is None, reason="openssl not available")
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
