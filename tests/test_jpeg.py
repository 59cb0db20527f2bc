"""Baseline JPEG codec (multimodal/jpeg.py): marker parse, Annex-K
tables, Huffman entropy coding, DCT/IDCT, chroma handling."""

import numpy as np
import pytest

from warp10_platform_spark.multimodal.jpeg import (
    QUANT_LUMA,
    decode_jpeg,
    encode_jpeg_gray,
)


def _blocky(rng, nb=4):
    vals = (rng.randint(0, 16, size=(nb, nb)) * 16).astype(np.uint8)
    return np.repeat(np.repeat(vals, 8, 0), 8, 1)


def test_block_constant_exact_roundtrip():
    rng = np.random.RandomState(7)
    img = _blocky(rng)
    back = decode_jpeg(encode_jpeg_gray(img))
    assert back.dtype == np.uint8 and back.shape == img.shape
    assert (back == img).all()  # DC-grid levels round-trip exactly


def test_marker_structure():
    img = _blocky(np.random.RandomState(0))
    data = encode_jpeg_gray(img)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF" in data[:30]
    assert b"\xff\xdb" in data and b"\xff\xc0" in data and b"\xff\xc4" in data


def test_smooth_image_low_error():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.round(np.add.outer(x, x) / 2), 0, 255).astype(np.uint8)
    back = decode_jpeg(encode_jpeg_gray(img))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 4


def test_noise_image_reasonable_error():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(32, 40)).astype(np.uint8)
    back = decode_jpeg(encode_jpeg_gray(img))
    # heavy quantization on noise, but bounded
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 40


def test_deterministic_bytes():
    img = _blocky(np.random.RandomState(11))
    assert encode_jpeg_gray(img) == encode_jpeg_gray(img)


def test_rejects_lossless_and_bad_input():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01")
    img = _blocky(np.random.RandomState(1))
    data = bytearray(encode_jpeg_gray(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC3  # flip SOF0 → SOF3 (lossless)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_progressive_reconstructs_identically_to_baseline():
    """SOF2 with spectral selection + successive approximation must land
    on the same quantized coefficients as SOF0, hence identical pixels."""
    from warp10_platform_spark.multimodal.jpeg import encode_jpeg_gray_progressive

    rng = np.random.default_rng(3)
    for h, w in ((8, 8), (16, 40), (48, 24)):
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg_gray(img))
        prog_bytes = encode_jpeg_gray_progressive(img)
        assert b"\xff\xc2" in prog_bytes and prog_bytes.count(b"\xff\xda") == 6
        assert (decode_jpeg(prog_bytes) == base).all()
    # flat image: the AC scans are pure EOB runs spanning every block
    flat = np.full((32, 48), 160, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg_gray_progressive(flat)) == flat).all()
    # smooth gradient: long zero runs exercise ZRL in first + refine scans
    g = np.clip(np.add.outer(np.arange(64) * 2, np.arange(96)), 0, 255).astype(np.uint8)
    assert (decode_jpeg(encode_jpeg_gray_progressive(g)) ==
            decode_jpeg(encode_jpeg_gray(g))).all()


def test_progressive_equals_baseline_property():
    """Property: for ANY 8-bit image, the 6-scan progressive encoding
    decodes to exactly the pixels of the baseline encoding (both modes
    reconstruct the same quantized coefficient array)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from warp10_platform_spark.multimodal.jpeg import encode_jpeg_gray_progressive

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 4), st.integers(1, 4),
        st.integers(0, 2**32 - 1),
        st.sampled_from(["noise", "flat", "gradient", "blocky"]),
    )
    def prop(bh, bw, seed, kind):
        rng = np.random.default_rng(seed)
        h, w = bh * 8, bw * 8
        if kind == "noise":
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        elif kind == "flat":
            img = np.full((h, w), int(rng.integers(0, 256)), dtype=np.uint8)
        elif kind == "gradient":
            img = ((np.add.outer(np.arange(h), np.arange(w)) * 255) // max(h + w - 2, 1)).astype(np.uint8)
        else:
            img = (rng.integers(0, 16, (bh, bw), dtype=np.uint8) * 17).repeat(8, 0).repeat(8, 1)
        assert (decode_jpeg(encode_jpeg_gray_progressive(img))
                == decode_jpeg(encode_jpeg_gray(img))).all()

    prop()


def test_color_progressive_equals_color_baseline():
    """Interleaved progressive DC scans (the spec's only interleaved
    progressive form) + per-component AC scans reconstruct exactly the
    baseline color pixels."""
    from warp10_platform_spark.multimodal.jpeg import (
        encode_jpeg_color, encode_jpeg_color_progressive)

    rng = np.random.default_rng(13)
    for shape in ((16, 16, 3), (24, 31, 3)):
        rgb = rng.integers(0, 256, shape, dtype=np.uint8)
        prog_bytes = encode_jpeg_color_progressive(rgb)
        assert b"\xff\xc2" in prog_bytes and prog_bytes.count(b"\xff\xda") == 8
        assert (decode_jpeg(prog_bytes) == decode_jpeg(encode_jpeg_color(rgb))).all()


def test_progressive_restart_intervals_roundtrip():
    """RSTn inside progressive scans: DC predictor AND EOB-run reset at
    each marker across all six scans — decodes identically to baseline."""
    from warp10_platform_spark.multimodal.jpeg import encode_jpeg_gray_progressive

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_gray(img))
    for ri in (1, 3):
        data = encode_jpeg_gray_progressive(img, restart_interval=ri)
        assert b"\xff\xdd" in data and b"\xff\xd0" in data
        assert (decode_jpeg(data) == base).all()


def test_color_420_subsampled_roundtrip():
    """4:2:0 (luma 2x2, chroma box-downsampled): the decoder's
    subsampled interleaved MCU walk + chroma upsampling, previously
    claimed but only reachable via external streams."""
    from warp10_platform_spark.multimodal.jpeg import encode_jpeg_color_420

    smooth = np.zeros((24, 40, 3), dtype=np.uint8)
    smooth[..., :] = (96, 160, 64)
    data = encode_jpeg_color_420(smooth)
    assert b"\x22" in data[: data.index(b"\xff\xc4")]  # SOF carries 2x2 luma
    dec = decode_jpeg(data)
    assert dec.shape == (24, 40, 3)  # non-multiple-of-16: padded + cropped
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 3

    g = np.zeros((32, 32, 3), dtype=np.uint8)
    g[..., 0] = np.arange(32)[:, None] * 8
    g[..., 1] = np.arange(32)[None, :] * 8
    g[..., 2] = 128
    d2 = decode_jpeg(encode_jpeg_color_420(g))
    assert float(np.abs(d2.astype(int) - g.astype(int)).mean()) < 6.0


def test_restart_intervals_roundtrip():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg_gray(img))
    for ri in (1, 2, 7):
        data = encode_jpeg_gray(img, restart_interval=ri)
        assert b"\xff\xdd" in data and b"\xff\xd0" in data
        assert (decode_jpeg(data) == base).all()


def test_color_encoder_roundtrip():
    from warp10_platform_spark.multimodal.jpeg import encode_jpeg_color

    smooth = np.zeros((20, 30, 3), dtype=np.uint8)
    smooth[..., :] = (96, 160, 64)
    dec = decode_jpeg(encode_jpeg_color(smooth))
    assert dec.shape == (20, 30, 3)  # odd dims: padded to blocks, cropped back
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 3
    rng = np.random.default_rng(5)
    noisy = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_color(noisy))
    assert out.shape == noisy.shape


def test_odd_dimensions_rejected_on_encode():
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((10, 16), dtype=np.uint8))


def test_dc_quant_step_is_16():
    # the exactness construction depends on this table value
    assert QUANT_LUMA[0, 0] == 16


def test_media_decode_dispatch():
    from warp10_platform_spark.multimodal.media import decode_gray_raw

    img = _blocky(np.random.RandomState(5))
    out = decode_gray_raw(encode_jpeg_gray(img))
    assert (out == img).all()


def test_pdecode_jpeg_script():
    import base64

    from warp10_platform_spark.warpscript.stack import WarpScriptStack

    img = _blocky(np.random.RandomState(9))
    url = "data:image/jpeg;base64," + base64.b64encode(encode_jpeg_gray(img)).decode()
    st = WarpScriptStack(None, None)
    st.exec(f"'{url}' Pdecode Psize")
    assert st.pop() == 32 and st.pop() == 32
