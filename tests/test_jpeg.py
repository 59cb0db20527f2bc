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


def test_rejects_progressive_and_bad_input():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01")
    img = _blocky(np.random.RandomState(1))
    data = bytearray(encode_jpeg_gray(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


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
