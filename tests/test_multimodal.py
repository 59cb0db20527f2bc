"""Multimodal plumbing tests: raw-format decode, resize, stub behavior."""

import struct

import numpy as np
import pytest

from warp10_platform_spark.multimodal.media import (
    MAGIC,
    decode_gray_raw,
    resize_nearest,
    _dhash,
)


def _img(w, h, pixels):
    return MAGIC + struct.pack(">HH", w, h) + bytes(pixels)


def test_decode_roundtrip():
    img = decode_gray_raw(_img(4, 2, range(8)))
    assert img.shape == (2, 4)
    assert img[1, 3] == 7


def test_decode_unknown_format_stubbed():
    # JPEG magic — no codec in this container → explicit NotImplementedError
    with pytest.raises(NotImplementedError):
        decode_gray_raw(b"\xff\xd8\xff\xe0" + b"\x00" * 32)


def test_resize_nearest():
    img = decode_gray_raw(_img(4, 4, range(16)))
    small = resize_nearest(img, 2, 2)
    assert small.shape == (2, 2)
    assert small[0, 0] == img[0, 0]


def test_dhash_bits():
    # strictly increasing row → every comparison true → all 12 bits set
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert _dhash(img) == (1 << 12) - 1
    assert _dhash(img[::, ::-1]) == 0  # decreasing → no bits
