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
    # unknown magic — no codec for it → explicit NotImplementedError
    with pytest.raises(NotImplementedError):
        decode_gray_raw(b"BM" + b"\x00" * 32)  # BMP: intentionally unhandled
    # JPEG now decodes through the own baseline codec; a truncated
    # stream is a loud error, not a stub
    with pytest.raises(ValueError):
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


def test_png_roundtrip_and_filters():
    """Decoder handles every scanline filter, not just the writer's
    filter-0: hand-build filtered streams and compare to the reference
    unfiltered image."""
    import struct
    import zlib

    import numpy as np

    from warp10_platform_spark.multimodal.media import (
        _PNG_SIG, decode_gray_raw, decode_png, encode_png_gray,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png_gray(img)), img)

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

    def png_with_filters(img, filts):
        h, w = img.shape
        rows = []
        prev = np.zeros(w, np.int64)
        for r, filt in zip(range(h), filts):
            line = img[r].astype(np.int64)
            if filt == 0:
                enc = line
            elif filt == 1:  # Sub
                enc = line - np.concatenate([[0], line[:-1]])
            elif filt == 2:  # Up
                enc = line - prev
            elif filt == 3:  # Average
                left = np.concatenate([[0], line[:-1]])
                enc = line - ((left + prev) >> 1)
            else:  # Paeth: left predictor == Sub when prev row unused? use full paeth
                left = np.concatenate([[0], line[:-1]])
                ul = np.concatenate([[0], prev[:-1]])
                p = left + prev - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
                pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
                enc = line - pred
            rows.append(b"\x00"[:0] + bytes([filt]) + bytes((enc & 0xFF).astype(np.uint8).tolist()))
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(b"".join(rows))) + chunk(b"IEND", b"")

    filts = [0, 1, 2, 3, 4, 2, 4, 1, 3]
    assert np.array_equal(decode_png(png_with_filters(img, filts)), img)

    # RGB -> integer luma through decode_gray_raw
    rgb = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    h, w, _ = rgb.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[r].tobytes() for r in range(h))
    png_rgb = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    got = decode_gray_raw(png_rgb)
    want = ((299 * rgb[:, :, 0].astype(np.int64) + 587 * rgb[:, :, 1].astype(np.int64) + 114 * rgb[:, :, 2].astype(np.int64)) // 1000).astype(np.uint8)
    assert np.array_equal(got, want)


# --- real RIFF/WAVE codec (round 4) ---

def test_wav_roundtrip_and_container_parse():
    import numpy as np

    from warp10_platform_spark.multimodal.media import decode_wav, encode_wav_pcm16

    s = np.array([0, 300, -300, 32767, -32768, 7, -1], dtype=np.int64)
    blob = encode_wav_pcm16(s, 44100)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    sig, rate, ch = decode_wav(blob)
    assert rate == 44100 and ch == 1 and (sig == s).all()


def test_wav_8bit_and_stereo():
    import struct

    import numpy as np

    from warp10_platform_spark.multimodal.media import decode_wav

    # hand-built 8-bit stereo container
    data = bytes([128, 130, 126, 128, 255, 0])  # 3 frames x 2 ch
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 16000, 2, 8)
           + b"data" + struct.pack("<I", len(data)))
    sig, rate, ch = decode_wav(hdr + data)
    assert ch == 2 and rate == 8000
    assert (sig == np.array([1, -1, 0])).all()  # mean of (0,2),(-2,0),(127,-128): -0.5 truncates to 0


def test_wav_unsupported_format_is_explicit():
    import struct

    import pytest

    from warp10_platform_spark.multimodal.media import decode_wav

    hdr = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 0x11, 1, 8000, 4000, 1, 4)  # IMA ADPCM
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(NotImplementedError):
        decode_wav(hdr)
    with pytest.raises(ValueError):
        decode_wav(b"nonsense bytes")


def _wav(tag, bits, rate, channels, payload, subformat=None):
    import struct

    if subformat is None:
        fmt = struct.pack("<IHHIIHH", 16, tag, channels, rate,
                          rate * channels * max(bits, 8) // 8,
                          channels * max(bits, 8) // 8, bits)
    else:  # WAVE_FORMAT_EXTENSIBLE: cbSize=22, SubFormat GUID leads with the tag
        guid = struct.pack("<H", subformat) + b"\x00\x00" + bytes.fromhex(
            "000010800080009aa500389b71")[:12]
        fmt = struct.pack("<IHHIIHHHHI", 40, tag, channels, rate,
                          rate * channels * max(bits, 8) // 8,
                          channels * max(bits, 8) // 8, bits, 22, bits, 0) + guid
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) - 4 + 8 + len(payload))
            + b"WAVE" + b"fmt " + fmt[:4] + fmt[4:]
            + b"data" + struct.pack("<I", len(payload)) + payload)


def test_wav_float_and_wide_pcm():
    import struct

    import numpy as np

    from warp10_platform_spark.multimodal.media import decode_wav

    f = np.array([0.0, 0.5, -1.0, 1.0], dtype="<f4")
    sig, rate, ch = decode_wav(_wav(3, 32, 16000, 1, f.tobytes()))
    assert list(sig) == [0, 16384, -32767, 32767] and rate == 16000 and ch == 1

    f64 = np.array([0.25, -0.25], dtype="<f8")
    sig, _, _ = decode_wav(_wav(3, 64, 8000, 1, f64.tobytes()))
    assert list(sig) == [8192, -8192]

    # 24-bit PCM: two samples, +1 and -(2^23)
    p24 = b"\x01\x00\x00" + b"\x00\x00\x80"
    sig, _, _ = decode_wav(_wav(1, 24, 8000, 1, p24))
    assert list(sig) == [1, -(1 << 23)]

    p32 = struct.pack("<ii", 7, -(1 << 31))
    sig, _, _ = decode_wav(_wav(1, 32, 8000, 1, p32))
    assert list(sig) == [7, -(1 << 31)]


def test_wav_g711_and_extensible():
    from warp10_platform_spark.multimodal.media import (
        _g711_alaw_table, _g711_ulaw_table, decode_wav)

    # canonical G.711 anchor points (Sun g711.c ulaw2linear/alaw2linear)
    ut = _g711_ulaw_table()
    assert ut[0xFF] == 0 and ut[0x7F] == 0  # both zero codes
    assert ut[0x00] == -32124 and ut[0x80] == 32124  # max magnitude pair
    at = _g711_alaw_table()
    assert at[0x55] == -8 and at[0xD5] == 8  # zero-adjacent pair
    assert at[0x2A] == -32256 and at[0xAA] == 32256  # max magnitude pair

    sig, rate, ch = decode_wav(_wav(7, 8, 8000, 1, bytes([0x00, 0x80, 0xFF])))
    assert list(sig) == [-32124, 32124, 0] and rate == 8000

    sig, _, _ = decode_wav(_wav(6, 8, 8000, 1, bytes([0x55, 0xD5])))
    assert list(sig) == [-8, 8]

    # extensible container resolving to mu-law through the SubFormat GUID
    sig, _, _ = decode_wav(_wav(0xFFFE, 8, 8000, 1, bytes([0x00]), subformat=7))
    assert list(sig) == [-32124]


def test_attach_wav_audio_is_real_wav(spark, sf_dir):
    from pyspark.sql import functions as F

    from warp10_platform_spark.multimodal.media import attach_wav_audio, decode_wav
    from warp10_platform_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(3)
    rows = attach_wav_audio(docs).collect()
    for r in rows:
        sig, rate, ch = decode_wav(bytes(r.content))
        assert rate == 8000 and ch == 1 and len(sig) == 64


# ---------------------------------------------------------------------
# GIF89a codec (multimodal/gif.py) — real LZW both directions
# ---------------------------------------------------------------------

def test_gif_lzw_roundtrip_forcing_code_growth():
    import numpy as np

    from warp10_platform_spark.multimodal.gif import lzw_decode, lzw_encode

    rng = np.random.default_rng(7)
    for n in (0, 1, 10, 4096, 20000):
        d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert lzw_decode(lzw_encode(d, 8), 8) == d
    # repetitive input exercises the KwKwK case and table resets
    d = b"abcabcabc" * 3000
    assert lzw_decode(lzw_encode(d, 8), 8) == d


def test_gif_animated_roundtrip():
    import numpy as np

    from warp10_platform_spark.multimodal.gif import decode_gif, encode_gif

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (7, 5), dtype=np.uint8) for _ in range(4)]
    gif = encode_gif(frames)
    assert gif[:6] == b"GIF89a" and gif[-1] == 0x3B
    out = decode_gif(gif)
    assert len(out) == len(frames)
    for a, b in zip(frames, out):
        assert (a == b).all()


def test_gif_interlaced_frame_deinterlaces():
    import numpy as np

    from warp10_platform_spark.multimodal.gif import decode_gif, encode_gif

    rng = np.random.default_rng(17)
    frame = rng.integers(0, 256, (13, 4), dtype=np.uint8)
    # store rows in GIF89a 4-pass interlace order and flip the
    # image-descriptor interlace flag; decode must restore display order
    order = np.concatenate([
        np.arange(0, 13, 8), np.arange(4, 13, 8),
        np.arange(2, 13, 4), np.arange(1, 13, 2),
    ])
    gif = bytearray(encode_gif([frame[order]]))
    # sole image descriptor sits after header+LSD+GCT (781 bytes) and the
    # netscape/GCE extensions; search past the palette (which contains 0x2c)
    desc = gif.index(b"\x2c", 781)
    assert gif[desc + 9] == 0
    gif[desc + 9] = 0x40
    out = decode_gif(bytes(gif))
    assert len(out) == 1 and (out[0] == frame).all()


def test_gif_transparency_composites_over_previous():
    import struct

    import numpy as np

    from warp10_platform_spark.multimodal.gif import (
        _sub_blocks,
        decode_gif,
        encode_gif,
        lzw_encode,
    )

    base = np.full((2, 2), 200, dtype=np.uint8)
    gif = bytearray(encode_gif([base]))
    # append a second frame marked transparent on index 0: only the
    # non-zero pixel must overwrite the composited canvas
    overlay = np.array([[0, 7], [0, 0]], dtype=np.uint8)
    extra = bytearray()
    extra += b"\x21\xf9" + _sub_blocks(struct.pack("<BHB", 0x05, 10, 0))  # transparent idx 0
    extra += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    extra.append(8)
    extra += _sub_blocks(lzw_encode(overlay.tobytes(), 8))
    gif = bytes(gif[:-1]) + bytes(extra) + b"\x3b"
    frames = decode_gif(gif)
    assert (frames[0] == 200).all()
    assert frames[1][0, 1] == 7
    assert frames[1][0, 0] == 200 and (frames[1][1] == 200).all()


def test_codec_fuzz_corrupt_bytes_raise_cleanly():
    """Decoders run against untrusted bytes at scale: a corrupt stream
    must raise (ValueError/NotImplementedError/struct.error/Index...) —
    never hang, loop, or crash the worker. Seeded byte-flip fuzz over
    all four codecs (baseline+progressive JPEG, WAV, GIF, PNG)."""
    import struct

    import numpy as np

    from warp10_platform_spark.multimodal.gif import decode_gif, encode_gif
    from warp10_platform_spark.multimodal.jpeg import (
        decode_jpeg, encode_jpeg_gray, encode_jpeg_gray_progressive)
    from warp10_platform_spark.multimodal.media import decode_wav, encode_wav_pcm16

    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    corpora = [
        (encode_jpeg_gray(img), decode_jpeg),
        (encode_jpeg_gray_progressive(img), decode_jpeg),
        (encode_wav_pcm16(rng.integers(-1000, 1000, 64)), decode_wav),
        (encode_gif([img]), decode_gif),
    ]
    allowed = (ValueError, NotImplementedError, struct.error, IndexError,
               KeyError, EOFError, OverflowError, MemoryError, TypeError)
    for blob, decode in corpora:
        b = bytearray(blob)
        for _ in range(60):
            pos = int(rng.integers(0, len(b)))
            old = b[pos]
            b[pos] = int(rng.integers(0, 256))
            try:
                decode(bytes(b))
            except allowed:
                pass  # clean refusal is the contract
            b[pos] = old
        # truncations at every eighth of the stream
        for cut in range(1, 8):
            try:
                decode(bytes(blob[: len(blob) * cut // 8]))
            except allowed:
                pass
