"""Multimodal (image/audio/video) columns — opaque binary + typed metadata.

Design (per the training-data-pipeline brief; the reference has no media
path, so this is engine-native surface):

- media is carried as `content: binary` plus metadata columns
  (media_type, width, height, n_frames, sample_rate) — schema-first so
  partitioning/pruning work on metadata without touching bytes.
- decode / resize / hash / frame-sample run as Arrow-batched pandas
  functions over mapInPandas: bytes cross to Python once per batch, all
  pixel math is numpy.
- PNG (8-bit non-interlaced gray/RGB/+alpha, all five scanline filters)
  is decoded FOR REAL via stdlib zlib; JPEG (baseline sequential, gray +
  YCbCr 4:4:4/4:2:0) via the own codec in multimodal/jpeg.py; WAV/PCM
  via the RIFF parser below; plus the engine's GRAY8 RAW format
  (`b"GR8\\0" + width + height + pixels`). Remaining formats delegate to
  PIL when importable, else raise a clearly labeled NotImplementedError.
- Test content is generated deterministically from md5(text) so a SQL
  oracle can recompute pixel-derived features without any Python.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, DoubleType, LongType, StringType, StructField, StructType

MAGIC = b"GR8\x00"


def attach_fake_images(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """documents → media rows: a deterministic 4x4 GRAY8 RAW image whose
    16 pixels are the md5(text) bytes. Built entirely with JVM exprs
    (concat of binary literals + unhex) — no Python on the write path."""
    header = F.lit(MAGIC + struct.pack(">HH", 4, 4))
    content = F.concat(header.cast("binary"), F.unhex(F.md5("text")))
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/gray8-raw").alias("media_type"),
        F.lit(4).alias("width"),
        F.lit(4).alias("height"),
        content.alias("content"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(content: bytes) -> np.ndarray:
    """Minimal PNG decoder (stdlib zlib only): 8-bit non-interlaced
    grayscale (color type 0) → (h, w) uint8, or truecolor RGB (type 2)
    → (h, w, 3) uint8. Full filter support (None/Sub/Up/Average/Paeth)."""
    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    import zlib

    pos, w = 8, 0
    h = bitdepth = colortype = interlace = None
    idat = b""
    while pos < len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            w, h, bitdepth, colortype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if bitdepth != 8 or colortype not in (0, 2, 4, 6) or interlace != 0:
        raise NotImplementedError(
            f"PNG variant unsupported (bitdepth={bitdepth}, colortype={colortype}, interlace={interlace}); "
            "supported: 8-bit non-interlaced grayscale/RGB (+alpha)"
        )
    bpp = {0: 1, 2: 3, 4: 2, 6: 4}[colortype]
    raw = zlib.decompress(idat)
    stride = w * bpp
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for r in range(h):
        off = r * (stride + 1)
        filt = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if filt == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif filt == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif filt != 0:
            raise ValueError(f"bad PNG filter {filt}")
        out[r * stride : (r + 1) * stride] = line
        prev = line
    arr = np.frombuffer(bytes(out), dtype=np.uint8)
    if colortype == 0:
        return arr.reshape(h, w)
    return arr.reshape(h, w, bpp)


def encode_png_gray(img: np.ndarray) -> bytes:
    """Minimal PNG writer for fixtures: 8-bit grayscale, filter 0 rows,
    one zlib-compressed IDAT."""
    import zlib

    img = np.asarray(img, np.uint8)
    h, w = img.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def decode_gray_raw(content: bytes) -> np.ndarray:
    """Decode one image payload → (h, w) uint8 grayscale. GRAY8 RAW and
    PNG (8-bit gray/RGB, via the stdlib-zlib decoder above) are decoded
    for real; other formats delegate to PIL when present, else are
    explicitly unimplemented. RGB collapses to integer luma
    (299R + 587G + 114B) // 1000."""
    if content[:4] == MAGIC:
        w, h = struct.unpack(">HH", content[4:8])
        return np.frombuffer(content[8 : 8 + w * h], dtype=np.uint8).reshape(h, w)
    if content[:8] == _PNG_SIG:
        img = decode_png(content)
        if img.ndim == 3:
            lum = (
                299 * img[:, :, 0].astype(np.int64)
                + 587 * img[:, :, 1].astype(np.int64)
                + 114 * img[:, :, 2].astype(np.int64)
            ) // 1000
            return lum.astype(np.uint8)
        return img
    if content[:2] == b"\xff\xd8":  # JPEG SOI — own baseline codec
        from warp10_platform_spark.multimodal.jpeg import decode_jpeg

        img = decode_jpeg(content)
        if img.ndim == 3:
            lum = (
                299 * img[:, :, 0].astype(np.int64)
                + 587 * img[:, :, 1].astype(np.int64)
                + 114 * img[:, :, 2].astype(np.int64)
            ) // 1000
            return lum.astype(np.uint8)
        return img
    try:
        import io

        from PIL import Image  # noqa: F401

        return np.asarray(Image.open(io.BytesIO(content)).convert("L"))
    except ImportError as e:
        raise NotImplementedError(
            "non-RAW/non-PNG image decoding requires an image codec (PIL) not present in this environment"
        ) from e


def attach_png_images(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """documents → media rows carrying REAL PNG bytes: each doc's 4x4
    md5-pixel image encoded through the PNG writer (Arrow-batched
    mapInPandas — encoding is Python, but the pixel source is the same
    md5(text) the SQL oracle recomputes)."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("content", BinaryType()),
        ]
    )
    src = docs.select(F.col(id_col).alias("media_id"), F.unhex(F.md5("text")).alias("px"))

    def run(batches):
        for pdf in batches:
            content = [
                encode_png_gray(np.frombuffer(bytes(px), dtype=np.uint8).reshape(4, 4))
                for px in pdf["px"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": "image/png",
                    "width": pd.array([4] * len(pdf), dtype="int64"),
                    "height": pd.array([4] * len(pdf), dtype="int64"),
                    "content": content,
                }
            )

    return src.mapInPandas(run, schema=schema)


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize (numpy indexing — no codec needed)."""
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[np.ix_(ys, xs)]


def _dhash(img: np.ndarray) -> int:
    """Difference hash: bit per horizontal neighbor comparison, row-major
    (pixel[r,c] < pixel[r,c+1]); h*(w-1) bits, bit 0 = top-left."""
    bits = (img[:, :-1] < img[:, 1:]).flatten()
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out


def dhash_images(media: DataFrame, resize_to: tuple[int, int] | None = None) -> DataFrame:
    """media → (media_id, dhash): decode + optional resize + difference
    hash, one Arrow batch at a time through mapInPandas."""
    schema = StructType([StructField("media_id", LongType()), StructField("dhash", LongType())])

    def run(batches):
        for pdf in batches:
            hashes = []
            for content in pdf["content"]:
                img = decode_gray_raw(bytes(content))
                if resize_to is not None:
                    img = resize_nearest(img, *resize_to)
                hashes.append(_dhash(img))
            yield pd.DataFrame({"media_id": pdf["media_id"], "dhash": pd.array(hashes, dtype="int64")})

    return media.select("media_id", "content").mapInPandas(run, schema=schema)


def audio_features(media: DataFrame, frame: int = 4) -> DataFrame:
    """Fake-PCM feature extraction: interpret the payload bytes as uint8
    samples; per media, RMS energy and zero-crossing count of the
    mean-centered signal (the torch/librosa-shaped step, codec-free)."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("rms", DoubleType()),
            StructField("zero_crossings", LongType()),
        ]
    )

    def run(batches):
        import math

        for pdf in batches:
            rms, zc = [], []
            for content in pdf["content"]:
                raw = bytes(content)
                body = raw[8:] if raw[:4] == MAGIC else raw
                sig = np.frombuffer(body, dtype=np.uint8).astype(np.int64)
                n = len(sig)
                # exact integer moments, double assembly — the same
                # arithmetic a SQL engine reproduces bit-for-bit.
                s1 = int(sig.sum())
                s2 = int((sig * sig).sum())
                rms.append(math.sqrt((s2 - s1 * s1 / n) / n))
                mean = s1 / n
                neg = (sig - mean) < 0
                zc.append(int((neg[:-1] != neg[1:]).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "rms": pd.array(rms, dtype="float64"),
                    "zero_crossings": pd.array(zc, dtype="int64"),
                }
            )

    return media.select("media_id", "content").mapInPandas(run, schema=schema)


def frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Video-style frame sampling: the payload is a sequence of GRAY8 RAW
    frames; keep every `every`-th frame and emit per-frame mean pixel.
    Output is exploded (one row per kept frame) — the shape a decode →
    sample → embed pipeline needs."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("mean_pixel", DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids, idxs, means = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                assert raw[:4] == MAGIC, "frame_sample expects GRAY8 RAW concatenated frames"
                w, h = struct.unpack(">HH", raw[4:8])
                fsize = w * h
                body = raw[8:]
                n = len(body) // fsize
                for k in range(0, n, every):
                    frame = np.frombuffer(body[k * fsize : (k + 1) * fsize], dtype=np.uint8)
                    ids.append(mid)
                    idxs.append(k)
                    means.append(float(frame.mean()))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int64"),
                    "mean_pixel": pd.array(means, dtype="float64"),
                }
            )

    return media.select("media_id", "content").mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------
# Real RIFF/WAVE PCM codec (round 4) — stdlib struct only, replacing the
# NotImplementedError for audio: parses the actual container (RIFF size,
# fmt chunk: PCM format tag, channels, rate, bit depth; data chunk) and
# decodes 8/16-bit PCM to numpy. Multi-channel collapses to the mean.
# ---------------------------------------------------------------------

_RIFF = b"RIFF"


def encode_wav_pcm16(samples, rate: int = 8000) -> bytes:
    """Mono 16-bit little-endian PCM WAV writer."""
    import numpy as _np

    s = _np.asarray(samples, dtype="<i2").tobytes()
    hdr = (
        _RIFF + struct.pack("<I", 36 + len(s)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(s))
    )
    return hdr + s


def _g711_ulaw_table() -> "np.ndarray":
    """ITU-T G.711 µ-law byte → 16-bit linear PCM (the standard
    bias-33 segment expansion; matches the canonical CCITT tables)."""
    u = np.arange(256, dtype=np.int64) ^ 0xFF  # wire bytes are complemented
    sign = u >> 7
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign == 1, -mag, mag)


def _g711_alaw_table() -> "np.ndarray":
    """ITU-T G.711 A-law byte → 16-bit linear PCM (even-bit inversion
    then segment expansion)."""
    a = np.arange(256, dtype=np.int64) ^ 0x55
    sign = a & 0x80  # per G.711 A-law, sign bit SET means positive
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(sign != 0, mag, -mag)


_WAV_TAG_PCM, _WAV_TAG_FLOAT, _WAV_TAG_ALAW, _WAV_TAG_ULAW = 1, 3, 6, 7
_WAV_TAG_EXTENSIBLE = 0xFFFE


def decode_wav(content: bytes):
    """RIFF/WAVE → (samples int64 ndarray [mono-collapsed], rate,
    channels). Supports PCM (tag 1) at 8/16/24/32 bits, IEEE float
    (tag 3) at 32/64 bits (scaled to the 16-bit range), G.711 A-law
    (tag 6) and µ-law (tag 7), and WAVE_FORMAT_EXTENSIBLE (0xFFFE,
    resolved through the SubFormat GUID). Anything else raises
    NotImplementedError with the format named."""
    if content[:4] != _RIFF or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (clen,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            if fmt[0] == _WAV_TAG_EXTENSIBLE and clen >= 26:
                # cbSize at 16:18, then wValidBits/dwChannelMask/SubFormat
                # GUID; the real format tag is the GUID's first 2 bytes.
                (subtag,) = struct.unpack("<H", body[24:26])
                fmt = (subtag,) + fmt[1:]
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _byterate, _block, bits = fmt
    if tag == _WAV_TAG_PCM and bits == 16:
        sig = np.frombuffer(data, dtype="<i2").astype(np.int64)
    elif tag == _WAV_TAG_PCM and bits == 8:
        sig = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    elif tag == _WAV_TAG_PCM and bits == 24:
        raw = np.frombuffer(data[: len(data) - len(data) % 3], dtype=np.uint8).reshape(-1, 3)
        u = raw[:, 0].astype(np.int64) | (raw[:, 1].astype(np.int64) << 8) | (raw[:, 2].astype(np.int64) << 16)
        sig = np.where(u >= 1 << 23, u - (1 << 24), u)
    elif tag == _WAV_TAG_PCM and bits == 32:
        sig = np.frombuffer(data, dtype="<i4").astype(np.int64)
    elif tag == _WAV_TAG_FLOAT and bits in (32, 64):
        f = np.frombuffer(data, dtype="<f4" if bits == 32 else "<f8")
        sig = np.rint(np.clip(f, -1.0, 1.0) * 32767.0).astype(np.int64)
    elif tag == _WAV_TAG_ALAW and bits in (8, 0):
        sig = _g711_alaw_table()[np.frombuffer(data, dtype=np.uint8)]
    elif tag == _WAV_TAG_ULAW and bits in (8, 0):
        sig = _g711_ulaw_table()[np.frombuffer(data, dtype=np.uint8)]
    else:
        raise NotImplementedError(
            f"WAV format tag {tag} / {bits}-bit not supported "
            "(PCM 8/16/24/32, float 32/64, A-law, mu-law)"
        )
    if channels > 1:
        sig = sig[: len(sig) - len(sig) % channels].reshape(-1, channels).mean(axis=1).astype(np.int64)
    return sig, rate, channels


def attach_wav_audio(docs: DataFrame, id_col: str = "doc_id", rate: int = 8000,
                     n_hashes: int = 8) -> DataFrame:
    """documents → media rows carrying REAL WAV bytes: 16-bit mono PCM
    whose 2·16·n_hashes payload bytes are an md5 chain of the text —
    built entirely with JVM exprs (constant header literal + unhex(md5)
    concat), so a SQL oracle can regenerate the identical container."""
    nbytes = 16 * n_hashes
    hdr = (
        _RIFF + struct.pack("<I", 36 + nbytes) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", nbytes)
    )
    payload = F.concat(*[F.unhex(F.md5(F.concat(F.col("text"), F.lit(str(i))))) for i in range(n_hashes)])
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("audio/wav").alias("media_type"),
        F.lit(rate).alias("sample_rate"),
        F.concat(F.lit(hdr).cast("binary"), payload).alias("content"),
    )


def attach_wav_audio_g711(docs: DataFrame, id_col: str = "doc_id",
                          rate: int = 8000, n_hashes: int = 4) -> DataFrame:
    """documents → media rows carrying REAL G.711 µ-law WAV bytes
    (format tag 7, 8-bit): the 16·n_hashes payload bytes are an md5
    chain of the text — one µ-law code per byte — built entirely with
    JVM exprs, so a SQL oracle can replay the ITU G.711 expansion
    (sign/exponent/mantissa bit fields) sample by sample."""
    nbytes = 16 * n_hashes
    # Non-PCM formats require the 18-byte fmt chunk (cbSize=0 appended) —
    # RIFF/WAVE spec; strict decoders reject a 16-byte fmt for tag 7.
    hdr = (
        _RIFF + struct.pack("<I", 38 + nbytes) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHHH", 18, 7, 1, rate, rate, 1, 8, 0)
        + b"data" + struct.pack("<I", nbytes)
    )
    payload = F.concat(*[F.unhex(F.md5(F.concat(F.col("text"), F.lit(str(i))))) for i in range(n_hashes)])
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("audio/wav").alias("media_type"),
        F.lit(rate).alias("sample_rate"),
        F.concat(F.lit(hdr).cast("binary"), payload).alias("content"),
    )


def wav_features(media: DataFrame) -> DataFrame:
    """Real-codec audio features: decode the WAV container, then RMS
    (exact integer moments, double assembly) and sign zero-crossings of
    the signed samples."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("sample_rate", LongType()),
            StructField("n_samples", LongType()),
            StructField("rms", DoubleType()),
            StructField("zero_crossings", LongType()),
        ]
    )

    def run(batches):
        import math

        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "n_samples": [], "rms": [], "zero_crossings": []}
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                sig, rate, _ch = decode_wav(bytes(content))
                n = len(sig)
                s1 = int(sig.sum())
                s2 = int((sig * sig).sum())
                out["media_id"].append(media_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["rms"].append(math.sqrt((s2 - s1 * s1 / n) / n))
                neg = sig < 0
                out["zero_crossings"].append(int((neg[:-1] != neg[1:]).sum()))
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(run, schema=schema)


def attach_jpeg_images(docs: DataFrame, id_col: str = "doc_id",
                       progressive: bool = False,
                       restart_interval: int = 0) -> DataFrame:
    """documents → media rows carrying REAL JPEG bytes from the own
    codec (multimodal/jpeg.py): each doc's 4x4 md5-pixel image expands
    to a 32x32 block-constant gray image whose levels are quantized to
    multiples of 16 — the DC quantizer of the Annex-K table — so the
    lossy codec round-trips EXACTLY and the SQL oracle can replay pixel
    math with no codec (see jpeg.py determinism note).
    ``progressive=True`` emits SOF2 6-scan streams (spectral selection +
    successive approximation); ``restart_interval`` adds DRI/RSTn —
    both reconstruct the same pixels, so the same oracle verifies them."""
    from warp10_platform_spark.multimodal.jpeg import (
        encode_jpeg_gray, encode_jpeg_gray_progressive)

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("content", BinaryType()),
        ]
    )
    src = docs.select(F.col(id_col).alias("media_id"), F.unhex(F.md5("text")).alias("px"))

    def run(batches):
        for pdf in batches:
            content = []
            for px in pdf["px"]:
                base = (np.frombuffer(bytes(px), dtype=np.uint8).reshape(4, 4) // 16) * 16
                img = np.repeat(np.repeat(base, 8, 0), 8, 1)
                if progressive:
                    content.append(encode_jpeg_gray_progressive(img))
                else:
                    content.append(encode_jpeg_gray(img, restart_interval=restart_interval))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": "image/jpeg",
                    "width": pd.array([32] * len(pdf), dtype="int64"),
                    "height": pd.array([32] * len(pdf), dtype="int64"),
                    "content": content,
                }
            )

    return src.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------
# Real animated-GIF codec path (round 4): the video-container tier is no
# longer stubbed — multimodal/gif.py parses GIF89a for real (LZW with
# code growth, GCE/disposal compositing) and writes it for real.
# ---------------------------------------------------------------------

def attach_gif_videos(docs: DataFrame, n_frames: int = 4, id_col: str = "doc_id") -> DataFrame:
    """documents → media rows carrying REAL animated GIF bytes: frame k
    is the 4x4 md5(text||k) pixel image (frame 0 = md5(text)), encoded
    through the GIF89a writer inside Arrow-batched mapInPandas."""
    import hashlib as _hl

    from warp10_platform_spark.multimodal.gif import encode_gif

    schema = StructType(
        [StructField("media_id", LongType()), StructField("content", BinaryType())]
    )

    def run(batches):
        for pdf in batches:
            ids, blobs = [], []
            for did, text in zip(pdf[id_col], pdf["text"]):
                frames = []
                for k in range(n_frames):
                    src = text if k == 0 else f"{text}{k}"
                    px = np.frombuffer(
                        _hl.md5(src.encode("utf-8")).digest(), dtype=np.uint8
                    ).reshape(4, 4)
                    frames.append(px)
                ids.append(did)
                blobs.append(encode_gif(frames))
            yield pd.DataFrame({"media_id": pd.array(ids, dtype="int64"),
                                "content": pd.Series(blobs, dtype=object)})

    return docs.select(id_col, "text").mapInPandas(run, schema=schema)


def gif_frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling over a REAL video container: decode the animated
    GIF (full LZW + compositing), keep every `every`-th frame, emit the
    per-frame mean pixel — same output contract as frame_sample, so the
    same md5-arithmetic oracle verifies the whole container path."""
    from warp10_platform_spark.multimodal.gif import decode_gif

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("mean_pixel", DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids, idxs, means = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                frames = decode_gif(bytes(content))
                for k in range(0, len(frames), every):
                    ids.append(mid)
                    idxs.append(k)
                    # exact integer sum / count: engine-reproducible double
                    means.append(int(frames[k].astype(np.int64).sum()) / frames[k].size)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int64"),
                    "mean_pixel": pd.array(means, dtype="float64"),
                }
            )

    return media.select("media_id", "content").mapInPandas(run, schema=schema)
