"""Multimodal (image/audio/video) columns — opaque binary + typed metadata.

Design (per the training-data-pipeline brief; the reference has no media
path, so this is engine-native surface):

- media is carried as `content: binary` plus metadata columns
  (media_type, width, height, n_frames, sample_rate) — schema-first so
  partitioning/pruning work on metadata without touching bytes.
- decode / resize / hash / frame-sample run as Arrow-batched pandas
  functions over mapInPandas: bytes cross to Python once per batch, all
  pixel math is numpy.
- This container has no image/audio codecs, so "real" formats (JPEG,
  PNG, WAV) are STUBBED: decode_gray_raw raises NotImplementedError for
  them unless PIL is importable. The engine's own GRAY8 RAW format
  (`b"GR8\\0" + width + height + pixels`) is decoded for real — header
  parse + numpy frombuffer — so the entire Spark-side pipeline (binary
  column → Arrow → decode → feature → join back) is genuinely exercised.
- Test content is generated deterministically from md5(text) so a SQL
  oracle can recompute pixel-derived features without any Python.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, DoubleType, LongType, StructField, StructType

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


def decode_gray_raw(content: bytes) -> np.ndarray:
    """Decode one GRAY8 RAW payload → (h, w) uint8 array. Real formats
    are delegated to PIL when present, else explicitly unimplemented."""
    if content[:4] == MAGIC:
        w, h = struct.unpack(">HH", content[4:8])
        return np.frombuffer(content[8 : 8 + w * h], dtype=np.uint8).reshape(h, w)
    try:
        import io

        from PIL import Image  # noqa: F401

        return np.asarray(Image.open(io.BytesIO(content)).convert("L"))
    except ImportError as e:
        raise NotImplementedError(
            "non-RAW image decoding requires an image codec (PIL) not present in this environment"
        ) from e


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
