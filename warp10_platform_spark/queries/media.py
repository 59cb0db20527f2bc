"""Multimodal queries: binary media columns → decode → hash/feature,
each with a DuckDB oracle that recomputes the pixel math from the md5
hex directly (the fake content is md5(text) bytes, so the oracle needs
no Python and no codecs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from warp10_platform_spark.multimodal import (
    attach_fake_images,
    audio_features,
    dhash_images,
    frame_sample,
)
from warp10_platform_spark.queries import register
from warp10_platform_spark.sources.tables import canonical_points, load_table


def _byte(src: str, i: int) -> str:
    """DuckDB: i-th byte (0-based) of unhex(md5(src)) as INT."""
    return f"('0x' || substr(md5({src}), {2 * i + 1}, 2))::INT"


def _dhash_sql(src: str = "text") -> str:
    """DuckDB twin of multimodal._dhash over the 4x4 md5-pixel image:
    bit r*3+c set iff p[r*4+c] < p[r*4+c+1]."""
    terms = []
    for r in range(4):
        for c in range(3):
            bit = r * 3 + c
            terms.append(
                f"(CASE WHEN {_byte(src, r * 4 + c)} < {_byte(src, r * 4 + c + 1)} THEN {1 << bit} ELSE 0 END)"
            )
    return " + ".join(terms)


@register("media_image_dhash", (
    f"SELECT doc_id AS media_id, CAST({_dhash_sql()} AS BIGINT) AS dhash FROM documents"
))
def media_image_dhash(spark, sf_dir):
    """Binary image column → decode (GRAY8 RAW header parse + numpy) →
    difference hash, Arrow-batched mapInPandas. The oracle recomputes the
    same bits from the md5 hex — decode path verified end to end."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_images(docs)
    return dhash_images(media)


@register("media_image_dedup", (
    f"WITH h AS (SELECT doc_id AS media_id, CAST({_dhash_sql()} AS BIGINT) AS dhash FROM documents) "
    "SELECT dhash, count(*) AS n, min(media_id) AS keep_id FROM h GROUP BY dhash HAVING count(*) >= 2"
))
def media_image_dedup(spark, sf_dir):
    """Perceptual-hash dedup tier over the binary column: group identical
    dhashes (the media twin of doc_exact_dedup; near-dup hamming tiers
    reuse pipeline/dedup.py's simhash blocking on the dhash)."""
    docs = load_table(spark, sf_dir, "documents")
    hashes = dhash_images(attach_fake_images(docs))
    return (
        hashes.groupBy("dhash")
        .agg(F.count("*").alias("n"), F.min("media_id").alias("keep_id"))
        .where(F.col("n") >= 2)
    )


def _audio_oracle() -> str:
    s1 = " + ".join(_byte("text", i) for i in range(16))
    zc_terms = []
    for i in range(15):
        a, b = _byte("text", i), _byte("text", i + 1)
        zc_terms.append(f"(CASE WHEN (({a} - m) < 0) != (({b} - m) < 0) THEN 1 ELSE 0 END)")
    return f"""
WITH s AS (SELECT doc_id, ({s1}) AS s1,
           ({' + '.join(f'({_byte("text", i)} * {_byte("text", i)})' for i in range(16))}) AS s2
           FROM documents),
m AS (SELECT doc_id, s1 / 16.0 AS m, s1, s2 FROM s)
SELECT doc_id AS media_id,
       round(sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / 16.0) / 16.0), 6) AS rms,
       CAST(({' + '.join(zc_terms)}) AS BIGINT) AS zero_crossings
FROM m JOIN documents USING (doc_id)
"""


@register("media_audio_features", _audio_oracle())
def media_audio_features(spark, sf_dir):
    """Fake-PCM audio features (RMS + zero crossings) over the binary
    payload — assembled from exact integer sums so the double RMS is
    engine-reproducible."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_images(docs)
    out = audio_features(media)
    return out.select("media_id", F.round("rms", 6).alias("rms"), "zero_crossings")


def _frames_oracle() -> str:
    # frames 0 and 2 of a 4-frame video; frame k pixels = md5(text || k)
    # (frame 0 uses plain md5(text)); mean = exact-int sum / 16.
    rows = []
    for k in (0, 2):
        src = "text" if k == 0 else f"text || '{k}'"
        s = " + ".join(_byte(src, i) for i in range(16))
        rows.append(f"SELECT doc_id AS media_id, {k} AS frame_idx, ({s}) / 16.0 AS mean_pixel FROM documents")
    return " UNION ALL ".join(rows)


@register("media_frame_sample", _frames_oracle())
def media_frame_sample(spark, sf_dir):
    """Video-style frame sampling: 4 concatenated GRAY8 frames per doc,
    keep every 2nd, per-frame mean pixel (exact /16 division)."""
    docs = load_table(spark, sf_dir, "documents")
    frames = [F.unhex(F.md5("text"))] + [F.unhex(F.md5(F.concat(F.col("text"), F.lit(str(k))))) for k in (1, 2, 3)]
    import struct as _struct

    header = F.lit(b"GR8\x00" + _struct.pack(">HH", 4, 4)).cast("binary")
    video = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(header, *frames).alias("content"),
    )
    return frame_sample(video, every=2)


@register("media_png_dhash", (
    f"SELECT doc_id AS media_id, CAST({_dhash_sql()} AS BIGINT) AS dhash FROM documents"
))
def media_png_dhash(spark, sf_dir):
    """REAL PNG bytes end-to-end: encode each doc's 4x4 md5-pixel image
    as PNG (stdlib-zlib writer), then decode through the PNG decoder
    (chunk walk, inflate, de-filter) and difference-hash. Same oracle as
    the RAW variant — the pixels are identical, so any decode bug breaks
    the hash."""
    from warp10_platform_spark.multimodal import attach_png_images

    docs = load_table(spark, sf_dir, "documents")
    media = attach_png_images(docs)
    return dhash_images(media)


# --- real WAV/PCM codec path (round 4) ---
# Payload: 16 little-endian int16 samples per md5 link, 8 links = 64
# samples. The oracle re-derives each sample from the md5 hex directly:
# s = (hi<<8 | lo) - (s >= 2^15 ? 2^16 : 0), lo = byte 2k, hi = byte 2k+1.

_N_LINKS = 8


def _wav_sample(link: str, k: int) -> str:
    lo = f"('0x' || substr(md5(text || '{link}'), {4 * k + 1}, 2))::BIGINT"
    hi = f"('0x' || substr(md5(text || '{link}'), {4 * k + 3}, 2))::BIGINT"
    return f"(CASE WHEN ({hi}) >= 128 THEN (({hi}) << 8) + ({lo}) - 65536 ELSE (({hi}) << 8) + ({lo}) END)"


def _wav_oracle() -> str:
    samples = ", ".join(_wav_sample(str(i), k) for i in range(_N_LINKS) for k in range(8))
    return f"""
WITH s AS (SELECT doc_id, [{samples}] AS sig FROM documents),
m AS (
  SELECT doc_id, len(sig) AS n,
         list_sum(sig) AS s1,
         list_sum(list_transform(sig, x -> x * x)) AS s2,
         list_sum(list_transform(range(1, len(sig)),
                  i -> CASE WHEN (sig[i] < 0) != (sig[i + 1] < 0) THEN 1 ELSE 0 END)) AS zc
  FROM s
)
SELECT doc_id AS media_id, 8000 AS sample_rate, CAST(n AS BIGINT) AS n_samples,
       sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n) / n) AS rms,
       CAST(zc AS BIGINT) AS zero_crossings
FROM m
"""


@register("media_wav_features", _wav_oracle())
def media_wav_features(spark, sf_dir):
    """REAL RIFF/WAVE codec path: build actual WAV containers (16-bit
    mono PCM, md5-chain payload, JVM-side byte assembly), parse the
    container for real (fmt/data chunks, stdlib struct), and compute
    RMS + sign zero-crossings — the librosa-shaped feature step with no
    codec library and a bit-exact SQL oracle."""
    from warp10_platform_spark.multimodal.media import attach_wav_audio, wav_features

    docs = load_table(spark, sf_dir, "documents")
    media = attach_wav_audio(docs, rate=8000, n_hashes=_N_LINKS)
    return wav_features(media)


# --- Distributed canvas rendering (round 4): per-series sparklines via
# applyInPandas, oracled by a DuckDB replay of the stroke-coverage
# arithmetic (distance-to-segment ≤ weight/2 over pixel centers). ---

_SPARK_W, _SPARK_H = 64, 32


def _sparkline_oracle():
    from warp10_platform_spark.queries.gts import DAY, LASTBUCKET, NDAYS, PTS

    return f"""
WITH {PTS},
b AS (
  SELECT class, "user",
         {LASTBUCKET} - (({LASTBUCKET} - ts) // {DAY}) * {DAY} AS ts,
         count(*) AS v
  FROM pts
  WHERE ts <= {LASTBUCKET} AND ts > {LASTBUCKET - DAY * NDAYS}
  GROUP BY 1, 2, 3
),
s AS (
  SELECT class, "user", ts, v,
         min(ts) OVER w AS tmin, max(ts) OVER w AS tmax,
         min(v) OVER w AS vmin, max(v) OVER w AS vmax,
         count(*) OVER w AS np
  FROM b WINDOW w AS (PARTITION BY class, "user")
),
p AS (
  SELECT class, "user", ts, np,
         2.0 + (ts - tmin) * 60.0 / greatest(tmax - tmin, 1) AS x,
         30.0 - (v - vmin) * 28.0 / greatest(vmax - vmin, 1) AS y
  FROM s
),
seg0 AS (
  SELECT class, "user", np, x AS px, y AS py,
         lead(x) OVER (PARTITION BY class, "user" ORDER BY ts) AS qx,
         lead(y) OVER (PARTITION BY class, "user" ORDER BY ts) AS qy
  FROM p
),
seg AS (
  SELECT class, "user", px, py, qx, qy FROM seg0 WHERE qx IS NOT NULL
  UNION ALL
  SELECT class, "user", px, py, px, py FROM seg0 WHERE np = 1
),
px AS (
  SELECT gx.x - 0.5 AS cx, gy.y - 0.5 AS cy
  FROM generate_series(1, {_SPARK_W}) gx(x), generate_series(1, {_SPARK_H}) gy(y)
),
cov AS (
  SELECT DISTINCT class, "user", cx, cy
  FROM seg, px
  WHERE power(cx - (px + least(greatest(CASE
          WHEN (qx - px) * (qx - px) + (qy - py) * (qy - py) = 0 THEN 0.0
          ELSE ((cx - px) * (qx - px) + (cy - py) * (qy - py))
               / ((qx - px) * (qx - px) + (qy - py) * (qy - py)) END, 0.0), 1.0) * (qx - px)), 2)
      + power(cy - (py + least(greatest(CASE
          WHEN (qx - px) * (qx - px) + (qy - py) * (qy - py) = 0 THEN 0.0
          ELSE ((cx - px) * (qx - px) + (cy - py) * (qy - py))
               / ((qx - px) * (qx - px) + (qy - py) * (qy - py)) END, 0.0), 1.0) * (qy - py)), 2)
      <= 0.25
)
SELECT s.class, s."user", coalesce(c.lit, 0) AS lit
FROM (SELECT DISTINCT class, "user" FROM b) s
LEFT JOIN (SELECT class, "user", count(*) AS lit FROM cov GROUP BY class, "user") c
  ON s.class = c.class AND s."user" = c."user"
"""


@register("media_sparkline_render", _sparkline_oracle())
def media_sparkline_render(spark, sf_dir):
    """DISTRIBUTED canvas rendering: one 64x32 sparkline per series,
    rendered inside applyInPandas with the exact-coverage rasterizer
    (canvas/core.py — the P* tier engine), returning lit-pixel counts.
    The oracle replays the identical float64 stroke-distance arithmetic
    per pixel center in SQL, so the render is bit-verified. This is the
    100 TB shape for chart generation: rendering runs where the series
    lives (one Arrow batch per series), nothing but (key, count) comes
    back."""
    import pandas as pd

    from warp10_platform_spark.queries.gts import DAY, LASTBUCKET, NDAYS
    from warp10_platform_spark.sources.tables import events_points

    pts = canonical_points(spark, sf_dir)
    daily = (
        pts.where(
            (F.col("ts") <= LASTBUCKET) & (F.col("ts") > LASTBUCKET - DAY * NDAYS)
        )
        .withColumn(
            "bts",
            F.lit(LASTBUCKET)
            - ((F.lit(LASTBUCKET) - F.col("ts")) / F.lit(DAY)).cast("long") * F.lit(DAY),
        )
        .groupBy("class", F.element_at("labels", F.lit("user")).alias("user"), "bts")
        .agg(F.count("*").alias("v"))
    )

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from warp10_platform_spark.canvas.core import PCanvas

        pdf = pdf.sort_values("bts")
        ts = pdf["bts"].to_numpy(dtype=np.int64)
        v = pdf["v"].to_numpy(dtype=np.int64)
        tden = max(int(ts.max() - ts.min()), 1)
        vden = max(int(v.max() - v.min()), 1)
        xs = 2.0 + (ts - ts.min()) * 60.0 / tden
        ys = 30.0 - (v - v.min()) * 28.0 / vden
        c = PCanvas(_SPARK_W, _SPARK_H)
        c.style.stroke_weight = 1.0
        dev = np.stack([xs, ys], axis=1)
        c._stroke_polyline_device(dev, 0xFF000000, closed=False)
        lit = int((c.pix != 0).sum())
        return pd.DataFrame(
            {"class": [pdf["class"].iloc[0]], "user": [pdf["user"].iloc[0]], "lit": [lit]}
        )

    return daily.groupBy("class", "user").applyInPandas(
        render, "class string, user string, lit long"
    )


def _jpeg_dhash_sql(src: str = "text") -> str:
    """DuckDB twin of the JPEG path: pixels are the md5 bytes quantized
    to multiples of 16 (the Annex-K DC quantizer step — the exactness
    construction in multimodal/jpeg.py), then the same dhash."""
    terms = []
    for r in range(4):
        for c in range(3):
            bit = r * 3 + c
            a = f"(({_byte(src, r * 4 + c)} // 16) * 16)"
            b = f"(({_byte(src, r * 4 + c + 1)} // 16) * 16)"
            terms.append(f"(CASE WHEN {a} < {b} THEN {1 << bit} ELSE 0 END)")
    return " + ".join(terms)


@register("media_jpeg_dhash", (
    f"SELECT doc_id AS media_id, CAST({_jpeg_dhash_sql()} AS BIGINT) AS dhash FROM documents"
))
def media_jpeg_dhash(spark, sf_dir):
    """REAL JPEG bytes end-to-end through the OWN baseline codec
    (multimodal/jpeg.py — Annex-K tables, Huffman entropy coding, DCT):
    encode each doc's quantized md5-pixel image as a 32x32 block-constant
    JPEG, decode through the full marker/Huffman/IDCT path, downsample
    block corners back to 4x4, difference-hash. Block-constant levels on
    the DC quantizer grid round-trip exactly, so the oracle replays the
    pixel math from md5 hex with no codec — any decode bug breaks the
    hash."""
    from warp10_platform_spark.multimodal import attach_jpeg_images, dhash_images

    docs = load_table(spark, sf_dir, "documents")
    media = attach_jpeg_images(docs)
    return dhash_images(media, resize_to=(4, 4))


@register("media_jpeg_progressive", (
    f"SELECT doc_id AS media_id, CAST({_jpeg_dhash_sql()} AS BIGINT) AS dhash FROM documents"
))
def media_jpeg_progressive(spark, sf_dir):
    """PROGRESSIVE (SOF2) JPEG end-to-end through the own codec: each
    doc's image is encoded as a 6-scan progressive stream (DC/AC first
    + successive-approximation refinement, EOB runs) and decoded through
    the full multi-scan coefficient-accumulation path. The pixel
    construction is the same block-constant DC-grid image as
    media_jpeg_dhash, so the identical SQL oracle verifies it — any
    progressive scan-decode bug (band bookkeeping, refinement bits,
    EOBRUN) breaks the hash."""
    from warp10_platform_spark.multimodal import attach_jpeg_images, dhash_images

    docs = load_table(spark, sf_dir, "documents")
    media = attach_jpeg_images(docs, progressive=True)
    return dhash_images(media, resize_to=(4, 4))


def _g711_sample(link: str, k: int) -> str:
    """ITU G.711 µ-law expansion of md5 byte k, replayed in SQL:
    u = byte XOR 0xFF; mag = ((mant·8 + 132) << exp) - 132; ±by sign."""
    b = f"('0x' || substr(md5(text || '{link}'), {2 * k + 1}, 2))::BIGINT"
    u = f"xor({b}, 255)"
    mag = f"((({u}) % 16) * 8 + 132) * (1 << ((({u}) // 16) % 8)) - 132"
    return f"((CASE WHEN ({u}) >= 128 THEN -1 ELSE 1 END) * ({mag}))"


def _g711_oracle() -> str:
    samples = ", ".join(_g711_sample(str(i), k) for i in range(4) for k in range(16))
    return f"""
WITH s AS (SELECT doc_id, [{samples}] AS sig FROM documents),
m AS (
  SELECT doc_id, len(sig) AS n,
         list_sum(sig) AS s1,
         list_sum(list_transform(sig, x -> x * x)) AS s2,
         list_sum(list_transform(range(1, len(sig)),
                  i -> CASE WHEN (sig[i] < 0) != (sig[i + 1] < 0) THEN 1 ELSE 0 END)) AS zc
  FROM s
)
SELECT doc_id AS media_id, 8000 AS sample_rate, CAST(n AS BIGINT) AS n_samples,
       sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n) / n) AS rms,
       CAST(zc AS BIGINT) AS zero_crossings
FROM m
"""


@register("media_wav_g711_features", _g711_oracle())
def media_wav_g711_features(spark, sf_dir):
    """G.711 µ-law WAV end-to-end through the own codec: format-tag-7
    8-bit containers whose payload bytes are an md5 chain, decoded
    through the RIFF walk + the µ-law segment-expansion table, then the
    same RMS/zero-crossing features as media_wav_features. The oracle
    replays the G.711 bit-field expansion per sample in SQL — any table
    or container bug breaks every row."""
    from warp10_platform_spark.multimodal.media import attach_wav_audio_g711, wav_features

    docs = load_table(spark, sf_dir, "documents")
    return wav_features(attach_wav_audio_g711(docs, rate=8000, n_hashes=4))


@register("media_gif_frame_sample", _frames_oracle())
def media_gif_frame_sample(spark, sf_dir):
    """REAL video-container path: each doc becomes a 4-frame animated
    GIF89a (real LZW, GCE per frame) built by the own writer, decoded by
    the own parser (code-size growth, compositing), sampled every 2nd
    frame. Pixels are the same md5 bytes as media_frame_sample, so the
    identical SQL oracle verifies the whole container round-trip — any
    LZW or compositing bug breaks the means."""
    from warp10_platform_spark.multimodal.media import attach_gif_videos, gif_frame_sample

    docs = load_table(spark, sf_dir, "documents")
    media = attach_gif_videos(docs, n_frames=4)
    return gif_frame_sample(media, every=2)
