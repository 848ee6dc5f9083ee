"""q83 — the multimodal family's first DRIVER-VERIFIED oracle row
(round-11; VERDICT r10 'What's missing': multimodal/codecs was the only
first-class family with pytest-only evidence).

The query drives the REAL byte-level media path end-to-end — PPM P6
encode → binary column → ``multimodal.resize_images`` (decode →
nearest-neighbor stride → re-encode) → decode → channel aggregates, and
WAV PCM encode → ``multimodal.extract_audio_features`` (decode →
per-frame RMS) — against a DuckDB oracle that reproduces the features
in closed form. That is possible because the payloads are synthesized
deterministically from ``doc_id`` with integer arithmetic:

- image: 6x4 RGB, pixel(y, x, c) = (doc_id + 7y + 13x + 29c) % 256.
  resize_images(max_side=3) strides to 3x2 taking rows {0,2} and cols
  {0,2,4}, so resized pixel(y, x, c) = (doc_id + 14y + 26x + 29c) % 256
  — the oracle sums that formula directly. Channel sums are exact
  integers (order-free), means are one double division of exact ints
  (bit-identical across engines).
- audio: 64 int16 samples s_i = ((doc_id*31 + 17i) % 4096) - 2048 at
  8 kHz. frame_rms slices 8 frames of 8: every x_i^2 = s_i^2 / 2^30 is
  a dyadic rational and all partial sums are exactly representable, so
  the frame mean is association-order-free, sqrt is correctly rounded,
  and the final float32 cast (AUDIO_FEATURES_SCHEMA) is IEEE-identical
  to DuckDB's CAST(... AS REAL). v1 carries n_samples from the decoder.

- phash (round-11 third leg): `multimodal.image_ahash` over the SAME
  encoded payloads — decode → integer grayscale (channel sum, 0..765)
  → nearest-resize to the 6x10 grid (60 bits) → strict-mean threshold
  → row-major MSB-first bigint. The 6x4 source upscales with floor
  index maps rows ys=(y*4)//6, cols xs=(x*6)//10, so resized
  g(y, x) = Σ_c (doc_id + 7*ys + 13*xs + 29*c) % 256 — the oracle
  rebuilds the full 60-bit signature with integer SQL (v1) plus the
  set-bit count (v2 = Σ bit ≡ Spark `bit_count`). Exact by
  construction: no division anywhere on the image side.

Everything stays Arrow-batched mapInPandas (no per-row UDFs); the
media frame is built once and pinned for all modality legs (the q80
substrate rule). Reference parity: the reference has no media path at
all — this is training-data-extension surface (SURVEY §6 scope).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tradingview_data_pipeline_spark.operators import codecs
from tradingview_data_pipeline_spark.operators import multimodal as mm
from tradingview_data_pipeline_spark.plans.analytics import _t, register

_IMG_W, _IMG_H = 6, 4
_N_SAMPLES, _RATE, _N_FRAMES = 64, 8000, 8


def _encode_media(batches):
    """doc_id -> deterministic PPM + WAV payloads (the 'storage' form)."""
    for b in batches:
        ids, imgs, wavs = [], [], []
        for did in b["doc_id"]:
            did = int(did)
            y = np.arange(_IMG_H)[:, None, None]
            x = np.arange(_IMG_W)[None, :, None]
            c = np.arange(3)[None, None, :]
            arr = ((did + 7 * y + 13 * x + 29 * c) % 256).astype(np.uint8)
            imgs.append(codecs.encode_ppm(arr))
            s = (((did * 31 + 17 * np.arange(_N_SAMPLES)) % 4096) - 2048) \
                .astype(np.int16)
            wavs.append(codecs.encode_wav(s, _RATE))
            ids.append(did)
        yield pd.DataFrame({"doc_id": ids, "img": imgs, "wav": wavs})


def _channel_sums(batches):
    """Decode resized PPM payloads -> per-channel integer sums."""
    for b in batches:
        out = {"media_id": [], "idx": [], "v1": []}
        for mid, p in zip(b["media_id"], b["payload"]):
            arr = codecs.decode_ppm(p).astype(np.int64)
            for ch in range(3):
                out["media_id"].append(mid)
                out["idx"].append(ch)
                out["v1"].append(int(arr[:, :, ch].sum()))
        yield pd.DataFrame(out)


@register("q83_multimodal_codecs", oracle="""
WITH ids AS (SELECT doc_id FROM documents),
img AS (
  SELECT doc_id, c,
         CAST(SUM((doc_id + 14*y + 26*x + 29*c) % 256) AS BIGINT) AS v1
  FROM ids
  CROSS JOIN range(3) AS tc(c)
  CROSS JOIN range(2) AS ty(y)
  CROSS JOIN range(3) AS tx(x)
  GROUP BY doc_id, c
),
wav AS (
  SELECT doc_id, f, SUM(s * s) AS ss
  FROM (SELECT doc_id, i // 8 AS f,
               ((doc_id * 31 + 17 * i) % 4096) - 2048 AS s
        FROM ids CROSS JOIN range(64) AS ti(i))
  GROUP BY doc_id, f
),
gray AS (
  SELECT doc_id, y, x,
         CAST(SUM((doc_id + 7*((y*4)//6) + 13*((x*6)//10) + 29*c) % 256)
              AS BIGINT) AS g
  FROM ids
  CROSS JOIN range(6) AS ty(y)
  CROSS JOIN range(10) AS tx(x)
  CROSS JOIN range(3) AS tc(c)
  GROUP BY doc_id, y, x
),
ph AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN g * 60 > total
                       THEN CAST(1 AS BIGINT) << (59 - (y*10 + x))
                       ELSE 0 END) AS BIGINT) AS v1,
         CAST(SUM(CASE WHEN g * 60 > total THEN 1 ELSE 0 END)
              AS DOUBLE) AS v2
  FROM (SELECT doc_id, y, x, g,
               CAST(SUM(g) OVER (PARTITION BY doc_id) AS BIGINT) AS total
        FROM gray)
  GROUP BY doc_id
)
SELECT 'img' AS kind, doc_id, c AS idx, v1,
       CAST(v1 AS DOUBLE) / 6.0 AS v2
FROM img
UNION ALL
SELECT 'wav' AS kind, doc_id, f AS idx, CAST(64 AS BIGINT) AS v1,
       CAST(CAST(sqrt(CAST(ss AS DOUBLE) / 8.0) / 32768.0 AS REAL)
            AS DOUBLE) AS v2
FROM wav
UNION ALL
SELECT 'phash' AS kind, doc_id, CAST(0 AS BIGINT) AS idx, v1, v2
FROM ph
""")
def q83_multimodal_codecs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id")
    media = (d.mapInPandas(_encode_media,
                           "doc_id long, img binary, wav binary")
             .localCheckpoint(eager=False))   # one encode for both legs

    img_media = media.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.col("img").alias("payload"))
    resized = mm.resize_images(img_media, max_side=3)
    img_feat = resized.select("media_id", "payload").mapInPandas(
        _channel_sums, "media_id string, idx long, v1 long")
    img_leg = img_feat.select(
        F.lit("img").alias("kind"),
        F.col("media_id").cast("bigint").alias("doc_id"),
        "idx", "v1",
        (F.col("v1").cast("double") / F.lit(6.0)).alias("v2"))

    wav_media = media.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.col("wav").alias("payload"))
    af = mm.extract_audio_features(wav_media, n_frames=_N_FRAMES)
    wav_leg = af.select(
        F.lit("wav").alias("kind"),
        F.col("media_id").cast("bigint").alias("doc_id"),
        F.posexplode("rms_frames").alias("idx", "rms"),
        F.col("n_samples").alias("v1")
    ).select("kind", "doc_id", F.col("idx").cast("bigint").alias("idx"),
             "v1", F.col("rms").cast("double").alias("v2"))

    ah = mm.image_ahash(img_media, grid=(6, 10))
    ph_leg = ah.select(
        F.lit("phash").alias("kind"),
        F.col("media_id").cast("bigint").alias("doc_id"),
        F.lit(0).cast("bigint").alias("idx"),
        F.col("phash").alias("v1"),
        F.bit_count("phash").cast("double").alias("v2"))

    return img_leg.unionByName(wav_leg).unionByName(ph_leg)
