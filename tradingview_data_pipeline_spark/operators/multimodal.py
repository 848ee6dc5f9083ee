"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side contract is fully real — schemas, partition-aware batch
processing via ``mapInPandas`` (Arrow-batched, one Python worker round
trip per partition, never per row), metadata pushdown-friendly layout.
The codec layer is split by honesty: uncompressed formats have REAL
zero-dependency decoders (``operators/codecs.py``: PPM P6 images, WAV
16-bit PCM audio — full decode, nearest-neighbor resize, block-mean /
RMS features), exercised end-to-end by ``resize_images`` and
``extract_audio_features`` below.  Compressed formats (JPEG/PNG/MP3)
remain behind ``register_decoder`` with a deterministic fake until
their libraries exist in this container.

Round 11 adds the media DEDUP families on top of the codecs — image
perceptual hashing (``image_ahash``/``image_dhash``/``image_near_dups``),
video clip containment (``video_phash``/``video_near_dups``), audio
spectral fingerprints (``audio_fingerprint``/``audio_near_dups``), and
the exact-first pipeline composition (``media_dedup``).

Layout guidance for 100 TB: store media as parquet/Lance-style binary
columns partitioned by (modality, date) with the metadata struct in the
same row group — filter/prune on metadata happens without touching bytes;
the binary column is only deserialized inside the mapInPandas stage.
Three measured sizing rules for fat binary rows (SCALING addenda 31-32):
32 MB parquet row groups on media writes; Arrow batches bounded
(``spark.sql.execution.arrow.maxRecordsPerBatch`` ~1024 — the default
10k-row batch of 9 KB payloads is ~90 MB per in-flight task and OOMs a
default heap at 32-way concurrency); and for CPU-heavy per-byte stages,
32 MB parquet SPLITS (``spark.sql.files.maxPartitionBytes``) so the
scan produces enough tasks to fill the machine.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("modality", T.StringType()),        # image | audio | video
    T.StructField("mime_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ])),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_sha1", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode: derives shape and a
    16-dim 'feature' from the bytes. Replace via ``register_decoder``."""
    digest = hashlib.sha1(payload or b"").digest()
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    feat = [x / 255.0 for x in digest[:16]]
    return {"width": w, "height": h, "feature": feat,
            "sha1": hashlib.sha1(payload or b"").hexdigest()}


_DECODER: Callable[[bytes], dict] = _fake_decode


def register_decoder(fn: Callable[[bytes], dict]) -> None:
    """Swap in a real decoder (e.g. PIL-based) with the same contract:
    bytes -> {width, height, feature: list[float], sha1}."""
    global _DECODER
    _DECODER = fn


def extract_image_features(df: DataFrame, *, batch_hint: int | None = None) -> DataFrame:
    """media table -> per-image features via mapInPandas (Arrow batches).

    The pandas iterator shape keeps peak memory at one Arrow batch per
    task regardless of partition size; the decoder runs vectorized over
    the batch without per-row Python<->JVM crossings.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            decoded = [_DECODER(p if p is not None else b"") for p in b["payload"]]
            yield pd.DataFrame({
                "media_id": b["media_id"],
                "width": [d["width"] for d in decoded],
                "height": [d["height"] for d in decoded],
                "n_bytes": [len(p) if p is not None else 0 for p in b["payload"]],
                "content_sha1": [d["sha1"] for d in decoded],
                "feature": [d["feature"] for d in decoded],
            })

    src = df.select("media_id", "payload")
    return src.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_spec(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Plan a resize: pure-metadata computation of target dims (native
    expressions; the byte transform itself would run in the same
    mapInPandas stage as ``extract_image_features``)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest(w, h).cast("double"))
    return df.withColumn("target_width", F.ceil(w * scale).cast("int")) \
             .withColumn("target_height", F.ceil(h * scale).cast("int"))


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode target frame timestamps from
    duration metadata (native sequence; decode happens downstream)."""
    dur = F.col("meta.duration_ms")
    ts = F.when(dur.isNotNull() & (dur > 0),
                F.sequence(F.lit(0).cast("long"), dur - 1, F.lit(every_ms).cast("long"))) \
        .otherwise(F.array().cast("array<long>"))
    return df.select("media_id", F.explode(ts).alias("frame_ms"))


def make_fake_media(spark, n: int = 16) -> DataFrame:
    """Deterministic fixture for plumbing tests."""
    rows = []
    for i in range(n):
        payload = struct.pack("<I", i) * (i + 1)
        rows.append((f"m{i:03d}", "image", "image/fake", payload,
                     (32 + i, 24 + i, None, None)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --- real byte-level transforms (PPM / WAV via operators/codecs.py) --------

RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload", T.BinaryType()),
])

AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("n_samples", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("rms_frames", T.ArrayType(T.FloatType())),
])


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """REAL image resize for PPM payloads: decode -> nearest-neighbor
    downscale so max(w, h) <= max_side (never upscales) -> re-encode.
    Runs in mapInPandas; per-task memory is one Arrow batch of images.
    """
    from tradingview_data_pipeline_spark.operators import codecs

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # r13 (guide §4.2, the _hash_image_batch recipe): group the
        # batch's payloads by decoded (w, h) — every group shares its
        # scale/target dims and output header, so the whole group
        # decodes with ONE frombuffer and resizes as one stacked
        # fancy-index. resize_nearest's floor index maps are applied
        # verbatim, so output bytes are identical to the per-row path.
        for b in batches:
            payloads = list(b["payload"])
            mids = list(b["media_id"])
            groups: dict = {}
            for i, p in enumerate(payloads):
                p = bytes(p)
                w, h, maxval, off = codecs._ppm_header(p)
                if maxval != 255:
                    raise ValueError("only 8-bit PPM supported")
                groups.setdefault((w, h), []).append(
                    (i, p[off:off + w * h * 3]))
            ws = [0] * len(payloads)
            hs = [0] * len(payloads)
            outs = [b""] * len(payloads)
            for (w, h), items in groups.items():
                k = len(items)
                data = np.frombuffer(b"".join(s for _, s in items),
                                     np.uint8).reshape(k, h, w, 3)
                scale = min(1.0, max_side / max(w, h))
                tw, th = max(int(w * scale), 1), max(int(h * scale), 1)
                if (tw, th) != (w, h):
                    rows = np.arange(th) * h // th   # resize_nearest maps
                    cols = np.arange(tw) * w // tw
                    data = data[:, rows][:, :, cols]
                # header from the codec itself (encode output = header +
                # raw bytes), so the emitted bytes provably match per-row
                # encode_ppm
                hdr = codecs.encode_ppm(
                    np.zeros((th, tw, 3), np.uint8))[:-th * tw * 3]
                for (i, _), a in zip(items, data):
                    ws[i] = tw
                    hs[i] = th
                    outs[i] = hdr + a.tobytes()
            yield pd.DataFrame({"media_id": mids, "width": ws,
                                "height": hs, "payload": outs})

    return df.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


def extract_audio_features(df: DataFrame, n_frames: int = 8) -> DataFrame:
    """REAL audio feature extraction for WAV PCM payloads: decode ->
    per-frame RMS energy + duration metadata, Arrow-batched."""
    from tradingview_data_pipeline_spark.operators import codecs

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # r13 (guide §4.2): the RMS math runs stacked over groups of
        # equal-length clips — frame bounds are a function of length
        # only, and numpy's pairwise reduction over the last axis of a
        # stacked (k, len) array is the per-row frame_rms reduction
        # bit-for-bit (pinned by tests/test_codecs.py equivalence).
        # The header chunk-walk (decode_wav) stays per row: it is a
        # few-µs byte scan with data returned as a zero-copy view.
        for b in batches:
            decoded = [codecs.decode_wav(bytes(p)) for p in b["payload"]]
            rms: list = [None] * len(decoded)
            groups: dict = {}
            for i, (samples, _rate) in enumerate(decoded):
                groups.setdefault(len(samples), []).append(i)
            for ln, idxs in groups.items():
                if ln == 0:
                    for i in idxs:
                        rms[i] = [0.0] * n_frames
                    continue
                x = np.stack([decoded[i][0] for i in idxs]) \
                    .astype(np.float64) / 32768.0
                bounds = [ln * j // n_frames for j in range(n_frames + 1)]
                cols = []
                for j in range(n_frames):
                    seg = x[:, bounds[j]:max(bounds[j + 1], bounds[j] + 1)]
                    cols.append(np.sqrt(np.mean(seg * seg, axis=1)))
                mat = np.stack(cols, axis=1)
                for r, i in enumerate(idxs):
                    rms[i] = [float(v) for v in mat[r]]
            yield pd.DataFrame({
                "media_id": list(b["media_id"]),
                "n_samples": [len(s) for s, _ in decoded],
                "sample_rate": [r for _, r in decoded],
                "duration_ms": [len(s) * 1000 // r for s, r in decoded],
                "rms_frames": rms})

    return df.select("media_id", "payload").mapInPandas(run, AUDIO_FEATURES_SCHEMA)

# --- perceptual hashing: image near-duplicate detection ---------------------
#
# The LAION-style image-dedup step a training-data pipeline needs: a
# compact perceptual signature per image (robust to re-encode / resize /
# small edits, unlike content_sha1), then banded Hamming retrieval for
# candidate pairs.  Extension surface (the reference has no media path).
#
# aHash (mean threshold) and dHash (horizontal gradient) over an integer
# grayscale — every step is exact integer arithmetic (sum-of-channels
# luma, integer-stride nearest resize, strict-> threshold with ties -> 0)
# so signatures are bit-reproducible across machines, partitionings, and
# engines (q83's 'phash' leg recomputes them in closed form in DuckDB).
#
# Scale: hashing is map-only (mapInPandas, zero shuffle); pairing reuses
# the ≤60-bit pigeonhole band join from operators/dedup.py (recall
# exactly 1.0 for hamming <= bands-1, linear under the per-band bucket
# cap) — the same plan shape as the oracle-verified q29 simhash leg.

PHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("phash", T.LongType()),
])


def _hash_one_image(payload: bytes, method: str, th: int, tw: int,
                    nbits: int) -> tuple[int, int, int]:
    """Decode -> grayscale -> resize -> threshold-bits for ONE payload;
    returns (width, height, signature).

    Grayscale is the exact channel sum (0..765) — no division, so no
    rounding mode to mirror.  ``resize_nearest`` uses floor index maps
    (works as up- or downscale).  Bits pack row-major, first pixel most
    significant; nbits <= 60 keeps the signature in non-negative bigint
    range and inside the band join's contract.
    """
    import numpy as np

    from tradingview_data_pipeline_spark.operators import codecs

    arr = codecs.decode_ppm(payload)
    h, w = arr.shape[:2]
    g = arr.astype(np.int64).sum(axis=2)
    gr = codecs.resize_nearest(g, tw, th)
    if method == "ahash":
        bits = (gr * nbits > int(gr.sum())).reshape(-1)
    else:                                   # dhash
        bits = (gr[:, :-1] < gr[:, 1:]).reshape(-1)
    # vectorized MSB-first pack (identical to the per-bit shift fold:
    # val = Σ bits[i] << (n-1-i)); n <= 60 keeps every term and the sum
    # inside int64
    n = bits.size
    val = int((bits.astype(np.int64)
               << np.arange(n - 1, -1, -1, dtype=np.int64)).sum())
    return w, h, val


def _hash_image_batch(payloads, method: str, th: int, tw: int,
                      nbits: int) -> list[tuple[int, int, int]]:
    """Vectorized :func:`_hash_one_image` over MANY payloads (guide §4.2:
    hand whole Arrow batches to numpy instead of looping rows in Python).

    Payloads are grouped by decoded (w, h); each group decodes with ONE
    ``frombuffer`` over the joined pixel segments and hashes as a stacked
    ``(k, h, w, 3)`` tensor.  Every arithmetic step is the elementwise
    int64 twin of the single-image path (channel sum, floor-index resize,
    strict ``> mean`` / ``<`` neighbor threshold, MSB-first power-of-two
    pack), so signatures are BIT-IDENTICAL — pinned against
    ``_hash_one_image`` by ``tests/test_codecs.py``.  Measured on 20k
    (6,10,3) frames: 0.69 -> 0.12 s (5.8x); the per-payload Python that
    remains is the PPM header scan.

    Returns ``(width, height, signature)`` tuples aligned with input
    order.
    """
    import numpy as np

    from tradingview_data_pipeline_spark.operators import codecs

    groups: dict[tuple[int, int], list[tuple[int, bytes]]] = {}
    for i, p in enumerate(payloads):
        p = bytes(p)
        w, h, maxval, off = codecs._ppm_header(p)
        if maxval != 255:
            raise ValueError("only 8-bit PPM supported")
        groups.setdefault((w, h), []).append((i, p[off:off + w * h * 3]))
    out: list = [None] * sum(len(v) for v in groups.values())
    for (w, h), items in groups.items():
        k = len(items)
        data = np.frombuffer(b"".join(s for _, s in items), dtype=np.uint8)
        g = data.reshape(k, h, w, 3).astype(np.int64).sum(axis=3)
        rows = np.arange(th) * h // th          # resize_nearest's maps
        cols = np.arange(tw) * w // tw
        gr = g[:, rows][:, :, cols]
        if method == "ahash":
            sums = gr.reshape(k, -1).sum(axis=1)
            bits = (gr * nbits > sums[:, None, None]).reshape(k, -1)
        else:                                   # dhash
            bits = (gr[:, :, :-1] < gr[:, :, 1:]).reshape(k, -1)
        n = bits.shape[1]
        # Σ bits[i] * 2^(n-1-i) as one int64 matvec — the same fold as
        # _hash_one_image's shift form; n <= 60 keeps every term in range
        powers = (np.int64(1) << np.arange(n - 1, -1, -1, dtype=np.int64))
        vals = bits.astype(np.int64) @ powers
        for (i, _), v in zip(items, vals):
            out[i] = (w, h, int(v))
    return out


def _phash_nbits(method: str, th: int, tw: int) -> int:
    nbits = th * tw if method == "ahash" else th * (tw - 1)
    assert 0 < nbits <= 60, "grid must give 1..60 bits"
    return nbits


def _phash_batches(method: str, th: int, tw: int):
    nbits = _phash_nbits(method, th, tw)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            hashed = _hash_image_batch(list(b["payload"]),
                                       method, th, tw, nbits)
            yield pd.DataFrame({"media_id": list(b["media_id"]),
                                "width": [w for w, _, _ in hashed],
                                "height": [h for _, h, _ in hashed],
                                "phash": [v for _, _, v in hashed]})

    return run


def image_ahash(df: DataFrame, grid: tuple[int, int] = (6, 10)) -> DataFrame:
    """Average-hash signatures for PPM payloads: bit(y, x) = 1 iff the
    resized grayscale pixel strictly exceeds the grid mean
    (``g * nbits > sum(g)`` — exact integers, ties -> 0).  Default
    (6, 10) grid = 60 bits, matching ``simhash_candidate_pairs``'
    default signature width."""
    th, tw = grid
    return df.select("media_id", "payload").mapInPandas(
        _phash_batches("ahash", th, tw), PHASH_SCHEMA)


def image_dhash(df: DataFrame, grid: tuple[int, int] = (6, 11)) -> DataFrame:
    """Difference-hash signatures: bit(y, x) = 1 iff grayscale increases
    left-to-right between horizontally adjacent resized pixels.  Default
    (6, 11) grid = 6*10 = 60 bits."""
    th, tw = grid
    return df.select("media_id", "payload").mapInPandas(
        _phash_batches("dhash", th, tw), PHASH_SCHEMA)


def image_near_dups(hashes: DataFrame, *, id_col: str = "media_id",
                    hash_col: str = "phash", bits: int | None = None,
                    grid: tuple[int, int] | None = None,
                    method: str = "ahash",
                    bands: int = 4, max_hamming: int = 3,
                    max_bucket: int | None = None) -> DataFrame:
    """Candidate near-duplicate image pairs from perceptual-hash
    signatures: distinct (doc_a < doc_b, hamming) with Hamming distance
    <= ``max_hamming``, via the pigeonhole band join (recall exactly 1.0
    while ``max_hamming <= bands - 1``).  Delegates to
    ``dedup.simhash_candidate_pairs`` with precomputed signatures — one
    banded plan shape for text and image near-dup.

    ``bits`` must equal the signature width the hasher produced: a
    too-wide value gives every signature an all-zero top band chunk,
    which the bucket cap then drops wholesale — silently breaking the
    recall contract (round-11 advisor catch).  Pass ``grid`` (and
    ``method``) from the hashing call and the width is derived via
    ``_phash_nbits``; an explicit ``bits`` alongside ``grid`` must
    agree or this raises."""
    from tradingview_data_pipeline_spark.operators import dedup

    if grid is not None:
        derived = _phash_nbits(method, *grid)
        if bits is not None and bits != derived:
            raise ValueError(
                f"bits={bits} contradicts grid={grid}/method={method} "
                f"(signature width {derived})")
        bits = derived
    elif bits is None:
        bits = 60                       # the default (6,10)/(6,11) grids
    if max_bucket is None:
        max_bucket = dedup.LSH_MAX_BUCKET_DEFAULT
    sigs = hashes.select(F.col(id_col),
                         F.col(hash_col).cast("long").alias("simhash"))
    return dedup.simhash_candidate_pairs(
        hashes, id_col, text_col=id_col,   # unused: sigs provided
        bits=bits, bands=bands, max_hamming=max_hamming,
        max_bucket=max_bucket, sigs=sigs)

# --- video near-dup via frame-level perceptual hashes -----------------------

VIDEO_PHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("frame_hashes", T.ArrayType(T.LongType())),
])


def video_phash(df: DataFrame, grid: tuple[int, int] = (6, 10),
                method: str = "ahash",
                frames_col: str = "frames") -> DataFrame:
    """Per-frame perceptual hashes for videos stored as frame arrays
    (``array<binary>`` of PPM payloads — the honest representation this
    container can own: real decodes, no fake video demuxer).  Map-only
    mapInPandas; one signature per frame, order preserved."""
    th, tw = grid
    nbits = _phash_nbits(method, th, tw)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            # flatten the batch's frames into ONE vectorized hash call
            # (guide §4.2); counts re-slice the flat result per video
            ids, counts, flat = [], [], []
            for mid, frames in zip(b["media_id"], b[frames_col]):
                frames = list(frames) if frames is not None else []
                ids.append(mid); counts.append(len(frames))
                flat.extend(frames)
            hashed = _hash_image_batch(flat, method, th, tw, nbits)
            hs, pos = [], 0
            for c in counts:
                hs.append([v for _, _, v in hashed[pos:pos + c]])
                pos += c
            yield pd.DataFrame({"media_id": ids, "n_frames": counts,
                                "frame_hashes": hs})

    return df.select("media_id", F.col(frames_col).alias("frames")) \
             .mapInPandas(run, VIDEO_PHASH_SCHEMA)


def video_near_dups(vp: DataFrame, *, bits: int = 60, bands: int = 4,
                    max_hamming: int = 3, min_shared_frac: float = 0.5,
                    max_bucket: int | None = None) -> DataFrame:
    """Near-duplicate / clip-containment detection between videos from
    ``video_phash`` output: (vid_a < vid_b, frac_a, frac_b, n_matched)
    where ``frac_a`` is the fraction of a's DISTINCT frame positions
    whose hash is within ``max_hamming`` of some frame of b.

    Asymmetric by design (Broder containment, the q72 semantics): a
    short clip cut from a long video scores frac_clip = 1.0 while the
    long side stays low — filter on GREATEST(frac_a, frac_b) >=
    ``min_shared_frac``, which this function applies.

    Scale shape: explode to (frame_id, hash) — map-side — then the SAME
    pigeonhole band join as text SimHash on frame signatures (recall
    1.0 for d <= bands-1, per-band bucket cap), then one aggregate on
    the matched-pair stream keyed by the video pair.  No video-level
    all-pairs anywhere; cost is bounded by frame-hash collisions, not
    corpus size squared.
    """
    from tradingview_data_pipeline_spark.operators import dedup, pins

    if max_bucket is None:
        max_bucket = dedup.LSH_MAX_BUCKET_DEFAULT
    # vp feeds three consumers (frame explode on BOTH band-join sides +
    # the n_frames joins) that run in PARALLEL stages — a lazy persist
    # races and the per-frame decode pass runs up to three times
    # (measured 24.6 s vs 7 s single-pass at 40k frames). EAGER
    # DISK_ONLY checkpoint = one evaluation, the merge._pin_batch
    # pattern; tracked in the checkpoint registry (NOT release_all's,
    # whose lazy-recompute safety contract truncated lineage breaks)
    # so harnesses can free the blocks at query boundaries.
    vp = pins.checkpoint(vp)
    frames = vp.select(
        "media_id", "n_frames",
        F.posexplode("frame_hashes").alias("fidx", "fhash"))
    # '#' cannot appear before it in media_id? Keep the split robust:
    # encode position FIRST (fixed width) so the video id is recoverable
    # whatever characters it contains.
    fid = F.concat_ws("#", F.format_string("%09d", F.col("fidx")),
                      F.col("media_id"))
    sigs = frames.select(fid.alias("frame_id"),
                         F.col("fhash").alias("simhash"))
    pairs = dedup.simhash_candidate_pairs(
        sigs, "frame_id", text_col="frame_id",   # unused: sigs provided
        bits=bits, bands=bands, max_hamming=max_hamming,
        max_bucket=max_bucket, sigs=sigs)
    vid = lambda c: F.expr(f"substring({c}, 11)")          # noqa: E731
    pos = lambda c: F.expr(f"substring({c}, 1, 9)")        # noqa: E731
    cross = (pairs
             .select(vid("doc_a").alias("va"), pos("doc_a").alias("pa"),
                     vid("doc_b").alias("vb"), pos("doc_b").alias("pb"))
             .where(F.col("va") != F.col("vb"))
             .select(F.least("va", "vb").alias("vid_a"),
                     F.greatest("va", "vb").alias("vid_b"),
                     F.when(F.col("va") < F.col("vb"), F.col("pa"))
                      .otherwise(F.col("pb")).alias("pos_a"),
                     F.when(F.col("va") < F.col("vb"), F.col("pb"))
                      .otherwise(F.col("pa")).alias("pos_b")))
    matched = cross.groupBy("vid_a", "vid_b").agg(
        F.countDistinct("pos_a").alias("m_a"),
        F.countDistinct("pos_b").alias("m_b"),
        F.count(F.lit(1)).alias("n_matched"))
    counts = vp.select(F.col("media_id"), F.col("n_frames"))
    out = (matched
           .join(counts.withColumnRenamed("media_id", "vid_a")
                 .withColumnRenamed("n_frames", "nf_a"), "vid_a")
           .join(counts.withColumnRenamed("media_id", "vid_b")
                 .withColumnRenamed("n_frames", "nf_b"), "vid_b")
           .select("vid_a", "vid_b", "n_matched",
                   (F.col("m_a") / F.col("nf_a")).alias("frac_a"),
                   (F.col("m_b") / F.col("nf_b")).alias("frac_b")))
    return out.where(F.greatest("frac_a", "frac_b") >= F.lit(min_shared_frac))

# --- audio near-dup via spectral fingerprints (Haitsma-Kalker style) --------

AUDIO_FP_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("subfps", T.ArrayType(T.LongType())),
])


def audio_fingerprint(df: DataFrame, *, frame_len: int | None = 256,
                      hop: int | None = 128, n_bands: int = 33,
                      f_min: float = 300.0,
                      f_max: float = 3000.0) -> DataFrame:
    """Per-frame spectral subfingerprints for WAV PCM payloads — the
    Haitsma-Kalker (2002) construction: FFT magnitude per frame ->
    log-spaced band energies -> one bit per band pair from the SIGN of
    the time-and-band energy difference
    ``(E[n,m] - E[n,m+1]) - (E[n-1,m] - E[n-1,m+1]) > 0``.

    Signs are invariant to overall volume scaling (energies scale by
    c^2 uniformly), which is the robustness the fingerprint is for.
    Default 33 bands = 32 bits per frame, frame 0 has no predecessor so
    fingerprints start at frame 1.  Map-only mapInPandas; FFTs are
    numpy-vectorized over all frames of a clip at once.  Float FFT
    means bits near a zero difference are machine-stable but not
    oracle-expressible — evidence level is pytest, like the other
    iterative/float families (NOTES: logreg, BPE pattern).

    FFT resolution must give the 34 log-spaced band edges strictly
    increasing bin indices: at a fixed ``frame_len`` a higher sample
    rate widens each bin (rate/frame_len Hz) until adjacent edges
    collapse into the same bin, silently producing zero-width
    double-counted bands and low-entropy fingerprints (round-11
    advisor catch: 17 of 34 edges collapse at 44.1 kHz with
    frame_len=256).  Pass ``frame_len=None``/``hop=None`` to scale
    resolution with each clip's rate (power-of-2 multiple of 256/128,
    keeping ~32 ms frames); with explicit values, a clip whose rate
    collapses the edges fails loudly instead.
    """
    from tradingview_data_pipeline_spark.operators import codecs
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, ns, fps = [], [], []
            for mid, p in zip(b["media_id"], b["payload"]):
                samples, rate = codecs.decode_wav(p)
                x = samples.astype(np.float64)
                hi = min(f_max, 0.45 * rate)
                edges = f_min * (hi / f_min) ** (np.arange(n_bands + 1)
                                                 / n_bands)

                def band_bins(fl):
                    # rfft output has fl//2 + 1 bins; clip into [1, fl//2]
                    return np.clip((edges * fl / rate).astype(np.int64),
                                   1, fl // 2)

                if frame_len is None:
                    # auto: grow until the log-spaced edges land on
                    # strictly increasing bins without repair
                    flen = 256
                    while (flen < 1 << 20
                           and not np.all(np.diff(band_bins(flen)) > 0)):
                        flen *= 2
                else:
                    flen = frame_len
                bins = band_bins(flen)
                # Repair collided edges by bumping duplicates to the next
                # bin — zero-width bands would double-count one FFT bin
                # through reduceat and flatten fingerprint entropy (r11
                # advisor catch; even 8 kHz/256 collides one low-band
                # pair).  A repair may only round an edge UP one step
                # from its floor position — anything further would
                # silently redraw the log band geometry (the 44.1 kHz
                # failure mode), so that fails loudly instead.
                base = bins.copy()
                for i in range(1, len(bins)):
                    if bins[i] <= bins[i - 1]:
                        bins[i] = bins[i - 1] + 1
                if bins[-1] > flen // 2 or np.any(bins > base + 1):
                    raise ValueError(
                        f"band edges collapse at rate={rate} with "
                        f"frame_len={flen} ({len(np.unique(base))} of "
                        f"{len(base)} distinct FFT bins): raise "
                        f"frame_len or pass frame_len=None to "
                        f"auto-scale with the sample rate")
                fhop = (flen // 2) if hop is None else hop
                n_frames = max(0, (len(x) - flen) // fhop + 1)
                if n_frames < 2:
                    ids.append(mid); ns.append(0); fps.append([])
                    continue
                idx = (np.arange(n_frames)[:, None] * fhop
                       + np.arange(flen)[None, :])
                spec = np.abs(np.fft.rfft(x[idx], axis=1)) ** 2
                e = np.add.reduceat(spec, bins[:-1], axis=1)
                # reduceat gives [bins[m], bins[m+1]) except the last
                # slice runs to the end — trim it to the band edge
                tail = spec[:, bins[-1]:].sum(axis=1)
                e[:, -1] -= tail
                d = e[:, :-1] - e[:, 1:]                  # band pairs
                bits = (d[1:] - d[:-1]) > 0               # vs prev frame
                weights = (1 << np.arange(n_bands - 1, dtype=np.int64)
                           [::-1])
                vals = (bits.astype(np.int64) * weights).sum(axis=1)
                ids.append(mid); ns.append(len(vals))
                fps.append([int(v) for v in vals])
            yield pd.DataFrame({"media_id": ids, "n_frames": ns,
                                "subfps": fps})

    return df.select("media_id", "payload").mapInPandas(run, AUDIO_FP_SCHEMA)


def audio_near_dups(fps: DataFrame, *, min_shared_frac: float = 0.35,
                    max_bucket: int | None = None) -> DataFrame:
    """Near-duplicate audio pairs from ``audio_fingerprint`` output:
    (vid_a < vid_b, n_matched, frac_a, frac_b) where frac is the
    fraction of a clip's DISTINCT frame positions whose 32-bit
    subfingerprint matches SOME frame of the other clip EXACTLY — the
    H-K lookup-table method (robustness comes from needing only a
    fraction of frames to survive bit flips, not from fuzzy matching).

    Scale shape: explode -> equi-join on the subfingerprint value ->
    one aggregate per clip pair.  ``max_bucket`` drops degenerate
    subfingerprints first (all-silence frames hash to 0 and would
    otherwise pair every quiet clip quadratically) — same guard and
    default as the LSH/banding family.
    """
    from pyspark import StorageLevel

    from tradingview_data_pipeline_spark.operators import dedup, pins

    if max_bucket is None:
        max_bucket = dedup.LSH_MAX_BUCKET_DEFAULT
    fps = pins.track(fps.persist(StorageLevel.DISK_ONLY))
    frames = fps.select(
        "media_id",
        F.posexplode("subfps").alias("fidx", "subfp"))
    over = (frames.groupBy("subfp")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > max_bucket)
            .select("subfp"))
    frames = frames.join(F.broadcast(over), "subfp", "left_anti")
    a = frames.alias("a")
    b = frames.alias("b")
    cross = (a.join(b, (F.col("a.subfp") == F.col("b.subfp"))
                    & (F.col("a.media_id") < F.col("b.media_id")))
             .select(F.col("a.media_id").alias("vid_a"),
                     F.col("a.fidx").alias("pos_a"),
                     F.col("b.media_id").alias("vid_b"),
                     F.col("b.fidx").alias("pos_b"))
             .distinct())
    matched = cross.groupBy("vid_a", "vid_b").agg(
        F.countDistinct("pos_a").alias("m_a"),
        F.countDistinct("pos_b").alias("m_b"),
        F.count(F.lit(1)).alias("n_matched"))
    counts = fps.select("media_id", "n_frames")
    out = (matched
           .join(counts.withColumnRenamed("media_id", "vid_a")
                 .withColumnRenamed("n_frames", "nf_a"), "vid_a")
           .join(counts.withColumnRenamed("media_id", "vid_b")
                 .withColumnRenamed("n_frames", "nf_b"), "vid_b")
           .select("vid_a", "vid_b", "n_matched",
                   (F.col("m_a") / F.col("nf_a")).alias("frac_a"),
                   (F.col("m_b") / F.col("nf_b")).alias("frac_b")))
    return out.where(F.greatest("frac_a", "frac_b") >= F.lit(min_shared_frac))

# --- end-to-end media dedup (exact -> perceptual -> components -> keeper) ---


def media_dedup(df: DataFrame, *, grid: tuple[int, int] = (6, 10),
                method: str = "ahash", bands: int = 4,
                max_hamming: int = 3,
                max_bucket: int | None = None) -> DataFrame:
    """Image-corpus deduplication pipeline (the run_corpus_prep shape
    for media): (media_id, cluster_id, keep) with exactly one keeper —
    the minimum media_id — per duplicate cluster.

    Stage order matters at crawl scale:

    1. **Exact first** (sha2-256 over payload bytes, one hash agg):
       byte-identical copies collapse to their min-id representative
       BEFORE any decode.  A viral image duplicated millions of times
       would otherwise flood one perceptual-hash band bucket — the
       bucket cap would drop it, exactly the failure mode the simhash
       docstring warns about (catch exact dups with exact dedup, which
       has no quadratic path).  Only representatives pay the decode.
    2. **Perceptual near-dup on representatives** (``image_ahash`` /
       ``image_dhash`` -> ``image_near_dups`` banded Hamming join).
    3. **Connected components** over the pair set (tiny, pair-bounded)
       -> cluster_id = min media_id in the component; sha-group members
       inherit their representative's cluster, so the keeper is the
       global min id across exact AND perceptual duplicates.

    All ids keep their row; callers filter ``keep`` (the quality-gate
    convention).  min-id on string ids is lexicographic — zero-pad ids
    if numeric order matters.

    Substrate plan (round-12 fix of the r11 weak flag): sha2 runs over
    payload bytes EXACTLY ONCE — the tiny (media_id, __sha) projection
    is pinned (the q80 substrate rule) and both the group structure and
    the final membership join derive from the pin.  The r11 form
    re-selected from the unpinned ``with_sha`` for the membership join
    (second full-corpus read + second sha pass) and fanned
    ``first(payload)`` through the sha groupBy (~full-corpus payload
    shuffle whenever dup rate is low).  Now payload bytes never ride an
    aggregation shuffle; representatives re-attach bytes via a semi
    join on rep ids, where AQE self-selects the regime — viral corpora
    have few reps, so the rep side broadcasts and the payload side
    never shuffles; low-dup corpora pay one payload shuffle, the same
    volume the old groupBy moved.  The second payload *scan* is the
    deliberate price: the one-scan alternatives either persist the
    payload corpus to disk or collect_list members through a skewed
    agg (unbounded row under a viral image).
    """
    from pyspark import StorageLevel

    from tradingview_data_pipeline_spark.operators import dedup, pins

    ids_sha = pins.track(
        df.select("media_id", F.sha2(F.col("payload"), 256).alias("__sha"))
        .persist(StorageLevel.DISK_ONLY))
    groups = ids_sha.groupBy("__sha").agg(F.min("media_id").alias("rep_id"))

    reps = (df.select("media_id", "payload")
            .join(groups.select(F.col("rep_id").alias("media_id")),
                  "media_id", "left_semi"))
    hasher = image_ahash if method == "ahash" else image_dhash
    hashes = hasher(reps, grid=grid)
    pairs = image_near_dups(hashes, grid=grid, method=method, bands=bands,
                            max_hamming=max_hamming, max_bucket=max_bucket)
    comp = dedup.connected_components(
        pairs.select("doc_a", "doc_b"))           # (doc_id, cluster_id)

    rep_cluster = (groups
                   .join(comp.withColumnRenamed("doc_id", "rep_id"),
                         "rep_id", "left")
                   .select("__sha",
                           F.coalesce("cluster_id", "rep_id")
                           .alias("cluster_id")))
    return (ids_sha.join(rep_cluster, "__sha")
            .select("media_id", "cluster_id",
                    (F.col("media_id") == F.col("cluster_id"))
                    .alias("keep")))

def audio_near_dups_ber(fps: DataFrame, *, max_ber: float = 0.35,
                        min_overlap: int = 32, n_bits: int = 32,
                        best_per_pair: bool = True,
                        max_bucket: int | None = None) -> DataFrame:
    """Block-BER audio matching — the FULL Haitsma-Kalker search, closing
    the boundary ``audio_near_dups`` documents (SCALING addendum 32):
    additive fresh noise flips ~6/32 bits per frame, so exact-join
    matching finds nothing, but the bit-error-rate over an ALIGNED run
    of frames stays far below 0.5.

    Three stages, all corpus-linear:

    1. **Anchor probing** (H-K's lookup strategy distributed): each
       frame probes its subfingerprint plus all 32 one-bit flips
       against the stored exact table — an anchor exists wherever two
       clips share a frame within Hamming <= 1.  33x row amplification
       on the probe side, plain equi-join, no fuzzy bucketing (byte
       chunks of 32-bit words have 256-bucket entropy and go quadratic
       at corpus scale — measured class, q84 docstring).
    2. **Alignment candidates**: anchors dedup to distinct
       (vid_a, vid_b, offset) — offset = pos_b − pos_a, so a clip cut
       from a longer recording at ANY frame offset aligns (exact-join
       matching also lacked this).
    3. **BER verify**: one JVM-side ``aggregate`` over the aligned
       overlap (arrays fetched from the pinned fingerprint table —
       no per-frame shuffle), accept if mean ``bit_count(xor)``/32
       <= ``max_ber`` over >= ``min_overlap`` frames.

    Recall is bounded by anchor existence: P(a frame survives with
    <= 1 flip) at ~6-flip noise is ~2%, so a 126-frame clip anchors
    with ~92% probability — the classic H-K trade, documented not
    hidden.  ``min_overlap`` is the other dial: short chance
    alignments between structurally-similar clips can sit just under
    ``max_ber`` (measured: overlap-8..19 edge alignments at BER
    0.30-0.35 between unrelated swept-tone clips; zero at overlap 32
    — H-K's own 256-frame blocks make the same trade), so the default
    requires 32 aligned frames (~0.5 s) and bounds the shortest
    detectable clip.  Returns (vid_a, vid_b, offset, n_overlap, ber); with
    ``best_per_pair`` only the lowest-BER alignment per pair survives.
    ``max_bucket`` drops degenerate subfingerprints on BOTH join sides
    (silence -> 0) before probing.  ``n_bits`` is the subfingerprint
    width — it sizes both the one-bit-flip probe fan-out and the BER
    denominator, and must equal ``audio_fingerprint``'s ``n_bands - 1``
    (round-11 advisor catch: the old hardcoded 32 silently mis-scored
    fingerprints built with non-default band counts).
    """
    from tradingview_data_pipeline_spark.operators import dedup, pins

    if max_bucket is None:
        max_bucket = dedup.LSH_MAX_BUCKET_DEFAULT
    fps = pins.checkpoint(fps)
    frames = fps.select(
        "media_id", F.posexplode("subfps").alias("fidx", "subfp"))
    over = (frames.groupBy("subfp")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > max_bucket)
            .select("subfp"))
    frames = frames.join(F.broadcast(over), "subfp", "left_anti")

    probes = frames.select(
        "media_id", "fidx",
        F.explode(F.expr(
            "concat(array(subfp), "
            f"transform(sequence(0, {n_bits - 1}), "
            "b -> subfp ^ shiftleft(CAST(1 AS BIGINT), b)))"
        )).alias("probe"))
    anchors = (probes.alias("a")
               .join(frames.alias("b"),
                     (F.col("a.probe") == F.col("b.subfp"))
                     & (F.col("a.media_id") < F.col("b.media_id")))
               .select(F.col("a.media_id").alias("vid_a"),
                       F.col("b.media_id").alias("vid_b"),
                       (F.col("b.fidx") - F.col("a.fidx")).alias("offset"))
               .distinct())

    arrs = fps.select("media_id", "n_frames", "subfps")
    cand = (anchors
            .join(arrs.withColumnRenamed("media_id", "vid_a")
                  .withColumnRenamed("n_frames", "nf_a")
                  .withColumnRenamed("subfps", "fa"), "vid_a")
            .join(arrs.withColumnRenamed("media_id", "vid_b")
                  .withColumnRenamed("n_frames", "nf_b")
                  .withColumnRenamed("subfps", "fb"), "vid_b"))
    # aligned overlap: positions i of a with 0 <= i < nf_a and
    # 0 <= i+offset < nf_b; element_at is 1-based
    lo = F.greatest(F.lit(0), -F.col("offset"))
    hi = F.least(F.col("nf_a") - 1, F.col("nf_b") - 1 - F.col("offset"))
    n_overlap = (hi - lo + 1)
    ber_sum = F.expr(
        "aggregate(sequence(__lo, __hi), CAST(0 AS BIGINT), (acc, i) -> "
        "acc + bit_count(element_at(fa, i + 1) ^ "
        "element_at(fb, i + 1 + offset)))")
    scored = (cand
              .withColumn("__lo", lo).withColumn("__hi", hi)
              .where(n_overlap >= F.lit(min_overlap))
              .withColumn("n_overlap", n_overlap)
              .withColumn("ber", ber_sum
                          / (F.lit(float(n_bits)) * F.col("n_overlap")))
              .where(F.col("ber") <= F.lit(max_ber))
              .select("vid_a", "vid_b", "offset", "n_overlap", "ber"))
    if best_per_pair:
        scored = (scored.groupBy("vid_a", "vid_b")
                  .agg(F.min_by(
                      F.struct("offset", "n_overlap", "ber"),
                      F.struct("ber", "offset")).alias("__best"))
                  .select("vid_a", "vid_b", "__best.offset",
                          "__best.n_overlap", "__best.ber"))
    return scored
