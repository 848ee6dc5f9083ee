"""Real-codec tests: PPM P6 and WAV PCM round trips, resize geometry,
feature determinism, and the Spark mapInPandas stages end-to-end
(including `register_decoder` with the real PPM decoder)."""

import numpy as np
import pytest

from tradingview_data_pipeline_spark.operators import codecs, multimodal


def gradient_image(w=40, h=20):
    x = np.linspace(0, 255, w, dtype=np.uint8)
    img = np.stack([np.tile(x, (h, 1))] * 3, axis=2)
    img[:, :, 1] = img[::-1, :, 1]
    return img


# --- PPM -------------------------------------------------------------------

def test_ppm_round_trip_and_comments():
    img = gradient_image()
    payload = codecs.encode_ppm(img)
    assert np.array_equal(codecs.decode_ppm(payload), img)
    # header with comments and odd whitespace still parses
    commented = b"P6\n# a comment\n 40\t20 # trailing\n255\n" + img.tobytes()
    assert np.array_equal(codecs.decode_ppm(commented), img)
    with pytest.raises(ValueError):
        codecs.decode_ppm(b"P5\n1 1\n255\n\x00")


def test_resize_nearest_geometry_and_identity():
    img = gradient_image(64, 32)
    small = codecs.resize_nearest(img, 16, 8)
    assert small.shape == (8, 16, 3)
    # nearest-neighbor picks exact source pixels
    assert all(px in img.reshape(-1, 3).tolist()
               for px in small.reshape(-1, 3).tolist()[:8])
    same = codecs.resize_nearest(img, 64, 32)
    assert np.array_equal(same, img)


def test_thumb_feature_flat_image_uniform():
    flat = np.full((32, 32, 3), 128, dtype=np.uint8)
    feat = codecs.thumb_feature(flat)
    assert len(feat) == 16
    assert all(abs(f - 128 / 255) < 1e-12 for f in feat)


# --- WAV -------------------------------------------------------------------

def test_wav_round_trip_and_extra_chunks():
    rate = 8000
    t = np.arange(rate) / rate
    samples = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    payload = codecs.encode_wav(samples, rate)
    got, got_rate = codecs.decode_wav(payload)
    assert got_rate == rate and np.array_equal(got, samples)
    # tolerate an extra LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = payload[:fmt_end] + b"LIST\x04\x00\x00\x00INFO" + payload[fmt_end:]
    head = b"RIFF" + np.uint32(len(extra) - 8).tobytes() + extra[8:]
    got2, _ = codecs.decode_wav(head)
    assert np.array_equal(got2, samples)


def test_frame_rms_constant_signal():
    samples = np.full(8000, 16384, dtype=np.int16)
    rms = codecs.frame_rms(samples, n_frames=4)
    assert len(rms) == 4
    assert all(abs(r - 0.5) < 1e-9 for r in rms)
    assert codecs.frame_rms(np.array([], dtype=np.int16)) == [0.0] * 8


# --- Spark stages ----------------------------------------------------------

def _media_df(spark, rows):
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_resize_images_spark(spark):
    img_big = gradient_image(512, 256)
    img_small = gradient_image(100, 50)
    df = _media_df(spark, [
        ("a", "image", "image/x-portable-pixmap", codecs.encode_ppm(img_big),
         (512, 256, None, None)),
        ("b", "image", "image/x-portable-pixmap", codecs.encode_ppm(img_small),
         (100, 50, None, None)),
    ])
    out = {r["media_id"]: r for r in
           multimodal.resize_images(df, max_side=256).collect()}
    assert (out["a"]["width"], out["a"]["height"]) == (256, 128)
    # small image untouched, payload byte-identical
    assert (out["b"]["width"], out["b"]["height"]) == (100, 50)
    assert bytes(out["b"]["payload"]) == codecs.encode_ppm(img_small)
    resized = codecs.decode_ppm(bytes(out["a"]["payload"]))
    assert np.array_equal(resized, codecs.resize_nearest(img_big, 256, 128))


def test_extract_audio_features_spark(spark):
    rate = 8000
    quiet = np.full(rate, 1000, dtype=np.int16)     # 1 s
    loud = np.full(rate * 2, 20000, dtype=np.int16)  # 2 s
    df = _media_df(spark, [
        ("q", "audio", "audio/wav", codecs.encode_wav(quiet, rate),
         (None, None, 1000, rate)),
        ("l", "audio", "audio/wav", codecs.encode_wav(loud, rate),
         (None, None, 2000, rate)),
    ])
    out = {r["media_id"]: r for r in
           multimodal.extract_audio_features(df).collect()}
    assert out["q"]["duration_ms"] == 1000 and out["l"]["duration_ms"] == 2000
    assert out["l"]["rms_frames"][0] > out["q"]["rms_frames"][0]
    assert len(out["q"]["rms_frames"]) == 8


def test_register_real_ppm_decoder_feature_pipeline(spark):
    img = gradient_image(32, 32)
    df = _media_df(spark, [
        ("img1", "image", "image/x-portable-pixmap", codecs.encode_ppm(img),
         (32, 32, None, None))])
    multimodal.register_decoder(codecs.ppm_image_decoder)
    try:
        row = multimodal.extract_image_features(df).collect()[0]
    finally:
        multimodal.register_decoder(multimodal._fake_decode)
    assert (row["width"], row["height"]) == (32, 32)
    expected = codecs.thumb_feature(img)
    assert np.allclose(row["feature"], expected, atol=1e-6)


# --- perceptual hashing (image near-dup) ------------------------------------

def _ref_phash(arr, method, th, tw):
    """Independent pure-python reference for the signature definition."""
    h, w = arr.shape[:2]
    g = [[int(arr[y][x][0]) + int(arr[y][x][1]) + int(arr[y][x][2])
          for x in range(w)] for y in range(h)]
    gr = [[g[y * h // th][x * w // tw] for x in range(tw)] for y in range(th)]
    bits = []
    if method == "ahash":
        total = sum(sum(row) for row in gr)
        n = th * tw
        for y in range(th):
            for x in range(tw):
                bits.append(1 if gr[y][x] * n > total else 0)
    else:
        for y in range(th):
            for x in range(tw - 1):
                bits.append(1 if gr[y][x] < gr[y][x + 1] else 0)
    val = 0
    for b in bits:
        val = (val << 1) | b
    return val


def _phash_media_df(spark, arrays):
    rows = [(f"m{i}", codecs.encode_ppm(a)) for i, a in enumerate(arrays)]
    return spark.createDataFrame(rows, "media_id string, payload binary")


def test_image_hashes_match_python_reference(spark):
    rng = np.random.RandomState(7)
    arrays = [
        gradient_image(40, 20),
        gradient_image(9, 5),                        # upscale path (h < grid)
        rng.randint(0, 256, (17, 31, 3)).astype(np.uint8),
        np.full((8, 8, 3), 128, dtype=np.uint8),     # constant: all ties -> 0
    ]
    df = _phash_media_df(spark, arrays).repartition(3)
    got_a = {r["media_id"]: r["phash"]
             for r in multimodal.image_ahash(df).collect()}
    got_d = {r["media_id"]: r["phash"]
             for r in multimodal.image_dhash(df).collect()}
    for i, a in enumerate(arrays):
        assert got_a[f"m{i}"] == _ref_phash(a, "ahash", 6, 10), i
        assert got_d[f"m{i}"] == _ref_phash(a, "dhash", 6, 11), i
    assert got_a["m3"] == 0 and got_d["m3"] == 0     # strict >/< : ties off
    # width/height report the SOURCE dims
    row = multimodal.image_ahash(df).where("media_id = 'm1'").first()
    assert (row["width"], row["height"]) == (9, 5)


def test_image_hash_repartition_invariance(spark):
    arrays = [gradient_image(30 + i, 14 + i) for i in range(6)]
    df = _phash_media_df(spark, arrays)
    one = sorted((r["media_id"], r["phash"])
                 for r in multimodal.image_ahash(df.coalesce(1)).collect())
    many = sorted((r["media_id"], r["phash"])
                  for r in multimodal.image_ahash(df.repartition(7)).collect())
    assert one == many


def test_image_near_dups_banded_retrieval(spark):
    base = gradient_image(48, 24)
    near = base.copy()
    near[3, 5] = near[3, 5] // 2        # small edit: few resized cells move
    near[20, 40] = 255 - near[20, 40]
    inverted = 255 - base               # structurally different image
    df = _phash_media_df(spark, [base, near, inverted])
    hashes = multimodal.image_ahash(df)
    hmap = {r["media_id"]: r["phash"] for r in hashes.collect()}
    d_near = bin(hmap["m0"] ^ hmap["m1"]).count("1")
    d_far = bin(hmap["m0"] ^ hmap["m2"]).count("1")
    assert d_near <= 3 < d_far          # the planted geometry the test needs
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in multimodal.image_near_dups(hashes).collect()}
    assert ("m0", "m1") in pairs and pairs[("m0", "m1")] == d_near
    assert ("m0", "m2") not in pairs and ("m1", "m2") not in pairs
    # recall-1.0 contract: the pair survives at exactly its distance
    tight = multimodal.image_near_dups(hashes, max_hamming=max(d_near, 1))
    assert ("m0", "m1") in {(r["doc_a"], r["doc_b"]) for r in tight.collect()}


def test_video_phash_and_clip_containment(spark):
    rng = np.random.RandomState(11)
    frames_a = [rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
                for _ in range(8)]
    # b: a near-copy of a's frames (tiny edits) plus 2 unrelated frames
    frames_b = [f.copy() for f in frames_a]
    for f in frames_b:
        f[3, 5] = f[3, 5] // 2
    frames_b += [rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
                 for _ in range(2)]
    frames_c = [rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
                for _ in range(6)]
    rows = [(vid, [codecs.encode_ppm(f) for f in fr])
            for vid, fr in (("va", frames_a), ("vb", frames_b),
                            ("vc", frames_c))]
    df = spark.createDataFrame(
        rows, "media_id string, frames array<binary>").repartition(3)

    vp = multimodal.video_phash(df)
    got = {r["media_id"]: r for r in vp.collect()}
    assert got["va"]["n_frames"] == 8 and got["vb"]["n_frames"] == 10
    # frame hashes == per-image ahash of the same payloads
    singles = multimodal.image_ahash(_phash_media_df(spark, frames_a))
    expect = [r["phash"] for r in singles.orderBy("media_id").collect()]
    assert list(got["va"]["frame_hashes"]) == expect

    pairs = {(r["vid_a"], r["vid_b"]): r
             for r in multimodal.video_near_dups(vp).collect()}
    assert set(pairs) == {("va", "vb")}
    p = pairs[("va", "vb")]
    assert p["frac_a"] == 1.0                  # clip fully contained
    assert abs(p["frac_b"] - 0.8) < 1e-12      # 8 of b's 10 frames match
    # symmetric containment threshold: 1.0 >= 0.5 kept even though b
    # alone is 0.8; raising past 1.0 drops everything
    none = multimodal.video_near_dups(vp, min_shared_frac=1.01).collect()
    assert none == []


def _song(seed, n=16384, rate=8000):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / rate
    x = np.zeros(n)
    for f0, f1, amp in [(400, 900, 8000), (1200, 600, 6000),
                        (2000, 2400, 4000)]:
        f = f0 + (f1 - f0) * t / t[-1] + rng.uniform(-5, 5)
        x += amp * np.sin(2 * np.pi * np.cumsum(f) / rate)
    x += rng.normal(0, 200, n)
    return np.clip(x, -32768, 32767).astype(np.int16)


def test_audio_fingerprint_and_near_dups(spark):
    rate = 8000
    a = _song(1)
    half = (a.astype(np.int32) // 2).astype(np.int16)   # volume-scaled copy
    other = _song(2)
    rows = [(mid, codecs.encode_wav(s, rate))
            for mid, s in (("a", a), ("a_half", half), ("other", other))]
    df = spark.createDataFrame(
        rows, "media_id string, payload binary").repartition(3)

    fps = multimodal.audio_fingerprint(df)
    got = {r["media_id"]: r for r in fps.collect()}
    assert got["a"]["n_frames"] == 126          # (16384-256)//128 + 1 - 1
    assert all(0 <= v < 2**32 for v in got["a"]["subfps"])
    # volume invariance: the two fingerprints agree on >90% of frames
    same = sum(1 for x, y in zip(got["a"]["subfps"], got["a_half"]["subfps"])
               if x == y)
    assert same / 126 > 0.9

    pairs = {(r["vid_a"], r["vid_b"]): r
             for r in multimodal.audio_near_dups(fps).collect()}
    assert set(pairs) == {("a", "a_half")}
    assert pairs[("a", "a_half")]["frac_a"] > 0.9
    # repartition invariance of the fingerprints themselves
    again = {r["media_id"]: list(r["subfps"])
             for r in multimodal.audio_fingerprint(df.coalesce(1)).collect()}
    assert again["a"] == list(got["a"]["subfps"])


def test_audio_near_dups_silence_bucket_guard(spark):
    rate = 8000
    silence = np.zeros(16384, dtype=np.int16)
    rows = [(f"s{i}", codecs.encode_wav(silence, rate)) for i in range(4)]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    fps = multimodal.audio_fingerprint(df)
    # every frame of every clip shares subfp 0 -> the degenerate bucket:
    # with the cap it pairs nothing instead of quadratically matching
    # all quiet clips
    assert multimodal.audio_near_dups(fps, max_bucket=100).collect() == []
    # short clips (< 2 frames) fingerprint to empty, never pair
    tiny = spark.createDataFrame(
        [("t", codecs.encode_wav(np.zeros(64, dtype=np.int16), rate))],
        "media_id string, payload binary")
    row = multimodal.audio_fingerprint(tiny).first()
    assert row["n_frames"] == 0 and list(row["subfps"]) == []


def test_media_dedup_exact_then_perceptual(spark):
    base = gradient_image(48, 24)
    near = base.copy()
    near[3, 5] = near[3, 5] // 2
    other = 255 - base
    # viral must be structurally distinct from base: a same-size
    # gradient would hash near-identical (the scale-invariance working)
    viral = np.random.RandomState(3).randint(
        0, 256, (30, 40, 3)).astype(np.uint8)
    viral_near = viral.copy()
    viral_near[7, 11] = viral_near[7, 11] // 3
    rows = [("m01", base), ("m02", base), ("m03", base),   # exact copies
            ("m04", near),                                 # perceptual dup
            ("m05", other)]                                # unrelated
    # a 'viral' image: 40 exact copies + 1 near-copy, bucket cap 5 —
    # the exact stage must collapse them BEFORE banding or the cap
    # would drop the whole family
    rows += [(f"v{i:02d}", viral) for i in range(1, 41)]
    rows += [("v41", viral_near)]
    df = spark.createDataFrame(
        [(mid, codecs.encode_ppm(a)) for mid, a in rows],
        "media_id string, payload binary").repartition(5)

    out = {r["media_id"]: r for r in
           multimodal.media_dedup(df, max_bucket=5).collect()}
    assert len(out) == len(rows)                    # every id keeps a row
    m_cluster = {out[f"m{i:02d}"]["cluster_id"] for i in range(1, 5)}
    assert m_cluster == {"m01"}                     # exact ∪ perceptual
    assert out["m05"]["cluster_id"] == "m05"        # isolated: own cluster
    v_cluster = {out[f"v{i:02d}"]["cluster_id"] for i in range(1, 42)}
    assert v_cluster == {"v01"}                     # survived the cap
    keepers = sorted(mid for mid, r in out.items() if r["keep"])
    assert keepers == ["m01", "m05", "v01"]


def test_audio_ber_matching_noise_and_shift(spark):
    rate = 8000
    a = _song(21)
    rng = np.random.RandomState(5)
    # additive FRESH noise at half volume — the exact-join matcher's
    # documented blind spot (addendum 32)
    noisy = np.clip(0.5 * a.astype(np.float64)
                    + rng.normal(0, 50, len(a)),
                    -32768, 32767).astype(np.int16)
    # time-shifted clip: the tail of a, cut at a frame boundary
    shifted = a[128 * 40:]
    other = _song(22)
    rows = [(mid, codecs.encode_wav(s, rate))
            for mid, s in (("a", a), ("noisy", noisy),
                           ("shift", shifted), ("other", other))]
    df = spark.createDataFrame(
        rows, "media_id string, payload binary").repartition(2)
    fps = multimodal.audio_fingerprint(df)

    # exact-join matcher misses the noisy copy entirely...
    exact_pairs = {(r["vid_a"], r["vid_b"])
                   for r in multimodal.audio_near_dups(fps).collect()}
    assert ("a", "noisy") not in exact_pairs
    # ...block-BER finds it, plus the shifted clip at its exact offset
    got = {(r["vid_a"], r["vid_b"]): r
           for r in multimodal.audio_near_dups_ber(fps).collect()}
    assert ("a", "noisy") in got
    p = got[("a", "noisy")]
    assert p["offset"] == 0 and p["ber"] < 0.3
    assert ("a", "shift") in got
    s = got[("a", "shift")]
    assert s["offset"] == -40 and s["ber"] == 0.0   # bit-identical overlap
    assert not any("other" in k for k in got)       # unrelated stays out


# --- round-12 hardening (r11 verdict task 2 + advisor catches) -------------

def test_media_dedup_single_sha_substrate(spark):
    """The r11 weak flag: payload must be hashed ONCE — every sha2 in
    the executed plan sits inside a cached-relation scan of the pinned
    (media_id, __sha) substrate, never recomputed over the corpus."""
    from tradingview_data_pipeline_spark.operators import pins

    base = np.random.RandomState(3).randint(
        0, 256, (20, 30, 3)).astype(np.uint8)
    rows = [("m1", base), ("m2", base), ("m3", 255 - base)]
    df = spark.createDataFrame(
        [(m, codecs.encode_ppm(a)) for m, a in rows],
        "media_id string, payload binary")
    out = multimodal.media_dedup(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # each sha2 occurrence is the cached plan printed under an
    # InMemoryTableScan — zero sha2 outside the pin means zero
    # recomputation; and payload feeds no aggregation exchange
    assert plan.count("sha2") == plan.count("InMemoryTableScan") > 0
    got = {r["media_id"]: r for r in out.collect()}
    assert got["m2"]["cluster_id"] == "m1" and not got["m2"]["keep"]
    assert got["m3"]["keep"]
    pins.release_all()


def test_checkpoint_registry_releases_blocks(spark):
    """pins.checkpoint tracks localCheckpoint blocks for deterministic
    release at query boundaries (r11 advisor catch: untracked media
    checkpoints accumulated disk blocks until context GC)."""
    from tradingview_data_pipeline_spark.operators import pins

    sc = spark.sparkContext
    pins.release_checkpoints()          # clean slate
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    ck = pins.checkpoint(spark.range(10000).selectExpr("id", "id * 2 AS v"))
    assert ck.count() == 10000
    after = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    assert len(after - before) == 1     # exactly the checkpoint's blocks
    assert pins.release_checkpoints() == 1
    now = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    assert now - before == set()
    assert pins.release_checkpoints() == 0   # idempotent


def test_audio_fingerprint_band_collapse_guard(spark):
    """44.1 kHz at frame_len=256 cannot hold 34 distinct band edges:
    explicit frame_len fails loudly; frame_len=None auto-scales."""
    rate = 44100
    rng = np.random.RandomState(7)
    samples = rng.randint(-8000, 8000, 4 * 4096).astype(np.int16)
    df = spark.createDataFrame(
        [("hi", codecs.encode_wav(samples, rate))],
        "media_id string, payload binary")
    with pytest.raises(Exception, match="band edges collapse"):
        multimodal.audio_fingerprint(df).collect()
    row = multimodal.audio_fingerprint(df, frame_len=None, hop=None).first()
    assert row["n_frames"] > 0
    assert all(0 <= v < 2 ** 32 for v in row["subfps"])
    # auto resolution is deterministic in the clip alone: same result
    # at a different partitioning
    again = multimodal.audio_fingerprint(
        df.repartition(3), frame_len=None, hop=None).first()
    assert list(again["subfps"]) == list(row["subfps"])


def test_image_near_dups_bits_follow_grid(spark):
    """A non-default grid must drive the band width (r11 advisor catch:
    bits=60 over 40-bit signatures gives every signature an all-zero
    top chunk that the bucket cap then drops wholesale)."""
    base = gradient_image(40, 20)
    near = base.copy()
    near[3, 5] = near[3, 5] // 2
    far = 255 - base
    df = spark.createDataFrame(
        [(m, codecs.encode_ppm(a))
         for m, a in (("m0", base), ("m1", near), ("m2", far))],
        "media_id string, payload binary")
    hashes = multimodal.image_ahash(df, grid=(4, 10))       # 40 bits
    pairs = multimodal.image_near_dups(hashes, grid=(4, 10), max_bucket=2)
    assert {(r["doc_a"], r["doc_b"]) for r in pairs.collect()} == {
        ("m0", "m1")}
    with pytest.raises(ValueError, match="contradicts"):
        multimodal.image_near_dups(hashes, grid=(4, 10), bits=60)


def test_audio_ber_nbits_parameterized(spark):
    """Non-default band counts flow through the BER matcher (r11
    advisor catch: hardcoded 32 mis-scored 16-bit fingerprints)."""
    rate = 8000
    a = _song(31)
    shifted = a[128 * 24:]
    rows = [(m, codecs.encode_wav(s, rate))
            for m, s in (("a", a), ("shift", shifted))]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    fps = multimodal.audio_fingerprint(df, n_bands=17)      # 16-bit subfps
    assert all(0 <= v < 2 ** 16
               for r in fps.collect() for v in r["subfps"])
    got = {(r["vid_a"], r["vid_b"]): r
           for r in multimodal.audio_near_dups_ber(fps, n_bits=16).collect()}
    assert ("a", "shift") in got
    s = got[("a", "shift")]
    assert s["offset"] == -24 and s["ber"] == 0.0


def test_hash_image_batch_equals_per_image_loop():
    """The r12 vectorized batch hasher must be bit-identical to the
    single-image reference on mixed shapes, mixed methods, and the
    upscale/constant/tie edge cases — same integer ops, stacked."""
    rng = np.random.RandomState(23)
    arrays = [
        gradient_image(40, 20),
        gradient_image(9, 5),                        # upscale (h < grid)
        rng.randint(0, 256, (17, 31, 3)).astype(np.uint8),
        np.full((8, 8, 3), 128, dtype=np.uint8),     # constant: ties -> 0
        rng.randint(0, 256, (17, 31, 3)).astype(np.uint8),  # repeat shape
        rng.randint(0, 256, (6, 10, 3)).astype(np.uint8),   # 1:1 grid
    ]
    payloads = [codecs.encode_ppm(a) for a in arrays]
    for method, th, tw in (("ahash", 6, 10), ("dhash", 6, 11)):
        nbits = multimodal._phash_nbits(method, th, tw)
        ref = [multimodal._hash_one_image(p, method, th, tw, nbits)
               for p in payloads]
        got = multimodal._hash_image_batch(payloads, method, th, tw, nbits)
        assert got == ref, method
    assert multimodal._hash_image_batch([], "ahash", 6, 10, 60) == []


def test_vpix_stack_equals_per_seed_block():
    """q84's vectorized frame synth is bit-equal to the per-seed chain."""
    from tradingview_data_pipeline_spark.plans import multimodal_queries as mq
    seeds = [0, 1, 15, 16, 17, 12345, 2**31 - 1, 40000 * 16 + 7]
    stack = mq._vpix_stack(seeds)
    for i, s in enumerate(seeds):
        assert np.array_equal(stack[i], mq._vpix_block(s)), s


def test_resize_images_grouped_equals_per_row(spark):
    """r13: grouped-vectorized resize_images must emit byte-identical
    payloads/dims to the per-row decode->resize_nearest->encode chain,
    across mixed shapes, identity (no-downscale) groups, and upscale-
    never behavior."""
    rng = np.random.RandomState(7)
    arrays = [
        gradient_image(40, 20),
        rng.randint(0, 256, (17, 31, 3)).astype(np.uint8),
        rng.randint(0, 256, (17, 31, 3)).astype(np.uint8),  # repeat shape
        rng.randint(0, 256, (4, 6, 3)).astype(np.uint8),    # below max_side
        np.full((8, 8, 3), 128, dtype=np.uint8),
    ]
    payloads = [codecs.encode_ppm(a) for a in arrays]
    df = spark.createDataFrame(
        [(f"m{i}", p) for i, p in enumerate(payloads)],
        "media_id string, payload binary")
    got = {r["media_id"]: r for r in
           multimodal.resize_images(df, max_side=8).collect()}
    for i, (a, p) in enumerate(zip(arrays, payloads)):
        h, w = a.shape[:2]
        scale = min(1.0, 8 / max(w, h))
        tw, th = max(int(w * scale), 1), max(int(h * scale), 1)
        ref = codecs.encode_ppm(codecs.resize_nearest(a, tw, th)
                                if (tw, th) != (w, h) else a)
        r = got[f"m{i}"]
        assert (r["width"], r["height"]) == (tw, th)
        assert bytes(r["payload"]) == ref, i


def test_extract_audio_features_grouped_equals_frame_rms(spark):
    """r13: the stacked same-length RMS computation must match the
    per-row codecs.frame_rms doubles bit-for-bit (after the schema's
    float32 cast), across mixed lengths and short/odd clips."""
    rng = np.random.RandomState(11)
    clips = [
        (rng.randint(-2048, 2048, 64)).astype(np.int16),
        (rng.randint(-32768, 32767, 64)).astype(np.int16),  # same length
        (rng.randint(-32768, 32767, 37)).astype(np.int16),  # odd length
        (rng.randint(-32768, 32767, 5)).astype(np.int16),   # < n_frames
        np.zeros(64, dtype=np.int16),
    ]
    payloads = [codecs.encode_wav(s, 8000) for s in clips]
    df = spark.createDataFrame(
        [(f"a{i}", p) for i, p in enumerate(payloads)],
        "media_id string, payload binary")
    got = {r["media_id"]: r for r in
           multimodal.extract_audio_features(df, n_frames=8).collect()}
    for i, s in enumerate(clips):
        ref = [np.float32(v) for v in codecs.frame_rms(s, 8)]
        r = got[f"a{i}"]
        assert r["n_samples"] == len(s)
        assert [np.float32(v) for v in r["rms_frames"]] == ref, i


def test_encode_media_and_channel_sums_vectorized():
    """r13: q83's batched payload synthesis must emit the exact bytes of
    the per-row codec calls, and the grouped channel sums the exact
    per-row integer sums."""
    import pandas as pd

    from tradingview_data_pipeline_spark.plans import multimodal_queries as mq

    ids = [0, 1, 7, 255, 4999]
    out = list(mq._encode_media(iter([pd.DataFrame({"doc_id": ids})])))[0]
    for i, did in enumerate(ids):
        y = np.arange(mq._IMG_H)[:, None, None]
        x = np.arange(mq._IMG_W)[None, :, None]
        c = np.arange(3)[None, None, :]
        ref_img = codecs.encode_ppm(
            ((did + 7 * y + 13 * x + 29 * c) % 256).astype(np.uint8))
        ref_wav = codecs.encode_wav(
            (((did * 31 + 17 * np.arange(mq._N_SAMPLES)) % 4096) - 2048)
            .astype(np.int16), mq._RATE)
        assert bytes(out["img"][i]) == ref_img, did
        assert bytes(out["wav"][i]) == ref_wav, did
    sums = list(mq._channel_sums(iter([pd.DataFrame(
        {"media_id": [str(i) for i in ids], "payload": list(out["img"])})])))[0]
    k = 0
    for i, did in enumerate(ids):
        arr = codecs.decode_ppm(bytes(out["img"][i])).astype(np.int64)
        for ch in range(3):
            assert sums["media_id"][k] == str(did)
            assert sums["idx"][k] == ch
            assert int(sums["v1"][k]) == int(arr[:, :, ch].sum())
            k += 1
