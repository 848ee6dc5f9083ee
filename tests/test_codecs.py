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
