"""Audio-fingerprint dedup scale bench (COVERAGE "AUDIO near-dup" row;
SCALING.md addendum 32 evidence).

Same harness shape as tools/phash_bench.py: synthesize clips to parquet
once per decade (binary-column storage shape), then time the two
pipeline halves separately:

1. **Fingerprinting is map-only**: decode -> framed FFT -> band-energy
   sign bits, one vectorized numpy pass per clip, zero shuffle.
2. **Pairing is an equi-join on subfingerprints** plus one aggregate
   per clip pair (the H-K lookup-table method), with the silence/
   degenerate bucket cap.

Workload: 2.05 s clips (16384 samples at 8 kHz, 32 KB payloads) of
three random swept tones PLUS a noise floor per id (the noise is part
of the song — it gives the spectrum the entropy real audio has; pure
tones produce low-entropy subfingerprints that collide across clips);
every id with ``id % 100 == 1`` is a HALF-VOLUME re-quantized copy of
id-1 — exactly the robustness the fingerprint claims (sign bits are
invariant to uniform energy scaling; int16 re-quantization is the real
perturbation the claim survives, measured 99%+ frame agreement).
Additive FRESH noise is out of contract for the exact-join matcher —
that regime needs block-BER matching over overlapping frames (the full
H-K system), documented as the boundary, not claimed.

Usage: python tools/audio_fp_bench.py [n_clips ...] [--out out.jsonl]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SAMPLES, RATE = 16384, 8000
NOISY = False   # --noisy: copies get FRESH additive noise (the
                # out-of-contract workload for the exact matcher; the
                # BER matcher's positive case — addendum 32 closure)


def _synth(batches):
    import numpy as np
    import pandas as pd

    from tradingview_data_pipeline_spark.operators import codecs

    def song(seed: int) -> "np.ndarray":
        rng = np.random.RandomState(seed % (2**31))
        t = np.arange(N_SAMPLES) / RATE
        x = np.zeros(N_SAMPLES)
        for _ in range(3):
            f0, f1 = rng.uniform(350, 2800, 2)
            amp = rng.uniform(3000, 9000)
            f = f0 + (f1 - f0) * t / t[-1]
            x += amp * np.sin(2 * np.pi * np.cumsum(f) / RATE)
        x += rng.normal(0, 200, N_SAMPLES)   # noise floor = entropy
        return x

    CHUNK = 512  # 32 KB payloads: bound the Arrow buffer (addendum 31)
    for b in batches:
        all_ids = [int(i) for i in b["id"]]
        for c0 in range(0, len(all_ids), CHUNK):
            ids, payloads = [], []
            for i in all_ids[c0:c0 + CHUNK]:
                base = i - 1 if i % 100 == 1 else i
                x = song(base)
                if base != i:   # half-volume re-quantized near-copy
                    x = 0.5 * x
                    if NOISY:   # plus fresh noise: exact-match killer
                        rng2 = np.random.RandomState((i + 7) % (2**31))
                        x = x + rng2.normal(0, 50, N_SAMPLES)
                s = np.clip(x, -32768, 32767).astype(np.int16)
                ids.append(f"c{i:09d}")
                payloads.append(codecs.encode_wav(s, RATE))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})


def main() -> None:
    from pyspark.sql import functions as F

    from tradingview_data_pipeline_spark.operators import multimodal as mm
    from tradingview_data_pipeline_spark.operators import pins
    from tradingview_data_pipeline_spark.session import get_spark

    global NOISY
    argv = sys.argv[1:]
    if "--noisy" in argv:
        NOISY = True
        argv.remove("--noisy")
    out = "AUDIO_FP_SCALE_r11.jsonl"
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    decades = [int(a) for a in argv] or [50_000, 500_000]

    spark = get_spark("audio-fp-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
    # CPU-heavy per-byte work (FFT per clip): 128 MB splits leave most
    # of the machine idle below ~2M clips — 32 MB splits fill it
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    rows = []
    for n in decades:
        work = tempfile.mkdtemp(prefix="audiofp_bench_")
        try:
            media_path = os.path.join(work, "clips.parquet")
            t0 = time.perf_counter()
            (spark.range(n).repartition(32)
             .mapInPandas(_synth, "media_id string, payload binary")
             .write.mode("overwrite")
             .option("parquet.block.size", 32 * 1024 * 1024)
             .parquet(media_path))
            synth_sec = round(time.perf_counter() - t0, 2)

            media = spark.read.parquet(media_path)
            fp_path = os.path.join(work, "fps.parquet")
            t0 = time.perf_counter()
            mm.audio_fingerprint(media).write.mode("overwrite") \
                .parquet(fp_path)
            fp_sec = round(time.perf_counter() - t0, 2)

            fps = spark.read.parquet(fp_path)
            t0 = time.perf_counter()
            pairs = mm.audio_near_dups(fps)
            n_pairs = pairs.count()
            planted_found = (
                pairs.where(
                    F.expr("CAST(substring(vid_b, 2) AS BIGINT) = "
                           "CAST(substring(vid_a, 2) AS BIGINT) + 1")
                    & (F.expr("CAST(substring(vid_b, 2) AS BIGINT)") % 100
                       == 1)
                ).count())
            pair_sec = round(time.perf_counter() - t0, 2)
            pins.release_all()

            ber_row = None
            if NOISY:
                t0 = time.perf_counter()
                bp = mm.audio_near_dups_ber(fps)
                ber_pairs = bp.count()
                ber_found = (
                    bp.where(
                        F.expr("CAST(substring(vid_b, 2) AS BIGINT) = "
                               "CAST(substring(vid_a, 2) AS BIGINT) + 1")
                        & (F.expr("CAST(substring(vid_b, 2) AS BIGINT)")
                           % 100 == 1)
                    ).count())
                ber_sec = round(time.perf_counter() - t0, 2)
                ber_row = {"variant": "ber_pairs", "clips": n,
                           "sec": ber_sec, "n_pairs": ber_pairs,
                           "planted_found": ber_found, "noisy": True}

            planted = sum(1 for i in range(n) if i % 100 == 1)
            for variant, sec in (("synth+write", synth_sec),
                                 ("fingerprint", fp_sec),
                                 ("pairs", pair_sec)):
                row = {"variant": variant, "clips": n, "sec": sec,
                       **({"noisy": True} if NOISY else {})}
                if variant == "pairs":
                    row.update(n_pairs=n_pairs, planted=planted,
                               planted_found=planted_found)
                rows.append(row)
                print(json.dumps(row), flush=True)
            if ber_row is not None:
                ber_row["planted"] = planted
                rows.append(ber_row)
                print(json.dumps(ber_row), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    with open(out, "a") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
