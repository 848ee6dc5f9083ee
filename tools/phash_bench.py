"""Perceptual-hash image-dedup scale bench (COVERAGE "perceptual-hash
IMAGE near-dup" row; SCALING.md addendum 31 evidence).

Measures the two halves of the image near-dup pipeline at corpus scale:

1. **Hashing is map-only and storage-bound**: decode -> grayscale ->
   resize -> threshold over Arrow batches, zero shuffle. Measured from
   parquet (the 100 TB deployment shape: binary column scans), images
   synthesized once per decade and written to disk first so hash timing
   excludes synthesis.
2. **Pairing is the banded-Hamming join**: the same 60-bit / 4-band
   pigeonhole plan as text SimHash (already decade-measured at 5M docs,
   addendum 23); this bench confirms the image signatures feed it at
   the same cost shape and that planted near-copies are recovered.

Workload: 64x48 RGB images (9 KB payloads) from a per-id xorshift
generator; every id with ``id % 100 == 1`` is a near-copy of id-1 (a
handful of pixels perturbed), so ~1% of the corpus has a planted
near-dup partner and the pair join does real work.

Usage: python tools/phash_bench.py [n_images ...] [--out out.jsonl]
Writes one JSON line per (decade, phase).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_W, IMG_H = 64, 48


def _synth(batches):
    import numpy as np
    import pandas as pd

    from tradingview_data_pipeline_spark.operators import codecs

    # Chunked yields: a 10k-row Arrow batch of 9 KB payloads is ~90 MB
    # per in-flight task — 32 concurrent tasks blew the default heap at
    # the 500k decade (GCLocker retry OOM). 512-row output frames bound
    # the Arrow buffer per task; same addendum-28 class as row-group
    # sizing for fat binary rows.
    CHUNK = 512
    for b in batches:
        all_ids = [int(i) for i in b["id"]]
        for c0 in range(0, len(all_ids), CHUNK):
            ids, payloads = [], []
            for i in all_ids[c0:c0 + CHUNK]:
                base = i - 1 if i % 100 == 1 else i
                rng = np.random.RandomState(base % (2**31))
                arr = rng.randint(0, 256, (IMG_H, IMG_W, 3)).astype("uint8")
                if base != i:  # near-copy: perturb a few pixels
                    arr = arr.copy()
                    arr[5, 7] = arr[5, 7] // 2
                    arr[40, 60] = 255 - arr[40, 60]
                ids.append(f"m{i:09d}")
                payloads.append(codecs.encode_ppm(arr))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})


def main() -> None:
    from pyspark.sql import functions as F

    from tradingview_data_pipeline_spark.operators import multimodal as mm
    from tradingview_data_pipeline_spark.session import get_spark

    argv = sys.argv[1:]
    out = "PHASH_SCALE_r11.jsonl"
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    decades = [int(a) for a in argv] or [50_000, 500_000]

    spark = get_spark("phash-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # fat binary rows: the default 10k-record Arrow batch is ~90 MB of
    # payloads per in-flight task — bound the Python transfer the same
    # way the synth side chunks its yields
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
    rows = []
    for n in decades:
        work = tempfile.mkdtemp(prefix="phash_bench_")
        try:
            media_path = os.path.join(work, "media.parquet")
            t0 = time.perf_counter()
            (spark.range(n).repartition(32)
             .mapInPandas(_synth, "media_id string, payload binary")
             .write.mode("overwrite")
             .option("parquet.block.size", 32 * 1024 * 1024)
             .parquet(media_path))
            synth_sec = round(time.perf_counter() - t0, 2)

            media = spark.read.parquet(media_path)
            t0 = time.perf_counter()
            hashes = mm.image_ahash(media)
            hash_path = os.path.join(work, "hashes.parquet")
            hashes.write.mode("overwrite").parquet(hash_path)
            hash_sec = round(time.perf_counter() - t0, 2)

            hdf = spark.read.parquet(hash_path)
            t0 = time.perf_counter()
            pairs = mm.image_near_dups(hdf, max_hamming=3)
            n_pairs = pairs.count()
            planted_found = (
                pairs.where(
                    F.expr("CAST(substring(doc_b, 2) AS BIGINT) = "
                           "CAST(substring(doc_a, 2) AS BIGINT) + 1")
                    & (F.expr("CAST(substring(doc_b, 2) AS BIGINT)") % 100 == 1)
                ).count())
            pair_sec = round(time.perf_counter() - t0, 2)

            planted = sum(1 for i in range(n) if i % 100 == 1)
            for variant, sec in (("synth+write", synth_sec),
                                 ("hash", hash_sec),
                                 ("pairs", pair_sec)):
                row = {"variant": variant, "images": n, "sec": sec}
                if variant == "pairs":
                    row.update(n_pairs=n_pairs, planted=planted,
                               planted_found=planted_found)
                rows.append(row)
                print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    with open(out, "a") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
