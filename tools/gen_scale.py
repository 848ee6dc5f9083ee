"""Deterministic scale-up generator for the dedup/ANN bench tables.

The driver testdata tops out at sf0.1 (5,000 documents / 2,000
embeddings).  The 100-TB claims for the dedup/ANN family are argued
structurally (banded joins, bucket caps) but only measured at sf0.1;
this tool manufactures a 10x corpus with the SAME distributional
profile as the driver's generator so the growth ratio can be measured
instead of asserted:

- documents: bag-of-words over the exact vocabulary extracted from the
  driver's sf0.1 table (31 words), uniform 10-100 words per doc, the
  empirical language mix, round-robin source over src0..src19, the
  same ~0.16% exact-duplicate injection (every 625th doc copies an
  earlier one), and the driver's near-duplicate planting: ~5% of docs
  are a copy of an earlier doc with one word swapped to the marker
  token "dup" (the driver's sf0.1 table contains 255 "dup"
  occurrences in exactly this pattern — a rare token that appears
  only in perturbed copies).
- embeddings: 64-dim unit vectors with i.i.d. gaussian directions and
  uniform labels 0-9 — measured property of the driver data (zero
  intra-label geometry: all pairwise cosines < 0.61, intra-label mean
  sim 0.0) — plus planted near-duplicates: every 40th vector is an
  earlier vector perturbed to cos ~~ 0.98, so near-dup retrieval has
  a real (linear-in-n) answer set to find.

Tables are sharded at a FIXED rows-per-file (5,000 docs / 2,000
vectors): growing the corpus grows the file count, which is how a real
parquet table scales — so a 10x run also measures 10x scan
parallelism instead of serializing 10x the rows through the single
input split one mega-file would produce.

The generator is seeded, so gen_sf0.1 and gen_sf1 are reproducible;
gen_sf0.1 exists purely to validate the generator (its bench times
should match driver-sf0.1's) so the 10x ratio is measured WITHIN one
generation process.  Non-document tables are symlinked from the source
sf dir so the full query registry still resolves.

Usage:  python tools/gen_scale.py OUT_DIR FACTOR [SRC_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_DOCS = 5000        # driver sf0.1 row counts the FACTOR multiplies
BASE_VECS = 2000
DUP_EVERY = 625         # driver sf0.1: 8 duplicated texts / 5000 docs
NEAR_DUP_EVERY = 20     # driver sf0.1: ~255 'dup'-marked copies / 5000
VEC_DUP_EVERY = 40      # planted cos~0.98 pairs: 50 / 2000 vectors
VEC_DUP_EPS = 0.025     # perturbation scale: cos = 1/sqrt(1+64*eps^2)
DOCS_PER_FILE = 5000    # fixed shard size: file count grows with data
VECS_PER_FILE = 2000
DIM = 64
N_LABELS = 10
N_SOURCES = 20


def _write_sharded(table: pa.Table, path: str, rows_per_file: int) -> None:
    """One file at driver scale; a directory of fixed-size shards above."""
    if os.path.islink(path):
        os.unlink(path)
    elif os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)
    if table.num_rows <= rows_per_file:
        pq.write_table(table, path)
        return
    os.makedirs(path)
    for i, off in enumerate(range(0, table.num_rows, rows_per_file)):
        pq.write_table(table.slice(off, rows_per_file),
                       os.path.join(path, f"part-{i:05d}.parquet"))


def _profile(src_dir: str):
    """Vocabulary + language mix measured from the driver's documents."""
    tbl = pq.read_table(os.path.join(src_dir, "documents.parquet"),
                        columns=["text", "lang"])
    vocab = sorted({w for t in tbl.column("text").to_pylist()
                    for w in t.split(" ")} - {"dup"})
    langs, counts = np.unique(np.asarray(tbl.column("lang")), return_counts=True)
    return vocab, list(langs), counts / counts.sum()


def gen_documents(out: str, factor: float, src_dir: str, seed: int = 42) -> int:
    vocab, langs, lang_p = _profile(src_dir)
    n = int(BASE_DOCS * factor)
    rng = np.random.default_rng(seed)
    voc = np.array(vocab)
    wc = rng.integers(10, 101, size=n)
    flat = rng.integers(0, len(voc), size=int(wc.sum()))
    offs = np.concatenate(([0], np.cumsum(wc)))
    texts = [" ".join(voc[flat[offs[i]:offs[i + 1]]]) for i in range(n)]
    # near-dup planting: copy an earlier doc, swap one word for 'dup'
    for i in range(NEAR_DUP_EVERY - 1, n, NEAR_DUP_EVERY):
        words = texts[max(0, i - 13)].split(" ")
        words[int(rng.integers(0, len(words)))] = "dup"
        texts[i] = " ".join(words)
    for i in range(DUP_EVERY - 1, n, DUP_EVERY):   # exact-dup injection
        texts[i] = texts[max(0, i - 37)]
    lang = rng.choice(langs, size=n, p=lang_p)
    table = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array([f"src{i % N_SOURCES}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    _write_sharded(table, os.path.join(out, "documents.parquet"), DOCS_PER_FILE)
    return n


def gen_embeddings(out: str, factor: float, seed: int = 43) -> int:
    n = int(BASE_VECS * factor)
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, DIM)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for i in range(VEC_DUP_EVERY - 1, n, VEC_DUP_EVERY):   # planted near-dups
        v = m[max(0, i - 17)] + VEC_DUP_EPS * rng.standard_normal(DIM).astype(np.float32)
        m[i] = v / np.linalg.norm(v)
    table = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, N_LABELS, size=n), pa.int32()),
    })
    _write_sharded(table, os.path.join(out, "embeddings.parquet"), VECS_PER_FILE)
    return n


BASE_EVENTS = 100_000          # sf0.1 events rows
BASE_USERS = 150               # sf0.1 distinct users
EVENTS_PER_FILE = 250_000
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
EVENTS_SPAN_S = 30 * 24 * 3600


def gen_events(out: str, factor: float, seed: int = 44) -> int:
    """Factor-N events stream matching the driver profile: 30-day span,
    5 uniform types, 2-dp values, JSON props. Users scale WITH the
    factor so per-user density stays constant — the scaling claim under
    test is "more keys", not "deeper per-key history" (per-key window
    depth is the reference's own workload shape)."""
    n = int(BASE_EVENTS * factor)
    n_users = max(1, int(BASE_USERS * factor))
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    offs = np.sort(rng.integers(0, EVENTS_SPAN_S * 1_000_000, size=n))
    ts = base + offs.astype("timedelta64[us]")
    values = np.round(rng.uniform(0, 1000, size=n), 2)
    ks = rng.integers(0, 100, size=n)
    table = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
        "event_type": pa.array(
            [EVENT_TYPES[i] for i in rng.integers(0, 5, size=n)],
            pa.string()),
        "value": pa.array(values, pa.float64()),
        "props": pa.array([f'{{"k": {k}}}' for k in ks], pa.string()),
    })
    _write_sharded(table, os.path.join(out, "events.parquet"),
                   EVENTS_PER_FILE)
    return n


def main() -> None:
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    unknown = [f for f in flags if f != "--events"]
    if unknown:
        raise SystemExit(f"unknown flag(s) {unknown}; supported: --events")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_events = "--events" in flags
    out = os.path.abspath(args[0])
    factor = float(args[1])
    # abspath: a relative src would make the symlinks below resolve
    # relative to OUT_DIR and dangle
    src = os.path.abspath(args[2] if len(args) > 2
                          else "/root/testdata/sf0.1")
    os.makedirs(out, exist_ok=True)
    nd = gen_documents(out, factor, src)
    nv = gen_embeddings(out, factor)
    ne = gen_events(out, factor) if with_events else 0
    linked = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"] + ([] if with_events else ["events"])
    for name in linked:
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src, f"{name}.parquet"), dst)
    print(f"{out}: {nd} documents, {nv} embeddings, {ne} events "
          f"(factor {factor} of {src})")


if __name__ == "__main__":
    main()
