"""Sequence/token packing — batching documents into fixed-token-budget
bins for training-data pipelines (the step after token counting, q41).

Two packers, two contracts:

- ``pack_contiguous``: deterministic contiguous fill — order docs within
  each group (language/domain/shard), take the exclusive running token
  sum, ``bin_id = floor(cum_before / budget)``. One window per group key
  (prefix sums shuffle on the group key, never globally); bins are
  contiguous runs and a bin may overflow by at most one document —
  the cheap, fully SQL-expressible model (oracle-checked as q44).

- ``pack_first_fit``: greedy first-fit per group via ``applyInPandas`` —
  bins never exceed the budget (oversized docs get a dedicated bin,
  flagged ``overflow``), placement order is doc-id order so results are
  deterministic. Arrow-batched; each group packs independently in one
  task, so groups are the parallelism unit (pack per language/domain
  shard, not one global group).

At 100 TB: both shapes shuffle on the group key once; neither holds more
than a group in memory. First-fit's per-group state is O(open bins) —
bounded by group token total / budget.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_contiguous(df: DataFrame, id_col: str, tokens_col: str,
                    budget: int, group_keys: Sequence[str],
                    out_col: str = "bin_id") -> DataFrame:
    """bin_id = floor(exclusive-running-sum / budget) over id order within
    each group. Deterministic, one window; bins may overflow by < 1 doc."""
    w = (Window.partitionBy(*group_keys).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_before = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return df.withColumn(out_col,
                         F.floor(cum_before / F.lit(budget)).cast("bigint"))


def length_bucketed_batches(df: DataFrame, id_col: str, len_col: str, *,
                            token_budget: int, bucket_width: int,
                            group_keys: Sequence[str] = ()) -> DataFrame:
    """Length-bucketed dynamic batching — the padding-aware batch
    assignment a trainer runs over VARIABLE-length sequences (the
    fairseq / HF ``group_by_length`` strategy): sequences are bucketed
    by padded length (``ceil(len / bucket_width) * bucket_width``), and
    each bucket packs ``floor(token_budget / padded_len)`` sequences
    per batch, so every batch's padded token count stays <= the budget
    and padding waste per row is < ``bucket_width``. This is the
    complement of ``pack_token_sequences`` (concat-and-chunk destroys
    sequence boundaries; batching preserves them and pays padding) —
    fine-tuning and contrastive workloads need this one.

    Appends three columns:
      ``padded_len``  the bucket's padded length (len rounds UP to the
                      next bucket_width multiple; len 0 pads to one
                      width)
      ``batch_size``  sequences per full batch in this bucket (>= 1 —
                      over-budget sequences get singleton batches)
      ``batch_id``    0-based within (group, bucket), dense; ordering
                      inside a bucket is (len, id) so the assignment is
                      deterministic on any layout

    Exact window arithmetic end to end (row_number + integer div) —
    cross-engine checkable, unlike greedy first-fit whose sequential
    bin state needs ``applyInPandas`` (``pack_first_fit``). Scale
    shape: ONE hash-partitioned window; parallelism is the number of
    (group, bucket) partitions, so at corpus scale pass the shard id
    in ``group_keys`` — per-shard batches are what a data loader
    consumes anyway, and no partition then exceeds a shard's rows."""
    if token_budget <= 0 or bucket_width <= 0:
        raise ValueError("token_budget and bucket_width must be > 0")
    clash = {"padded_len", "batch_size", "batch_id", "__rn"} \
        & set(df.columns)
    if clash:
        raise ValueError(
            f"length_bucketed_batches reserves columns {sorted(clash)}; "
            f"rename them in the input")
    ln = F.col(len_col).cast("bigint")
    # integral DIV end to end (the q76 lesson: floor(double/) drifts
    # past 2^53; DIV is exact in both engines)
    padded = (F.greatest(
        F.expr(f"(CAST({len_col} AS BIGINT) + {bucket_width - 1}) "
               f"DIV {bucket_width}"), F.lit(1))
        * F.lit(bucket_width)).cast("bigint")
    step = df.withColumn("padded_len", padded).withColumn(
        "batch_size",
        F.greatest(F.expr(f"{token_budget} DIV padded_len"),
                   F.lit(1)).cast("bigint"))
    w = (Window.partitionBy(*group_keys, "padded_len")
         .orderBy(ln.asc(), F.col(id_col).asc()))
    return (step
            .withColumn("__rn", F.row_number().over(w).cast("bigint"))
            .withColumn("batch_id",
                        F.expr("(__rn - 1) DIV batch_size"))
            .drop("__rn"))


def pack_first_fit(df: DataFrame, id_col: str, tokens_col: str,
                   budget: int, group_keys: Sequence[str]) -> DataFrame:
    """Greedy first-fit in doc-id order within each group.

    Output: group keys + (id, tokens, bin_id, overflow). ``bin_id`` is
    0-based per group; bins hold <= budget tokens except dedicated
    ``overflow`` bins for single docs larger than the budget.
    """
    import pandas as pd

    keys = list(group_keys)
    fields = df.select(*keys, id_col, tokens_col).schema
    out_schema = (", ".join(f"{f.name} {f.dataType.simpleString()}"
                            for f in fields.fields)
                  + ", bin_id long, overflow boolean")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        remaining: list[int] = []          # open-bin remaining capacity
        bins, overflow = [], []
        for t in pdf[tokens_col]:
            t = int(t) if pd.notna(t) else 0
            if t > budget:
                bins.append(len(remaining))
                remaining.append(0)        # dedicated, already full
                overflow.append(True)
                continue
            for i, cap in enumerate(remaining):
                if cap >= t:
                    bins.append(i)
                    remaining[i] = cap - t
                    break
            else:
                bins.append(len(remaining))
                remaining.append(budget - t)
            overflow.append(False)
        return pdf.assign(bin_id=bins, overflow=overflow)

    return (df.select(*keys, id_col, tokens_col)
            .groupBy(*keys).applyInPandas(pack, out_schema))


def pack_token_sequences(
    df: DataFrame,
    id_col: str,
    ids_col: str,
    seq_len: int,
    group_keys: Sequence[str] = (),
    *,
    pad_id: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence assembly — the step that turns per-doc
    token-id arrays into the fixed-length training sequences an LLM
    data pipeline actually ships (GPT-style packing: concatenate every
    document in ``id_col`` order within each group, cut every
    ``seq_len`` tokens; documents straddle sequence boundaries).

    Output, one row per sequence:
      * group keys, ``seq_id`` (0-based, contiguous per group)
      * ``input_ids`` — exactly ``seq_len`` ids for every interior
        sequence; the final partial sequence per group is DROPPED when
        ``pad_id`` is None (the usual training contract — a partial
        tail is a rounding error at corpus scale) or right-padded with
        ``pad_id`` when given (``n_real`` keeps the unpadded length).
      * ``n_real`` — ids before padding.
      * ``doc_spans`` — array<struct<start, n, doc>> in offset order:
        which slice of the sequence came from which document, i.e. the
        boundary metadata attention masking / loss masking needs.

    Spark shape (NOT a token-per-row explode): one prefix-sum window
    per group gives each doc its global token offset; each doc then
    emits one row per sequence it overlaps (``sequence(first, last)``
    explode — ~1 row/doc plus one per boundary crossing), the id array
    is sliced map-side, and one groupBy(seq) reassembles pieces with an
    ``array_sort``/``flatten`` (pieces can't tie: one piece per doc per
    seq, distinct offsets). Shuffle payload is the token arrays twice
    (window + reassembly) — the floor for any distributed
    concatenation whose sequences cross document boundaries. Like
    ``pack_contiguous``, the per-group window makes GROUPS the
    parallelism unit: pack per shard/domain, not one global group.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    reserved = {"seq_id", "input_ids", "doc_spans", "n_real",
                "_off", "_s", "_e", "_doc", "_pos", "_piece", "_parts"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns collide with pack_token_sequences "
            f"internals/outputs: {sorted(clash)}; rename them first")
    keys = list(group_keys)
    L = F.lit(seq_len).cast("bigint")
    n = F.size(F.col(ids_col)).cast("bigint")
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()) \
        .orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offs = (df.where(n > 0)
            .select(*keys, id_col, ids_col,
                    (F.sum(n).over(w) - n).alias("_off")))
    # exact integral division (`div`), not floor(double/) — token offsets
    # at corpus scale exceed double's 2^53 exact-integer range
    first = F.expr(f"_off div {seq_len}")
    last = F.expr(f"(_off + size({ids_col}) - 1) div {seq_len}")
    pieces = (offs
              .select(*keys, id_col, ids_col, "_off",
                      F.explode(F.sequence(first, last)).alias("seq_id"))
              .select(
                  *keys, "seq_id", id_col, ids_col, "_off",
                  F.greatest(F.lit(0).cast("bigint"),
                             F.col("seq_id") * L - F.col("_off"))
                  .alias("_s"),
                  F.least(n, (F.col("seq_id") + 1) * L - F.col("_off"))
                  .alias("_e"))
              .select(
                  *keys, "seq_id",
                  F.col(id_col).alias("_doc"),
                  (F.col("_off") + F.col("_s") - F.col("seq_id") * L)
                  .alias("_pos"),
                  F.expr(f"slice({ids_col}, cast(_s + 1 as int), "
                         f"cast(_e - _s as int))").alias("_piece")))
    assembled = (pieces
                 .groupBy(*keys, "seq_id")
                 .agg(F.array_sort(
                     F.collect_list(F.struct(
                         F.col("_pos").alias("start"),
                         F.size("_piece").cast("bigint").alias("n"),
                         F.col("_doc").alias("doc"),
                         F.col("_piece").alias("piece")))).alias("_parts"))
                 .select(
                     *keys, "seq_id",
                     F.flatten(F.expr(
                         "transform(_parts, x -> x.piece)"))
                     .alias("input_ids"),
                     F.expr("transform(_parts, x -> "
                            "struct(x.start AS start, x.n AS n, "
                            "x.doc AS doc))").alias("doc_spans")))
    n_real = F.size("input_ids").cast("bigint")
    if pad_id is None:
        return (assembled.where(n_real == F.lit(seq_len))
                .withColumn("n_real", n_real))
    pad = F.array_repeat(F.lit(pad_id).cast(
        df.schema[ids_col].dataType.elementType.simpleString()),
        (L - n_real).cast("int"))
    return assembled.select(
        *keys, "seq_id",
        F.concat("input_ids", pad).alias("input_ids"),
        "doc_spans", n_real.alias("n_real"))


# ---------------------------------------------------------------------------
# Training targets over packed sequences — the (input, label) shapes a
# trainer consumes.  Both are map-only column expressions (no shuffle,
# no UDF) and deterministic: masking decisions hash (salt, sequence
# key, position), never an RNG, so a resumed or re-partitioned job
# produces bit-identical targets.
# ---------------------------------------------------------------------------

def causal_lm_labels(seqs: DataFrame, *, ids_col: str = "input_ids",
                     n_real_col: str = "n_real",
                     out_col: str = "labels",
                     ignore_index: int = -100) -> DataFrame:
    """Next-token-prediction labels: ``labels[i] = ids[i+1]`` while
    ``i+1`` is a real (unpadded) position, else ``ignore_index`` — the
    standard causal-LM shift, including the final real position and
    every pad slot masked out of the loss."""
    ids = F.col(ids_col)
    nr = F.col(n_real_col)
    lbl = F.transform(
        ids, lambda x, i: F.when(i + 1 < nr, F.element_at(ids, i + 2))
                           .otherwise(F.lit(ignore_index).cast("bigint")))
    return seqs.withColumn(out_col, lbl)


def mlm_mask(seqs: DataFrame, mask_id: int, *,
             ids_col: str = "input_ids", n_real_col: str = "n_real",
             key_cols: Sequence[str] = ("seq_id",),
             mask_prob: float = 0.15, vocab_size: int | None = None,
             salt: str = "mlm", out_ids: str = "masked_ids",
             out_labels: str = "labels",
             ignore_index: int = -100) -> DataFrame:
    """Deterministic BERT-style masked-LM corruption.

    Position ``i`` of a sequence is selected iff
    ``md5(salt : key : i) < mask_prob · 2^60`` — the repo's md5-60
    uniform (the split/sampling primitive), so the SAME sequence always
    masks identically across runs, partitionings, and resumes, and no
    RNG state ships with the job.  ``key_cols`` must identify a
    sequence uniquely (``("seq_id",)`` alone only if ungrouped — pass
    the group keys too, or masks repeat across groups).

    Selected positions: with ``vocab_size`` given, the full 80/10/10
    recipe via an independent second hash — 80% → ``mask_id``, 10% → a
    hash-derived random id in ``[0, vocab_size)`` (third independent
    hash), 10% → kept unchanged; without it, 100% → ``mask_id``.
    ``out_labels`` carries the original id at selected positions and
    ``ignore_index`` elsewhere; padding (``i >= n_real``) is never
    selected.  Map-only: two/three md5 evaluations per token, all
    JVM-side — no shuffle, no Python.
    """
    if not 0.0 < mask_prob < 1.0:
        raise ValueError(f"mask_prob must be in (0, 1), got {mask_prob}")
    from tradingview_data_pipeline_spark.operators.text import md5_hash60

    key = F.concat_ws("#", *[F.col(c).cast("string") for c in key_cols])
    thresh = F.lit(int(mask_prob * float(2 ** 60))).cast("bigint")
    ids, nr = F.col(ids_col), F.col(n_real_col)

    def _h(i, tag):
        return md5_hash60(F.concat_ws(":", key, i.cast("string")),
                          f"{salt}-{tag}")

    def masked(x, i):
        selected = (i < nr) & (_h(i, "sel") < thresh)
        if vocab_size is None:
            return F.when(selected, F.lit(mask_id).cast("bigint")) \
                    .otherwise(x)
        bucket = _h(i, "bkt") % F.lit(10)
        rand_id = (_h(i, "rid") % F.lit(vocab_size)).cast("bigint")
        return F.when(~selected, x) \
                .when(bucket < 8, F.lit(mask_id).cast("bigint")) \
                .when(bucket == 8, rand_id) \
                .otherwise(x)

    def label(x, i):
        selected = (i < nr) & (_h(i, "sel") < thresh)
        return F.when(selected, x) \
                .otherwise(F.lit(ignore_index).cast("bigint"))

    return (seqs
            .withColumn(out_ids, F.transform(ids, masked))
            .withColumn(out_labels, F.transform(ids, label)))


def span_corruption(seqs: DataFrame, sentinel_start: int, *,
                    ids_col: str = "input_ids", n_real_col: str = "n_real",
                    key_cols: Sequence[str] = ("seq_id",),
                    noise_density: float = 0.15,
                    mean_span_len: float = 3.0,
                    eos_id: int | None = None, salt: str = "t5",
                    out_inputs: str = "corrupted_ids",
                    out_targets: str = "target_ids") -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4): replace
    random token spans with ascending sentinel ids, emit the excised
    spans (each prefixed by its sentinel, optionally EOS-terminated) as
    the denoising target.

    Span sampling follows the T5 recipe — ``round(L·density)`` noise
    tokens (clamped to [1, L-1]) split uniformly into
    ``round(noise/mean_span_len)`` spans, interleaved with equally many
    non-noise segments (every segment ≥ 1 token, sequence starts with
    text and ends with a noise span).  Randomness is a numpy generator
    seeded from md5(salt : sequence key), so targets are deterministic
    per sequence and layout-independent; sequences shorter than 2 real
    tokens pass through uncorrupted (empty target).  Padding beyond
    ``n_real`` never participates.

    Variable-length outputs force a real row rewrite, so this is the
    one training-target op that runs as an Arrow-batched ``mapInPandas``
    (the repo's UDF policy) rather than a column expression — still
    map-only, no shuffle.  Sentinel ids ascend from ``sentinel_start``
    per sequence (T5 counts DOWN from vocab end; pass the highest
    sentinel as ``sentinel_start`` and think of ids as offsets if
    matching that layout matters).
    """
    import hashlib

    import numpy as np

    if not 0.0 < noise_density < 1.0:
        raise ValueError(
            f"noise_density must be in (0, 1), got {noise_density}")
    if mean_span_len < 1.0:
        raise ValueError(
            f"mean_span_len must be >= 1, got {mean_span_len}")
    keys = list(key_cols)
    fields = list(seqs.schema.fields) + [
        T.StructField(out_inputs, T.ArrayType(T.LongType())),
        T.StructField(out_targets, T.ArrayType(T.LongType())),
    ]
    out_schema = T.StructType(fields)

    def _segment(rng, n, k):
        """Uniform split of n items into k ordered parts, each >= 1."""
        if k <= 1:
            return [n]
        cuts = np.sort(rng.choice(n - 1, size=k - 1, replace=False)) + 1
        edges = np.concatenate(([0], cuts, [n]))
        return np.diff(edges).tolist()

    def corrupt(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            inputs, targets = [], []
            # column-wise zip, not iterrows: building a pandas Series
            # per row was the dominant per-row cost (the r8 review's
            # "slowest-per-byte Python in the repo"); the per-row seeded
            # RNG + variable-length outputs keep the inner loop python,
            # but row access is now plain numpy scalars
            for row_ids, row_n, *keyvals in zip(
                    pdf[ids_col].to_numpy(), pdf[n_real_col].to_numpy(),
                    *(pdf[c].to_numpy() for c in keys)):
                ids = list(row_ids)[: int(row_n)]
                n = len(ids)
                if n < 2:
                    inputs.append([int(x) for x in ids])
                    targets.append([] if eos_id is None else [int(eos_id)])
                    continue
                seed_key = ":".join(
                    [salt] + [str(v) for v in keyvals])
                seed = int.from_bytes(
                    hashlib.md5(seed_key.encode()).digest()[:8], "big")
                rng = np.random.default_rng(seed)
                n_noise = min(max(int(round(n * noise_density)), 1), n - 1)
                n_spans = max(int(round(n_noise / mean_span_len)), 1)
                n_spans = min(n_spans, n_noise, n - n_noise)
                noise_lens = _segment(rng, n_noise, n_spans)
                keep_lens = _segment(rng, n - n_noise, n_spans)
                inp, tgt, pos = [], [], 0
                for j in range(n_spans):
                    inp.extend(ids[pos:pos + keep_lens[j]])
                    pos += keep_lens[j]
                    inp.append(sentinel_start + j)
                    tgt.append(sentinel_start + j)
                    tgt.extend(ids[pos:pos + noise_lens[j]])
                    pos += noise_lens[j]
                if eos_id is not None:
                    tgt.append(int(eos_id))
                inputs.append([int(x) for x in inp])
                targets.append([int(x) for x in tgt])
            pdf = pdf.copy()
            pdf[out_inputs] = inputs
            pdf[out_targets] = targets
            yield pdf

    return seqs.mapInPandas(corrupt, out_schema)
