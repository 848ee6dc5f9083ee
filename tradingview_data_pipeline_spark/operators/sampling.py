"""Deterministic sampling and dataset-split operators.

Training-data pipelines need *reproducible* sampling: the same row must
land in the same split on every run, on any cluster layout, with no RNG
state to ship.  All operators here key off a salted md5 of a stable row
id — pure map-side column expressions (no shuffle, no ``rand()`` whose
per-partition seeding changes with the physical plan).

The 60-bit digest trick (top 15 hex chars of md5, parsed as a non-
negative integer) is the repo-wide cross-engine hash; see
``plans/training_queries._H60`` for the DuckDB mirror.

Scale: every operator is a projection or a (group-key-partitioned)
window — at 100 TB the split/sample assignment is embarrassingly
parallel, and ``sample_k_per_group`` shuffles only the group key once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash60(col: Column, salt: str = "") -> Column:
    """Non-negative 60-bit integer from a salted md5 — stable across
    runs, engines (DuckDB mirror: ``('0x'||substr(md5(..),1,15))::BIGINT``),
    and cluster layouts."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))),
                              1, 15), 16, 10).cast("long")


def hash_bucket(col: Column, buckets: int, salt: str = "") -> Column:
    """Uniform bucket id in [0, buckets) from a stable row id."""
    return hash60(col, salt) % F.lit(int(buckets))


def hash_split(
    df: DataFrame,
    id_col: str,
    boundaries: dict[str, int],
    salt: str = "split",
    out: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash percentile.

    ``boundaries`` maps split name -> exclusive upper percentile bound in
    [1, 100], in ascending order; e.g. ``{"train": 80, "val": 90,
    "test": 100}`` gives an 80/10/10 split.  Deterministic: re-running
    over a grown table keeps every old row's assignment (the property
    that makes hash splits the standard over ``randomSplit`` for
    training corpora).
    """
    bounds = sorted(boundaries.items(), key=lambda kv: kv[1])
    if bounds[-1][1] != 100:
        raise ValueError("last boundary must be 100")
    pct = hash_bucket(F.col(id_col), 100, salt)
    expr = F.lit(bounds[-1][0])
    for name, upper in reversed(bounds[:-1]):
        expr = F.when(pct < upper, F.lit(name)).otherwise(expr)
    return df.withColumn(out, expr).withColumn(f"{out}_bucket", pct)


def bernoulli_hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically (hash threshold on a
    1e6 grid)."""
    thresh = int(round(fraction * 1_000_000))
    return df.where(hash60(F.col(id_col), salt) % F.lit(1_000_000) < F.lit(thresh))


def sample_k_per_group(
    df: DataFrame, group_cols: list[str], id_col: str, k: int, salt: str = "gk"
) -> DataFrame:
    """Uniform deterministic k-row sample per group: rank rows by their
    salted hash (ties broken by id) inside each group and keep the first
    ``k``.  One shuffle on the group key; no collect, no RNG.  Adds
    ``sample_rank`` (1-based)."""
    w = Window.partitionBy(*group_cols).orderBy(
        hash60(F.col(id_col), salt).asc(), F.col(id_col).asc())
    return (df.withColumn("sample_rank", F.row_number().over(w))
              .where(F.col("sample_rank") <= k))


def weighted_sample_k(
    df: DataFrame, id_col: str, weight_col: str, k: int,
    *, group_cols: list[str] | None = None, salt: str = "wk",
    log_weights: bool = False
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row draws a hash-derived uniform u in (0, 1) and
    keeps the top-``k`` rows by key u^(1/w) — equivalently, the SMALLEST
    ``-ln(u)/w`` (numerically stabler; identical ordering).  P(row in
    sample) is proportional-ish to its weight, the same row always gets
    the same draw (re-runs and cluster layouts agree), and no RNG state
    ships with the job — the weighted sibling of ``sample_k_per_group``.

    Rows with NULL, zero, or negative weight are excluded.  One shuffle
    on the group key (or a TakeOrdered when ungrouped).  pytest-verified
    (tests/test_temporal_corpus_vectors.py) rather than oracle-checked:
    ln/pow are not correctly-rounded, so the tie-free ORDERING is stable
    within one engine but the raw keys are not bit-reproducible across
    engines — the repo-wide criterion for oracle vs pytest verification.

    ``log_weights=True`` reads ``weight_col`` as ln(w) — any real value
    is a valid weight and nothing is excluded — and orders by the
    monotone-equivalent ``ln(-ln u) − ln w`` so the selection matches
    exponentiating first WITHOUT ever calling exp (DSIR importance
    weights are sums of hundreds of log-ratios; their exp over/underflows
    doubles long before the ordering degrades).
    """
    u = (hash60(F.col(id_col), salt) + F.lit(1.0)) / F.lit(2.0 ** 60 + 2.0)
    w = F.col(weight_col).cast("double")
    if log_weights:
        skey = F.log(-F.log(u)) - w
        keyed = df.where(w.isNotNull()).withColumn("__sk", skey)
    else:
        skey = -F.log(u) / w
        keyed = df.where(w.isNotNull() & (w > 0)).withColumn("__sk", skey)
    if group_cols:
        win = Window.partitionBy(*group_cols).orderBy(
            F.col("__sk").asc(), F.col(id_col).asc())
        out = (keyed.withColumn("sample_rank", F.row_number().over(win))
               .where(F.col("sample_rank") <= k))
    else:
        out = (keyed.orderBy(F.col("__sk").asc(), F.col(id_col).asc())
               .limit(k).withColumn("sample_rank",
                                    F.row_number().over(
                                        Window.orderBy(F.col("__sk").asc(),
                                                       F.col(id_col).asc()))))
    return out.drop("__sk")


def cluster_safe_split(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame,
    cluster_col: str = "cluster_id",
    boundaries: dict[str, int] | None = None,
    salt: str = "csplit",
) -> DataFrame:
    """Leakage-safe split: every member of a near-duplicate cluster gets
    the SAME split assignment, so a paraphrase of a test document can
    never land in train (the train/test contamination a plain per-doc
    hash split cannot prevent). Rows absent from ``clusters`` are
    singletons (cluster = own id); the split hashes the CLUSTER id.
    Scale shape: ``clusters`` is the dedup output (one row per clustered
    doc — small next to the corpus) and the join is key-partitioned.

    Stability contract (weaker than ``hash_split``'s, necessarily): the
    assignment is deterministic GIVEN the clustering, but corpus growth
    can change cluster ids — a new document bridging two clusters
    merges them, and the merged members rehash to the surviving
    cluster's split. That reassignment is FORCED by leakage-safety (two
    now-linked docs in different splits would be the leak), so you
    cannot have both per-row stability and cluster containment under
    merges. Practice: freeze split assignments at dataset release
    (persist this output), and re-derive only when re-clustering.
    """
    boundaries = boundaries or {"train": 80, "val": 90, "test": 100}
    j = df.join(clusters.select(F.col(id_col), F.col(cluster_col)),
                id_col, "left")
    j = j.withColumn(cluster_col,
                     F.coalesce(F.col(cluster_col), F.col(id_col)))
    return hash_split(j, cluster_col, boundaries, salt=salt)


def mixture_sample(
    df: DataFrame, id_col: str, source_col: str,
    target_weights: dict[str, int], total_rows: int,
    *, salt: str = "mix", max_epochs: int = 1000,
    grid: int = 1_000_000,
) -> DataFrame:
    """Resample a corpus to a target domain mixture — the data-mixture
    operator every LLM pretraining build runs (Pile / LLaMA style):
    given integer ``target_weights`` per source and an output budget of
    ``total_rows``, each source's documents are kept ``rate =
    (total_rows * w_s / sum_w) / n_s`` times — ``floor(rate)`` full
    epochs plus one more copy for the hash-selected ``rate - floor``
    fraction. Rates above 1 UPSAMPLE (repeat docs across epochs), below
    1 downsample; sources absent from ``target_weights`` are dropped.

    Output: input columns + ``n_copies`` + ``copy_idx`` (1-based; one
    row per copy, so downstream packing/shuffling sees every epoch).
    E[output rows] = ``total_rows`` up to hash-grid rounding, and the
    selection is fully deterministic: same doc -> same copies on any
    layout, rerun, or engine (integer weights keep every threshold a
    pure bigint expression: ``epochs = T*w // (sum_w*n)``, remainder
    threshold on a 1e6 hash grid — no float in the decision path).

    Scale shape: ONE column-pruned count aggregate (shuffles #sources
    rows), per-source params collected to the driver (bounded by source
    CARDINALITY — domains, not documents; loud ``max_epochs`` guard),
    then a broadcast join + map-side ``sequence`` explode. The corpus
    itself is never shuffled. ``temperature_weights`` converts natural
    counts + a sampling temperature into the integer weights."""
    if not target_weights:
        raise ValueError("target_weights must be non-empty")
    bad = {s: w for s, w in target_weights.items()
           if isinstance(w, bool) or not isinstance(w, int) or w <= 0}
    if bad:
        raise ValueError(f"target_weights must be positive ints "
                         f"(exact cross-engine arithmetic): {bad}")
    if total_rows <= 0:
        raise ValueError("total_rows must be positive")
    sum_w = sum(target_weights.values())

    counts = {r["s"]: r["n"] for r in
              df.where(F.col(source_col).isin(*target_weights))
                .groupBy(F.col(source_col).alias("s"))
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    params = []
    for s, n in sorted(counts.items()):
        num, den = total_rows * target_weights[s], sum_w * n
        epochs, rem = divmod(num, den)
        if epochs > max_epochs:
            raise ValueError(
                f"source {s!r}: rate {num / den:.1f} exceeds max_epochs="
                f"{max_epochs} — raise it explicitly if a {epochs}-epoch "
                f"repeat is intended")
        params.append((s, epochs, grid * rem // den))
    if not params:
        return (df.withColumn("n_copies", F.lit(0).cast("bigint"))
                  .withColumn("copy_idx", F.lit(0).cast("bigint"))
                  .where(F.lit(False)))
    pdf = df.sparkSession.createDataFrame(
        params, f"{source_col} string, __epochs long, __thr long")

    n_copies = (F.col("__epochs")
                + (hash60(F.col(id_col), salt) % F.lit(grid)
                   < F.col("__thr")).cast("long"))
    return (df.join(F.broadcast(pdf), source_col)
            .withColumn("n_copies", n_copies)
            .drop("__epochs", "__thr")
            .where(F.col("n_copies") >= 1)     # sequence(1,0) is [1,0]!
            .withColumn("copy_idx",
                        F.explode(F.sequence(F.lit(1).cast("bigint"),
                                             F.col("n_copies")))))


def temperature_weights(
    counts: dict[str, int], temperature: float, *, scale: int = 1_000_000,
) -> dict[str, int]:
    """Integer mixture weights from natural source counts at a sampling
    temperature: w_s ∝ (n_s / N)^(1/T), rationalized onto an integer
    grid for ``mixture_sample``'s exact arithmetic. T=1 reproduces the
    natural mixture; T>1 flattens it toward uniform (the common
    low-resource-upweighting setting); T→0 approaches argmax. Driver-side
    pure-Python over #sources entries — the pow lives HERE, outside the
    cross-engine decision path."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    if not counts:
        raise ValueError("counts must be non-empty")
    tot = float(sum(counts.values()))
    raw = {s: (c / tot) ** (1.0 / temperature) for s, c in counts.items()}
    z = sum(raw.values())
    return {s: max(1, round(scale * v / z)) for s, v in raw.items()}


def quality_buckets(df: DataFrame, id_col: str, score_col: str, *,
                    fractions: tuple[float, ...] = (1 / 3, 2 / 3),
                    labels: tuple[str, ...] = ("head", "middle", "tail"),
                    out_col: str = "quality_bucket",
                    mode: str = "scale") -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020 §4.3: the
    perplexity head/middle/tail split): rank documents by ``score_col``
    DESCENDING (higher = more fluent — e.g. ``bigram_lm_profile``'s
    score or a negated perplexity) and cut at the given cumulative
    fractions. One tiny count job converts fractions into rank
    boundaries; ``scoring.bucket_by_global_rank`` then assigns labels —
    ``mode='scale'`` (default) computes the boundary order statistics
    with a small two-phase aggregate and buckets with a map-only range
    comparison (NO single-partition window), so the operator survives
    corpus scale. Ties break on ``id_col`` in BOTH modes: scale mode
    uses the composite ``(score, id)`` boundary order statistic, so a
    run of tied quantized scores (common for ``bigram_lm_profile``
    output) splits at the boundary exactly as parity mode does —
    deterministic on any layout."""
    from tradingview_data_pipeline_spark.operators import scoring as sc

    if len(labels) != len(fractions) + 1:
        raise ValueError(
            f"need len(labels) == len(fractions) + 1, got "
            f"{len(labels)} labels / {len(fractions)} fractions")
    if any(a >= b for a, b in zip(fractions, fractions[1:])) or not all(
            0 < f < 1 for f in fractions):
        # strictly ascending: a duplicated fraction would silently make
        # the middle bucket a duplicated rank boundary (empty bucket)
        raise ValueError(f"fractions must be strictly ascending in "
                         f"(0, 1): {fractions}")
    n = df.count()
    bounds = [(max(1, int(f * n)), lab)
              for f, lab in zip(fractions, labels)]
    return sc.bucket_by_global_rank(
        df, score_col, out_col=out_col, boundaries=bounds,
        default_label=labels[-1], tie_break=id_col, mode=mode)
