"""Time-series feature operators: rolling indicators and exact pairwise
correlation.

The reference's scoring jobs consume precomputed technical indicators
(moving averages, MACD inputs — calcompositescore.py reads ``sma20``/
``ema``-family columns; functions/cleaning.py implements the MACD
histogram arithmetic).  These operators produce that indicator family
*inside* the engine, as window functions over the fact stream — one
shuffle on the series key, every frame variant sharing the same sort.

Cross-engine determinism (the repo-wide policy, plans/analytics.py):
- rolling means go through DECIMAL window sums (order-independent) and
  divide by exact integer counts;
- rolling min/max/lag are exact;
- Pearson correlation is computed from INTEGER count sums only
  (n·Σxy − Σx·Σy over √(n·Σx² − (Σx)²)·√(n·Σy² − (Σy)²)): every sum is
  a BIGINT, the int→double casts are exact below 2^53, and the final
  divide/multiply/sqrt are IEEE correctly-rounded — bit-identical in
  Spark and DuckDB with the same association order.

Scale: ``rolling_features`` is one shuffle + one sort per key;
``pairwise_pearson_counts`` reduces the fact table to one row of sums
(map-side combine) and emits |pairs| rows — no per-pair passes.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_features(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    *,
    window_rows: int = 5,
    momentum_lag: int = 3,
    tiebreak: str | None = None,
) -> DataFrame:
    """Append rolling indicator columns over the trailing ``window_rows``
    events per ``key`` (ordered by ``time_col``, then ``tiebreak``):

    - ``sma{N}``      — simple moving average (DECIMAL sum / exact count)
    - ``min{N}`` / ``max{N}`` — rolling extrema
    - ``range{N}``    — max − min (per-row IEEE subtraction, exact)
    - ``momentum{L}`` — value − value L rows earlier (NULL at series head)

    All frames share one (key, time, tiebreak) sort — a single shuffle
    and a single sort regardless of how many indicators are emitted.
    """
    order = [F.col(time_col).asc()] + \
        ([F.col(tiebreak).asc()] if tiebreak else [])
    wbase = Window.partitionBy(key).orderBy(*order)
    w = wbase.rowsBetween(-(window_rows - 1), Window.currentRow)
    v = F.col(value_col)
    sma = F.sum(v.cast("decimal(18,2)")).over(w).cast("double") \
        / F.count(v).over(w)
    mn, mx = F.min(v).over(w), F.max(v).over(w)
    return df.select(
        "*",
        sma.alias(f"sma{window_rows}"),
        mn.alias(f"min{window_rows}"),
        mx.alias(f"max{window_rows}"),
        (mx - mn).alias(f"range{window_rows}"),
        (v - F.lag(v, momentum_lag).over(wbase)).alias(f"momentum{momentum_lag}"),
    )


def pairwise_pearson_counts(
    counts: DataFrame,
    series_cols: list[str],
    *,
    min_periods: int = 2,
) -> DataFrame:
    """Pearson correlation for every unordered pair of integer-valued
    ``series_cols`` in a wide frame (one row per period), computed from
    a SINGLE aggregate pass of integer sums.

    Returns (series_a, series_b, n_periods, corr); ``corr`` is NULL when
    either series has zero variance or fewer than ``min_periods`` rows.
    Exact for |sums| < 2^53 (int→double casts lossless; the closing
    divide / multiply / sqrt are IEEE correctly-rounded).
    """
    # Both expression blocks are delivered as SQL TEXT (one parse each)
    # rather than O(pairs) Column-API calls: with k series the pair
    # block alone was ~40 py4j round trips per pair of plan-build time
    # (r12; measured 0.64 s for k=5 on q60). The parsed trees are the
    # exact CASE/CAST twins of the previous Column forms. Caller-supplied
    # series names are escaped at every interpolation point (backticks
    # doubled in identifiers, quotes doubled in string literals — r13
    # advisor catch), so a hostile column name cannot break the parse or
    # misresolve.
    series_cols = list(series_cols)
    ident = {c: c.replace("`", "``") for c in series_cols}
    aggs = [("count(1)", "__n")]
    for c in series_cols:
        cc = f"CAST(`{ident[c]}` AS BIGINT)"
        aggs.append((f"sum({cc})", f"__s_{c}"))
        aggs.append((f"sum({cc} * {cc})", f"__ss_{c}"))
    for a, b in combinations(series_cols, 2):
        aggs.append((f"sum(CAST(`{ident[a]}` AS BIGINT)"
                     f" * CAST(`{ident[b]}` AS BIGINT))",
                     f"__p_{a}_{b}"))
    row = counts.groupBy().agg(
        *[F.expr(t).alias(name) for t, name in aggs])

    structs = []
    for a, b in combinations(series_cols, 2):
        sa, sb = f"`__s_{ident[a]}`", f"`__s_{ident[b]}`"
        ssa, ssb = f"`__ss_{ident[a]}`", f"`__ss_{ident[b]}`"
        p = f"`__p_{ident[a]}_{ident[b]}`"
        num = f"CAST(__n * {p} - {sa} * {sb} AS DOUBLE)"
        dena = f"CAST(__n * {ssa} - {sa} * {sa} AS DOUBLE)"
        denb = f"CAST(__n * {ssb} - {sb} * {sb} AS DOUBLE)"
        corr = (f"CASE WHEN (__n >= {int(min_periods)}) AND ({dena} > 0)"
                f" AND ({denb} > 0) THEN {num} / (SQRT({dena})"
                f" * SQRT({denb})) ELSE CAST(NULL AS DOUBLE) END")
        la, lb = a.replace("'", "''"), b.replace("'", "''")
        structs.append(
            f"struct('{la}' AS series_a, '{lb}' AS series_b, "
            f"CAST(__n AS BIGINT) AS n_periods, {corr} AS corr)")
    return (row.select(F.expr("explode(array(" + ", ".join(structs) + "))")
                       .alias("__r"))
            .select("__r.*"))


EMA_COLS = ["ema_fast", "ema_slow", "macd", "macd_signal", "macd_hist"]


def ema_macd(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    *,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    tiebreak: str | None = None,
) -> DataFrame:
    """EMA(fast)/EMA(slow)/MACD/signal/histogram per ``key`` series —
    the reference's indicator family (functions/cleaning.py implements
    the F7 histogram arithmetic; the scoring jobs consume these as
    input columns).

    The EMA recurrence s_t = α·x_t + (1−α)·s_{t−1} (α = 2/(span+1),
    s_1 = x_1 — pandas ``adjust=False`` convention) is sequential per
    key, so it runs in Python — but NOT via ``applyInPandas`` (one
    Arrow round-trip per group: ~4× slower at 1,500 keys).  Instead:
    hash-repartition on the key, sort within partitions, and
    ``mapInPandas`` — each Arrow batch carries MANY whole groups, with
    a carry buffer for the one group that may straddle consecutive
    batches of the same partition.  One shuffle + one sort total; a
    few dozen Python round-trips instead of one per key.  Every step is
    two IEEE multiplies + one add in a fixed association order, so the
    result is bit-identical to any engine computing the same recurrence
    — including a DuckDB RECURSIVE CTE (oracle q63).
    """
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(c, T.DoubleType()) for c in EMA_COLS])

    a_f, a_s, a_g = 2.0 / (fast + 1.0), 2.0 / (slow + 1.0), 2.0 / (signal + 1.0)
    sort_cols = [time_col] + ([tiebreak] if tiebreak else [])

    def _fold(pdf):
        # ONE pass over a whole sorted batch holding MANY groups (r13,
        # guide §4.2): the key column is sorted, so a group restarts
        # exactly where consecutive keys differ — the previous
        # per-group pandas groupby/copy/concat cost ~200 µs of frame
        # machinery per key (measured dominant at 1,500 keys × 67
        # rows). Arithmetic is UNCHANGED expression-for-expression
        # (Python floats are IEEE doubles; hoisting the (1-α)
        # constants is exact), so every output double stays
        # bit-identical to the recursive-CTE oracle.
        import numpy as np
        n = len(pdf)
        ks = pdf[key].to_numpy()
        restart = np.empty(n, dtype=bool)
        restart[0] = True
        restart[1:] = ks[1:] != ks[:-1]
        xs = pdf[value_col].astype("float64").tolist()
        rs = restart.tolist()
        ef = [0.0] * n
        es = [0.0] * n
        macd = [0.0] * n
        sig = [0.0] * n
        hist = [0.0] * n
        cf, cs, cg = 1.0 - a_f, 1.0 - a_s, 1.0 - a_g
        pf = ps = pg = 0.0
        for i in range(n):
            x = xs[i]
            if rs[i]:
                pf = x
                ps = x
                m = pf - ps
                pg = m
            else:
                pf = a_f * x + cf * pf
                ps = a_s * x + cs * ps
                m = pf - ps
                pg = a_g * m + cg * pg
            ef[i] = pf
            es[i] = ps
            macd[i] = m
            sig[i] = pg
            hist[i] = m - pg
        pdf = pdf.copy()
        pdf["ema_fast"] = ef
        pdf["ema_slow"] = es
        pdf["macd"] = macd
        pdf["macd_signal"] = sig
        pdf["macd_hist"] = hist
        return pdf

    def compute(batches):
        carry = None                      # trailing (possibly partial) group
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            last_key = pdf[key].iloc[-1]
            tail = (pdf[key] == last_key).to_numpy()
            carry = pdf[tail]
            head = pdf[~tail]       # sorted ⇒ all complete groups
            if len(head):
                yield _fold(head)
        if carry is not None and len(carry):
            yield _fold(carry)

    parts = df.repartition(key).sortWithinPartitions(key, *sort_cols)
    return parts.mapInPandas(compute, out_schema)


def resample_counts(df: DataFrame, ts_col: str, key_col: str, *,
                    interval: str = "1 hour") -> DataFrame:
    """Dense per-interval counts with gap fill.

    Time-series consumers (forecasting features, rate alerting) need a
    row for EVERY period, including empty ones — a bare groupBy emits
    nothing for silent hours. Scale shape: the spine is built from ONE
    tiny global (min, max) aggregate (sequence() explode — rows =
    periods, independent of fact size), the key domain is a broadcast
    distinct, and the zero-fill is a left join of spine×keys against
    the grouped counts. No window spec, no per-key spine recompute.

    Rows and spine bucket through the SAME ``F.window(ts, interval)``
    tumbling assignment (epoch-aligned), so multi-unit intervals
    ('15 minutes', '2 hours') bucket correctly — a date_trunc of the
    base unit would drop every row not landing exactly on a spine
    period. NULL keys are preserved via a null-safe key join.
    """
    t = F.window(F.col(ts_col), interval).start
    bounds = df.select(t.alias("w")).agg(F.min("w").alias("h0"),
                                         F.max("w").alias("h1"))
    spine = bounds.select(F.explode(F.sequence(
        "h0", "h1", F.expr(f"INTERVAL {interval}"))).alias("period"))
    keys = df.select(F.col(key_col)).distinct()
    dense = spine.crossJoin(F.broadcast(keys))   # BNLJ over tiny frames
    counts = (df.groupBy(t.alias("__cp"), F.col(key_col).alias("__ck"))
              .agg(F.count(F.lit(1)).alias("n")))
    return (dense.join(counts,
                       (F.col("period") == F.col("__cp"))
                       & F.col(key_col).eqNullSafe(F.col("__ck")),
                       "left")
            .select("period", key_col,
                    F.coalesce(F.col("n"), F.lit(0)).alias("n")))


def trailing_window_stats(df: DataFrame, key_col: str, ts_col: str,
                          value_col: str, *, seconds: int = 3600,
                          dec_scale: str = "18,2") -> DataFrame:
    """Time-based (RANGE-frame) trailing aggregates: count and exact
    decimal sum of the last ``seconds`` per key, ordered by epoch
    seconds — the value-based frame ROWS windows can't express (rows
    per hour varies). One shuffle on the key; frame bounds are resolved
    by the sorted run, not a self-join."""
    w = (Window.partitionBy(key_col)
         .orderBy(F.unix_timestamp(F.col(ts_col)))
         .rangeBetween(-(seconds - 1), 0))
    return df.select(
        key_col, ts_col, value_col,
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum(F.col(value_col).cast(f"decimal({dec_scale})")).over(w)
         .cast("double").alias("sum_trailing"))
