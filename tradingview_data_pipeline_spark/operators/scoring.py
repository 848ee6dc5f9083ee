"""Peer-relative scoring operators (SURVEY §2.4 A1–A9, §2.5 W1–W7).

All operators are pure DataFrame/window compositions — one shuffle per
grouping granularity, no Python in the hot path. Reference citations are
file:line in ``/root/reference/``.

Scale notes (100 TB design point):
- Window functions shuffle on their partition keys; every operator here
  partitions by a business key (sector/industry/category), never globally —
  except ``bucket_by_global_rank`` in parity mode, which is documented and
  gated (see its docstring for the scale-mode alternative).
- Peer statistics at multiple granularities are computed as *windowed
  aggregates over the same shuffled layout* where possible (industry windows
  are sub-partitions of sector windows), letting Spark reuse one exchange
  for nested keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# W1 — global ordinal bucketing by rank (calcompositescore.py:206-218)
# Sort by metric desc nulls-last; rows [0,100) -> 'Large Cap', [100,250) ->
# 'Mid Cap', [250,500) -> 'Small Cap', rest 'Micro Cap'; NULL metric -> NULL.
# ---------------------------------------------------------------------------

def bucket_by_global_rank(
    df: DataFrame,
    metric: str,
    out_col: str = "market_cap_category",
    boundaries: Sequence[tuple[int, str]] = ((100, "Large Cap"), (250, "Mid Cap"), (500, "Small Cap")),
    default_label: str = "Micro Cap",
    tie_break: str | None = None,
    mode: str = "parity",
) -> DataFrame:
    """Assign ordinal buckets from a global descending rank of ``metric``.

    ``mode='parity'`` reproduces the reference exactly with
    ``row_number`` over an unpartitioned window — a single-task sort, fine
    up to ~10^6 rows (the reference runs at 1.6k). pandas breaks ties by
    prior row order; we make it deterministic with ``tie_break`` (key asc).

    ``mode='scale'`` avoids the single-partition window: it computes the
    metric values at the boundary ranks (a tiny 2-phase job: per-partition
    top-N counts -> boundary thresholds) and buckets by range comparison,
    which is a map-only pass after one small aggregate. Boundary-rank ties
    may land one row differently than parity mode — documented deviation.
    """
    order = [F.col(metric).desc_nulls_last()]
    if tie_break:
        order.append(F.col(tie_break).asc())

    if mode == "parity":
        rn = F.row_number().over(Window.orderBy(*order))
        bucket = F.lit(None).cast("string")
        # build the when-chain from the last boundary down so earlier ranges win
        expr = F.lit(default_label)
        for upper, label in reversed(list(boundaries)):
            expr = F.when(rn <= upper, F.lit(label)).otherwise(expr)
        bucket = F.when(F.col(metric).isNotNull(), expr)
        return df.withColumn(out_col, bucket)

    # scale mode: thresholds via a driver-side tiny collect of the boundary
    # order statistics; at 100 TB this is one sort-limited aggregate of
    # max(boundary) rows, not a global sort of the table.
    max_rank = max(u for u, _ in boundaries)
    top = (
        df.where(F.col(metric).isNotNull())
        .select(metric)
        .orderBy(F.col(metric).desc())
        .limit(max_rank)
        .collect()
    )
    vals = [r[0] for r in top]
    expr = F.lit(default_label)
    for upper, label in reversed(list(boundaries)):
        if upper <= len(vals):
            thr = vals[upper - 1]
            expr = F.when(F.col(metric) >= thr, F.lit(label)).otherwise(expr)
        else:
            expr = F.lit(label)
    return df.withColumn(out_col, F.when(F.col(metric).isNotNull(), expr))


# ---------------------------------------------------------------------------
# W2 — rank within partition (calfundamentalscore.py:339-349)
# ---------------------------------------------------------------------------

def rank_within(df: DataFrame, partition_by: Sequence[str], order_metric: str,
                out_col: str = "rank", tie_break: str | None = None,
                ascending: bool = False) -> DataFrame:
    """1..N ordinal per group. pandas assigns positionally after a sort (ties
    by prior order); we pin ties with ``tie_break`` asc for determinism."""
    order = [F.col(order_metric).asc_nulls_last() if ascending
             else F.col(order_metric).desc_nulls_last()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return df.withColumn(out_col, F.row_number().over(w))


# ---------------------------------------------------------------------------
# W3 + A1 — per-group z-score with min-group gate (calcompositescore.py:222-270)
# valid = non-null values; skip (-> 0.0 contribution) if n_valid < 3 or
# stddev_samp == 0 (pandas std is ddof=1); null value -> 0.0.
# ---------------------------------------------------------------------------

def group_zscore(value: Column, w: WindowSpec, *, min_group: int = 3,
                 level_weight: float = 1.0) -> Column:
    mu = F.avg(value).over(w)
    sd = F.stddev_samp(value).over(w)      # ddof=1, matches pandas .std()
    n = F.count(value).over(w)             # count() skips nulls, like pandas
    z = (value - mu) / sd * F.lit(level_weight)
    return F.when(value.isNull() | (n < min_group) | (sd == 0) | sd.isNull(),
                  F.lit(0.0)).otherwise(z)


# ---------------------------------------------------------------------------
# W4 + A9 — peer-relative percentile, count-comparison formulation
# (calfundamentalscore.py:137-159): pct = 100 * #{peers < v} / #peers
# (strict >, i.e. inverted, when lower_is_better); peers = non-null values
# in the group INCLUDING self; < 2 peers -> 50.0; v null -> null.
#
# #{peers < v} == rank(v) - 1 when ranked ascending with nulls last, so no
# self-join is needed — one windowed rank per metric, shuffle shared across
# metrics on the same keys.
# ---------------------------------------------------------------------------

def peer_percentile(df: DataFrame, metric: str, partition_by: Sequence[str],
                    out_col: str | None = None, *, lower_is_better: bool = False,
                    min_peers: int = 2) -> DataFrame:
    out_col = out_col or f"{metric}_pct"
    v = F.col(metric)
    direction = v.asc_nulls_last() if not lower_is_better else v.desc_nulls_last()
    w = Window.partitionBy(*partition_by).orderBy(direction)
    wg = Window.partitionBy(*partition_by)
    n = F.count(v).over(wg)
    pct = (F.rank().over(w) - F.lit(1)) * 100.0 / n
    return df.withColumn(
        out_col,
        F.when(v.isNull(), F.lit(None).cast("double"))
         .when(n < min_peers, F.lit(50.0))
         .otherwise(pct),
    )


def peer_percentile_col(value: Column, rank_w: WindowSpec, group_w: WindowSpec,
                        *, min_peers: int = 2) -> Column:
    """Column-form of peer_percentile for composing several metrics over
    pre-built windows (shares the shuffle across metrics)."""
    n = F.count(value).over(group_w)
    pct = (F.rank().over(rank_w) - F.lit(1)) * 100.0 / n
    return (F.when(value.isNull(), F.lit(None).cast("double"))
             .when(n < min_peers, F.lit(50.0))
             .otherwise(pct))


# ---------------------------------------------------------------------------
# W5/W6 — hierarchical peer-group fallback (calfundamentalscore.py:162-180;
# calcompositescore.py:292-299). Group = finest granularity whose member
# count (including NaN-metric rows) >= min_members, else next, else coarsest.
# ---------------------------------------------------------------------------

def hierarchical_coalesce(
    df: DataFrame,
    granularities: Sequence[Sequence[str]],
    value_at: Sequence[Column],
    out_col: str,
    *,
    min_members: int = 5,
) -> DataFrame:
    """Pick ``value_at[i]`` for the first granularity whose group size
    (count(*), nulls included — reference counts rows not valid values)
    meets ``min_members``; the last granularity is the unconditional floor.

    ``granularities`` are ordered finest → coarsest; an empty key list means
    the global group. The per-granularity values must already be windowed
    columns over the same keys, so everything resolves in one select.
    """
    assert len(granularities) == len(value_at)
    counts = []
    for keys in granularities:
        w = Window.partitionBy(*keys) if keys else Window.partitionBy()
        counts.append(F.count(F.lit(1)).over(w))
    # build from coarsest backward so finest granularity wins
    expr = value_at[-1]
    for cnt, val in zip(counts[:-1][::-1], list(value_at[:-1])[::-1]):
        expr = F.when(cnt >= min_members, val).otherwise(expr)
    return df.withColumn(out_col, expr)


# ---------------------------------------------------------------------------
# A6 — horizontal weighted sum across columns (calcompositescore.py:161-198)
# null contributions count as 0 (pandas fillna(0)).
# ---------------------------------------------------------------------------

def weighted_sum(weights: dict[str, float]) -> Column:
    terms = [F.coalesce(F.col(c), F.lit(0.0)) * F.lit(w) for c, w in weights.items()]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


# ---------------------------------------------------------------------------
# A7 — weighted mean with weight renormalization over present metrics
# (calfundamentalscore.py:206-228): sum(s_i*w_i)/sum(w_i) over non-null s_i;
# NULL if no metric present.
# ---------------------------------------------------------------------------

def weighted_mean_renormalized(weights: dict[str, float]) -> Column:
    num = None
    den = None
    for c, w in weights.items():
        s = F.col(c)
        t_num = F.when(s.isNotNull(), s * F.lit(w)).otherwise(F.lit(0.0))
        t_den = F.when(s.isNotNull(), F.lit(w)).otherwise(F.lit(0.0))
        num = t_num if num is None else num + t_num
        den = t_den if den is None else den + t_den
    return F.when(den > 0, num / den)


# ---------------------------------------------------------------------------
# A8 — fixed-weight blend with neutral default (calfundamentalscore.py:304-316)
# ---------------------------------------------------------------------------

def blend_with_default(weights: dict[str, float], default: float = 50.0) -> Column:
    out = None
    for c, w in weights.items():
        t = F.coalesce(F.col(c), F.lit(float(default))) * F.lit(w)
        out = t if out is None else out + t
    return out


# ---------------------------------------------------------------------------
# W7 — top-k / bottom-k (calcompositescore.py:396-399)
# Spark plans this as TakeOrderedAndProject: per-partition heap + driver
# merge — no global sort, scale-safe.
# ---------------------------------------------------------------------------

def top_k(df: DataFrame, metric: str, k: int = 10, *, ascending: bool = False,
          tie_break: str | None = None) -> DataFrame:
    order = [F.col(metric).asc_nulls_last() if ascending
             else F.col(metric).desc_nulls_last()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    return df.orderBy(*order).limit(k)
