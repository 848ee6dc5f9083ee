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
