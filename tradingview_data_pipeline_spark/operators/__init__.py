from tradingview_data_pipeline_spark.operators.scoring import (
    attach_peer_percentile_exact,
    bucket_by_global_rank,
    rank_within,
    group_zscore,
    peer_percentile,
    hierarchical_coalesce,
    weighted_sum,
    weighted_mean_renormalized,
    blend_with_default,
    top_k,
)

__all__ = [
    "attach_peer_percentile_exact", "bucket_by_global_rank", "rank_within", "group_zscore", "peer_percentile",
    "hierarchical_coalesce", "weighted_sum", "weighted_mean_renormalized",
    "blend_with_default", "top_k",
]
