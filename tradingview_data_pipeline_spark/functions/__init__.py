from tradingview_data_pipeline_spark.functions.cleaning import (
    clean_value,
    clean_long,
    parse_unit_string,
    normalize_text,
    rating_to_score,
    guarded_rel_diff,
    macd_histogram,
    clip_upper,
    minmax_normalize,
    scale_volatility,
    unscale_volatility,
    hash_id,
    truncate_str,
    strip_prefix,
    compose_url,
    round_py,
    round_py_sql,
)

__all__ = [
    "clean_value", "clean_long", "parse_unit_string", "normalize_text",
    "rating_to_score", "guarded_rel_diff", "macd_histogram", "clip_upper",
    "minmax_normalize", "scale_volatility", "unscale_volatility",
    "hash_id", "truncate_str", "strip_prefix", "compose_url",
    "round_py", "round_py_sql",
]
