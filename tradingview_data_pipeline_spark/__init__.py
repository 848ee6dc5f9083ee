"""tradingview_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (``sandywhat2eat/tradingview-data-pipeline``):
tolerant CSV ingestion with header mapping, a cleaning-function library,
peer-relative scoring operators (z-scores, percentiles, hierarchical
fallback groups, rank bucketing), merge/upsert table maintenance, and
streaming ingestion — plus the large-scale training-data operators a 100 TB
pipeline needs (dedup, similarity search, text analysis, multimodal columns).

Everything is declarative DataFrame/SQL so Catalyst owns the physical plan;
no row-at-a-time Python in the hot path.
"""

from tradingview_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
