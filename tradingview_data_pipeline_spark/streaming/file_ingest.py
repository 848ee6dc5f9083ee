"""Streaming file ingestion (SURVEY §2.9, M6).

The reference's cron + "newest CSV by mtime" loop (uploadtodb.py:46-57,
README.md:161-167) is a file-arrival micro-batch pattern. Structured
Streaming expresses it directly: a file source watches the directory,
``Trigger.AvailableNow`` processes everything pending then stops (cron-
compatible), checkpointing replaces the mtime bookkeeping, and every file
is processed exactly once — the reference would silently skip a second
file landing between cron ticks; the stream does not.

The per-batch sink is the same MERGE used by the batch path (foreachBatch
-> ParquetTable.merge_upsert), so batch and streaming share one code path
— the unified-API property this engine is designed around.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tradingview_data_pipeline_spark.functions.cleaning import (
    clean_string_spark_sql, clean_value_spark_sql)
from tradingview_data_pipeline_spark.operators.merge import ParquetTable


def _mapped_select(df: DataFrame, header_map: dict[str, str],
                   schema: T.StructType, audit_col: str = "last_modified_date"):
    """Same mapping/cleaning contract as sources.csv_adapter, expressed on
    a streaming DataFrame (no duplicate-header rewrite — streaming reads
    use the declared all-string schema, so headers are already unique)."""
    target_fields = {f.name: f for f in schema.fields}
    # SQL-text projection — same single-parse rationale and form-
    # equivalence pin as sources.csv_adapter (r12, guide §7.3)
    exprs = []
    for src, dst in header_map.items():
        f = target_fields.get(dst)
        if f is None:
            continue
        dq = dst.replace("`", "``")
        if src in df.columns:
            sq = f"`{src.replace('`', '``')}`"
            if isinstance(f.dataType, T.DoubleType):
                e = clean_value_spark_sql(sq)
            elif isinstance(f.dataType, T.LongType):
                e = f"CAST(try_cast({sq} AS DOUBLE) AS BIGINT)"
            else:
                e = clean_string_spark_sql(sq)
        else:
            e = f"CAST(NULL AS {f.dataType.simpleString()})"
        exprs.append(f"{e} AS `{dq}`")
    out = df.selectExpr(*exprs)
    if audit_col in target_fields:
        out = out.withColumn(audit_col, F.current_timestamp())
    return out


def stream_csv_to_table(
    spark: SparkSession,
    directory: str,
    header_map: dict[str, str],
    table: ParquetTable,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    csv_header_columns: list[str] | None = None,
    expectations: list | None = None,
    quarantine_dir: str | None = None,
):
    """Watch ``directory`` for CSVs and MERGE each micro-batch into
    ``table``. Returns the started StreamingQuery.

    ``csv_header_columns``: the file's header order (streaming CSV needs a
    declared schema; pass the expected raw headers). Defaults to the
    header_map keys in order. Because Spark binds a user CSV schema
    POSITIONALLY, ``enforceSchema`` is set false so the reader validates
    each file's header against the declared names and fails loudly on a
    column-order mismatch instead of silently mis-assigning fields.

    ``expectations`` (``operators.quality.Expect`` list): each micro-batch
    passes the quality gate BEFORE the MERGE. With ``quarantine_dir``,
    violating rows append there as parquet (stamped ``__batch_id``) and
    the clean remainder merges; without it, a failing batch raises and
    the stream stops — the checkpoint will replay the batch after the
    data is fixed, so bad files cannot be silently half-applied.
    """
    raw_cols = csv_header_columns or list(header_map.keys())
    raw_schema = T.StructType([T.StructField(c, T.StringType()) for c in raw_cols])
    stream = (
        spark.readStream.schema(raw_schema)
        .option("header", True)
        .option("enforceSchema", False)
        .option("maxFilesPerTrigger", 16)
        .csv(directory)
    )
    mapped = _mapped_select(stream, header_map, table.schema)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if expectations:
            from tradingview_data_pipeline_spark.operators import quality as q
            if quarantine_dir is not None:
                good, _report = q.enforce(batch_df, expectations,
                                          mode="quarantine")
                # complement of the clean filter: a row violates when ANY
                # predicate is false OR null (where() drops null matches)
                viol_pred = None
                for e in expectations:
                    p = ~F.coalesce(e.predicate, F.lit(False))
                    viol_pred = p if viol_pred is None else (viol_pred | p)
                # partition by batch id + DYNAMIC overwrite: foreachBatch
                # is at-least-once, and a replayed batch must replace its
                # own quarantine partition, not append a duplicate copy —
                # this makes the quarantine sink idempotent like the MERGE
                (batch_df.where(viol_pred)
                 .withColumn("__batch_id", F.lit(batch_id))
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("__batch_id")
                 .parquet(quarantine_dir))
                batch_df = good
            else:
                batch_df, _ = q.enforce(batch_df, expectations, mode="raise")
        table.merge_upsert(batch_df)

    writer = mapped.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
