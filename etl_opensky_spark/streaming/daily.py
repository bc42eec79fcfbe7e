"""Structured Streaming surface (SURVEY §2.12 mapping).

The reference's incrementality is batch micro-partitions on an Airflow
daily schedule; these are the streaming-native equivalents:

- daily partition        -> 1-day tumbling window (``F.window(ts, "1 day")``)
- subtract-based dedup   -> ``dropDuplicates`` within a watermark
- idempotent append      -> ``foreachBatch`` EXCEPT-append (exactly-once
                            per micro-batch via the checkpointed batch id)

All entry points take a streaming DataFrame and return one, so sources
(file, kafka, rate) stay pluggable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    window: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Watermarked tumbling-window counts — the streaming form of the daily
    partition aggregate."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *keys)
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), *keys, "n")
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming dedup on a business key: state is bounded by the watermark
    (late duplicates beyond it are passed through — same contract as the
    reference's per-day reconciliation, which also only dedups within the
    day being reprocessed)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(
        [*keys, ts_col]
    )


def dedup_jittered_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Spark 3.5+ ``dropDuplicatesWithinWatermark``: dedup on the
    BUSINESS KEY ALONE even when duplicate deliveries carry DIFFERENT
    event-time values (reprocessing jitter, clock-skewed producers,
    retry pipelines that re-stamp) — the case ``dedup_within_watermark``
    (keyed on ``(keys, ts)``) cannot catch, because the jittered copy
    is a different row under that key.  Per-key state is dropped once
    the watermark passes the first-seen event time plus the gap, so
    state stays bounded exactly as in the strict variant."""
    return stream.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(list(keys))


def append_missing_sink(
    stream: DataFrame,
    target_path: str,
    partition_by: Sequence[str],
    checkpoint_dir: str,
    spark: SparkSession | None = None,
):
    """Idempotent streaming append: each micro-batch EXCEPTs the target's
    affected partitions before appending (the reference's subtract-append,
    reference: src/jobs/extract_flights.py:80-99, executed per micro-batch;
    replays of a batch after failure re-subtract, so the sink converges).

    The subtract reads ONLY the partitions present in the batch (an IN
    filter on the partition columns — partition pruning), and target
    existence is checked explicitly so a transient read error fails the
    batch (checkpoint retries it) instead of silently double-appending.
    """
    from etl_opensky_spark.plans.ingest_flights import path_exists

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        session = batch_df.sparkSession
        if path_exists(session, target_path):
            batch_parts = [
                tuple(r) for r in batch_df.select(*partition_by).distinct().collect()
            ]
            existing = session.read.parquet(target_path).select(*batch_df.columns)
            if batch_parts:
                pred = None
                for values in batch_parts:
                    clause = None
                    for col_name, value in zip(partition_by, values):
                        eq = F.col(col_name) == F.lit(value)
                        clause = eq if clause is None else (clause & eq)
                    pred = clause if pred is None else (pred | clause)
                existing = existing.filter(pred)
            to_append = batch_df.subtract(existing)
        else:
            # EXCEPT is distinct — keep the no-target path consistent
            to_append = batch_df.distinct()
        to_append.write.mode("append").partitionBy(*partition_by).parquet(target_path)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def file_stream(
    spark: SparkSession, directory: str, schema, glob: str | None = None
) -> DataFrame:
    """File-based streaming source (directory-watching; availableNow runs
    drain whatever is present and stop)."""
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(directory)
