"""Streaming tests: windowed counts vs batch oracle, watermark dedup,
idempotent foreachBatch append (run-twice convergence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_opensky_spark.streaming.daily import (
    append_missing_sink,
    dedup_within_watermark,
    file_stream,
    windowed_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "events")
    rows = [
        (1, "2024-01-01 01:00:00", "click"),
        (2, "2024-01-01 02:00:00", "click"),
        (3, "2024-01-01 03:00:00", "view"),
        (4, "2024-01-02 01:00:00", "click"),
        (2, "2024-01-01 02:00:00", "click"),  # duplicate event
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, event_type string")
    df.select("event_id", F.col("ts").cast("timestamp"), "event_type").write.mode(
        "overwrite"
    ).parquet(path)
    return path


def run_to_memory(stream_df, name: str, mode: str):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def test_windowed_counts_match_batch(spark, events_dir):
    stream = file_stream(spark, events_dir, SCHEMA)
    run_to_memory(windowed_counts(stream), "wc", "complete")
    got = {
        (str(r["window_start"]), r["event_type"]): r["n"]
        for r in spark.table("wc").collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == 3  # dup counted: raw stream
    assert got[("2024-01-01 00:00:00", "view")] == 1
    assert got[("2024-01-02 00:00:00", "click")] == 1


def test_dedup_within_watermark(spark, events_dir):
    stream = file_stream(spark, events_dir, SCHEMA)
    deduped = dedup_within_watermark(stream, keys=["event_id"])
    run_to_memory(deduped, "dd", "append")
    ids = sorted(r["event_id"] for r in spark.table("dd").collect())
    assert ids == [1, 2, 3, 4]  # duplicate event_id=2 collapsed


def test_append_missing_sink_idempotent(spark, events_dir, tmp_path):
    target = str(tmp_path / "target")
    for i in range(2):  # run the whole stream twice with fresh checkpoints
        stream = file_stream(spark, events_dir, SCHEMA)
        q = append_missing_sink(
            stream.withColumn("day", F.to_date("ts")),
            target,
            partition_by=["day"],
            checkpoint_dir=str(tmp_path / f"ckpt{i}"),
        )
        q.awaitTermination()
    out = spark.read.parquet(target)
    # duplicates collapsed by the EXCEPT, second full replay added nothing
    assert out.count() == 4
