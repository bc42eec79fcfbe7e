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


def test_decode_kafka_records_static(spark):
    import json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_opensky_spark.streaming.kafka import (
        KAFKA_WIRE_SCHEMA,
        decode_kafka_records,
    )

    import datetime as dt

    value_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (None, json.dumps({"event_id": 1, "event_type": "a"}).encode(),
         "t", 0, 100, ts, 0),
        (None, b"not json at all", "t", 0, 101, ts, 0),
    ]
    wire = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    out = decode_kafka_records(wire, value_schema).collect()
    good = [r for r in out if not r["is_corrupt"]]
    bad = [r for r in out if r["is_corrupt"]]
    assert len(good) == 1 and good[0]["event_id"] == 1
    assert good[0]["offset"] == 100 and good[0]["topic"] == "t"
    assert len(bad) == 1 and bad[0]["event_id"] is None


def test_decode_kafka_records_composes_with_windowed_counts(spark):
    """The decoded stream feeds the same windowed agg as any other source
    — proves the adapter is source-agnostic (memory source stand-in)."""
    import json

    import datetime as dt

    from pyspark.sql import types as T

    from etl_opensky_spark.streaming.daily import windowed_counts
    from etl_opensky_spark.streaming.kafka import (
        KAFKA_WIRE_SCHEMA,
        decode_kafka_records,
    )

    value_schema = T.StructType([T.StructField("event_type", T.StringType())])
    rows = [
        (None, json.dumps({"event_type": k}).encode(), "t", 0, i,
         dt.datetime(2024, 1, 1 + d, 6), 0)
        for i, (k, d) in enumerate([("a", 0), ("a", 0), ("b", 0), ("a", 1)])
    ]
    wire = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    decoded = decode_kafka_records(wire, value_schema, ts_col="ts")
    got = {
        (r["window_start"].day, r["event_type"]): r["n"]
        for r in windowed_counts(decoded, ts_col="ts").collect()
    }
    assert got == {(1, "a"): 2, (1, "b"): 1, (2, "a"): 1}


def test_kafka_stream_raises_clear_error_without_connector(spark):
    import pytest as _pytest

    from etl_opensky_spark.streaming.kafka import kafka_stream

    with _pytest.raises(RuntimeError, match="kafka connector unavailable"):
        kafka_stream(spark, "localhost:9092", "topic")


def test_jittered_duplicates_caught_only_by_watermark_keyed_dedup(
    spark, tmp_path
):
    from etl_opensky_spark.streaming.daily import (
        dedup_jittered_within_watermark,
    )

    path = str(tmp_path / "jitter")
    rows = [
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 01:00:30", "click"),  # same key, re-stamped +30s
        (2, "2024-01-01 02:00:00", "view"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts string, event_type string"
    ).select(
        "event_id", F.col("ts").cast("timestamp"), "event_type"
    ).write.mode("overwrite").parquet(path)

    stream = file_stream(spark, path, SCHEMA)
    run_to_memory(
        dedup_within_watermark(stream, keys=["event_id"]), "strict_d", "append"
    )
    # strict (key, ts) dedup passes BOTH jittered copies
    assert spark.table("strict_d").filter(F.col("event_id") == 1).count() == 2

    stream2 = file_stream(spark, path, SCHEMA)
    run_to_memory(
        dedup_jittered_within_watermark(stream2, keys=["event_id"]),
        "jitter_d",
        "append",
    )
    got = spark.table("jitter_d")
    assert got.filter(F.col("event_id") == 1).count() == 1
    assert got.count() == 2
