"""Streamable change feed: materialize_change_feed + readStream."""

import os

from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    materialize_change_feed,
    merge_versioned,
    purge_versioned_mor,
    write_version,
)


def _mk(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
        ),
        base,
    )
    merge_versioned(
        spark,
        base,
        spark.createDataFrame([(2, "B"), (4, "d")], "id long, val string"),
        ["id"],
    )
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(1,)], "id long"), ["id"]
    )
    return base


def test_materialize_is_idempotent_and_complete(spark, tmp_path):
    base = _mk(spark, tmp_path)
    feed = str(tmp_path / "cdf")
    n_commits, n_rows = materialize_change_feed(spark, base, feed, ["id"])
    assert n_commits == 2  # v2 merge + v3 MOR delete; v1 seed excluded
    assert n_rows == 4     # update pre+post, insert, delete
    assert materialize_change_feed(spark, base, feed, ["id"]) == (0, 0)
    # a later commit materializes incrementally
    merge_versioned(
        spark,
        base,
        spark.createDataFrame([(4, "D")], "id long, val string"),
        ["id"],
    )
    n_commits, n_rows = materialize_change_feed(spark, base, feed, ["id"])
    assert (n_commits, n_rows) == (1, 2)
    # single-writer default: no claim files, just the commit dirs
    assert sorted(os.listdir(feed)) == ["commit=2", "commit=3", "commit=4"]


def test_feed_is_a_real_streaming_source(spark, tmp_path):
    base = _mk(spark, tmp_path)
    feed = str(tmp_path / "cdf")
    materialize_change_feed(spark, base, feed, ["id"])
    schema = spark.read.parquet(feed).schema
    seen = []

    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(feed)
    )
    q = (
        stream.writeStream.trigger(availableNow=True)
        .foreachBatch(
            lambda df, _bid: seen.extend(
                (r["id"], r["_change_type"]) for r in df.collect()
            )
        )
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    q.awaitTermination(120)
    assert sorted(seen) == [
        (1, "delete"),
        (2, "update_postimage"),
        (2, "update_preimage"),
        (4, "insert"),
    ]
