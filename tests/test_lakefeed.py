"""``lakefeed`` streaming data source — commit-version offsets over the
materialized change feed (sources/lakefeed.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.lakefeed import register_lakefeed_source
from etl_opensky_spark.sources.versioned import (
    materialize_change_feed,
    merge_versioned,
    purge_versioned_mor,
    write_version,
)

from .conftest import rows


def _df(spark, pairs):
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], "id int, v string"
    )


def _lake_with_feed(spark, tmp_path):
    src = str(tmp_path / "src")
    feed = str(tmp_path / "feed")
    write_version(_df(spark, []), src)
    merge_versioned(spark, src, _df(spark, [(1, "a"), (2, "b")]), ["id"])
    merge_versioned(spark, src, _df(spark, [(2, "b2"), (3, "c")]), ["id"])
    materialize_change_feed(spark, src, feed, ["id"])
    return src, feed


def _drain(spark, feed, name, ckpt):
    q = (
        spark.readStream.format("lakefeed")
        .load(feed)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_stream_matches_batch_read(spark, tmp_path):
    _src, feed = _lake_with_feed(spark, tmp_path)
    register_lakefeed_source(spark)
    got = _drain(spark, feed, "lf1", str(tmp_path / "ck"))
    want = spark.read.parquet(feed)  # hive-partitioned batch read
    assert sorted(got.columns) == sorted(want.columns)
    assert rows(got.select(*sorted(got.columns))) == rows(
        want.select(*sorted(got.columns))
    )
    # every change class flowed through with its commit offset
    by_type = {
        (r["_change_type"], r["commit"]) for r in got.collect()
    }
    assert ("insert", 2) in by_type
    assert ("update_preimage", 3) in by_type
    assert ("update_postimage", 3) in by_type


def test_incremental_offsets_pick_up_only_new_commits(spark, tmp_path):
    """The checkpoint stores {'version': v}: a restarted stream over
    the same checkpoint reads ONLY commits past the stored offset
    (memory sink can't recover checkpoints, so collect via
    foreachBatch — the production sink shape anyway)."""
    src, feed = _lake_with_feed(spark, tmp_path)
    register_lakefeed_source(spark)
    ckpt = str(tmp_path / "ck")
    seen: list[tuple] = []

    def run():
        def collect(batch_df, _bid):
            seen.extend(
                (r["_change_type"], r["id"], r["commit"])
                for r in batch_df.collect()
            )

        q = (
            spark.readStream.format("lakefeed")
            .load(feed)
            .writeStream.foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    n1 = len(seen)
    assert n1 == spark.read.parquet(feed).count()
    # new commit window: a MOR delete, re-materialized
    purge_versioned_mor(
        spark, src, spark.createDataFrame([(1,)], "id int"), ["id"]
    )
    materialize_change_feed(spark, src, feed, ["id"])
    seen.clear()
    run()  # same checkpoint: only the new offset replays
    assert seen == [("delete", 1, 4)]


def test_schema_requires_materialized_feed(spark, tmp_path):
    register_lakefeed_source(spark)
    empty = str(tmp_path / "nofeed")
    import os

    os.makedirs(empty)
    with pytest.raises(Exception, match="no commit"):
        spark.readStream.format("lakefeed").load(empty)


def test_decimal_and_partitioned_table_types_roundtrip(spark, tmp_path):
    """Decimals and multiple column types survive the arrow->DDL->rows
    path byte-exactly."""
    from decimal import Decimal

    src = str(tmp_path / "src")
    feed = str(tmp_path / "feed")
    df = spark.createDataFrame(
        [(1, Decimal("10.25"), "x")], "k bigint, price decimal(18,2), s string"
    )
    write_version(df.filter(F.lit(False)), src)
    merge_versioned(spark, src, df, ["k"])
    materialize_change_feed(spark, src, feed, ["k"])
    register_lakefeed_source(spark)
    got = _drain(spark, feed, "lf3", str(tmp_path / "ck")).collect()
    assert len(got) == 1
    r = got[0]
    assert r["price"] == Decimal("10.25") and r["k"] == 1 and r["s"] == "x"
