"""CDC replication (operators/replication.py): feed-driven table sync."""

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.operators.replication import (
    _cursor,
    replica_in_sync,
    replicate_versioned,
)
from etl_opensky_spark.sources.versioned import (
    _current,
    compact_versioned,
    merge_versioned,
    purge_versioned_mor,
    read_version,
    write_version,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val string, p int")


@pytest.fixture()
def pair(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_version(
        _df(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 2)]),
        src,
        partition_by=["p"],
    )
    replicate_versioned(spark, src, dst, ["id"], partition_by=["p"])
    return src, dst


def test_seed_then_incremental_sync(spark, pair):
    src, dst = pair
    assert replica_in_sync(spark, src, dst, ["id"])
    merge_versioned(
        spark, src, _df(spark, [(2, "B", 1), (4, "d", 2)]), ["id"], ["p"]
    )
    purge_versioned_mor(
        spark, src, spark.createDataFrame([(1,)], "id long"), ["id"]
    )
    v, reflected = replicate_versioned(
        spark, src, dst, ["id"], partition_by=["p"]
    )
    assert reflected == _current(src)["version"]
    assert replica_in_sync(spark, src, dst, ["id"])


def test_update_then_delete_collapses_to_delete(spark, pair):
    src, dst = pair
    merge_versioned(spark, src, _df(spark, [(3, "C", 2)]), ["id"], ["p"])
    purge_versioned_mor(
        spark, src, spark.createDataFrame([(3,)], "id long"), ["id"]
    )
    replicate_versioned(spark, src, dst, ["id"], partition_by=["p"])
    assert replica_in_sync(spark, src, dst, ["id"])
    assert read_version(spark, dst).filter(F.col("id") == 3).count() == 0


def test_insert_then_delete_churn_still_advances_cursor(spark, pair):
    src, dst = pair
    merge_versioned(spark, src, _df(spark, [(9, "x", 1)]), ["id"], ["p"])
    purge_versioned_mor(
        spark, src, spark.createDataFrame([(9,)], "id long"), ["id"]
    )
    v, reflected = replicate_versioned(
        spark, src, dst, ["id"], partition_by=["p"]
    )
    assert reflected == _current(src)["version"]
    assert _cursor(dst)["source_version"] == reflected
    assert replica_in_sync(spark, src, dst, ["id"])


def test_row_preserving_source_commit_advances_via_annotate(spark, pair):
    src, dst = pair
    compact_versioned(spark, src)
    v, reflected = replicate_versioned(
        spark, src, dst, ["id"], partition_by=["p"]
    )
    assert reflected == _current(src)["version"]
    assert _current(dst)["op"] == "annotate"
    assert replica_in_sync(spark, src, dst, ["id"])


def test_noop_when_source_unchanged(spark, pair):
    src, dst = pair
    v0 = _current(dst)["version"]
    v, _ = replicate_versioned(spark, src, dst, ["id"], partition_by=["p"])
    assert v == v0


def test_crash_replay_converges(spark, pair):
    # simulate a cycle that crashed after its MERGE half: the upserts
    # landed on the replica WITHOUT cursor meta, the deletes did not
    src, dst = pair
    merge_versioned(spark, src, _df(spark, [(2, "B2", 1)]), ["id"], ["p"])
    purge_versioned_mor(
        spark, src, spark.createDataFrame([(1,)], "id long"), ["id"]
    )
    merge_versioned(
        spark, dst, _df(spark, [(2, "B2", 1)]), ["id"], ["p"]
    )  # the crashed half-cycle (no user_meta -> cursor unmoved)
    v, reflected = replicate_versioned(
        spark, src, dst, ["id"], partition_by=["p"]
    )
    assert reflected == _current(src)["version"]
    assert replica_in_sync(spark, src, dst, ["id"])


def test_schema_add_propagates(spark, pair):
    src, dst = pair
    merge_versioned(
        spark,
        src,
        spark.createDataFrame(
            [(2, "B", 1, "note")], "id long, val string, p int, extra string"
        ),
        ["id"],
        ["p"],
        merge_schema=True,
    )
    replicate_versioned(spark, src, dst, ["id"], partition_by=["p"])
    assert "extra" in read_version(spark, dst).columns
    assert replica_in_sync(spark, src, dst, ["id"])


def test_replica_is_itself_a_versioned_table(spark, pair):
    src, dst = pair
    merge_versioned(spark, src, _df(spark, [(5, "e", 2)]), ["id"], ["p"])
    replicate_versioned(spark, src, dst, ["id"], partition_by=["p"])
    # time travel on the REPLICA sees its own pre-sync state
    assert read_version(spark, dst, as_of=1).count() == 3
    assert read_version(spark, dst).count() == 4
