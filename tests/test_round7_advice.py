"""Round-7 ADVICE regression tests — one test per reported defect.

1. Non-ASCII partition values must not un-apply scoped MOR deletes
   (``versioned._tomb_scope_files`` URI-encoding mismatch).
2. A lakefeed microbatch with no new commits must never re-emit the
   already-consumed tip commit (placeholder partition replay).
3. The DS-API writer must clean up its assembled snapshot dir when it
   loses the ``put_if_absent`` commit race.
4. ``vacuum_orphans`` must collect ``_dsw-staging-``/``_opt-staging-``
   crash debris, not only the ``_staging-`` prefix.
5. ``optimize_small_files`` must clean up its assembled snapshot dir
   on ANY pre-commit failure, not only a lost commit race.
6. The lakefeed reader must not require the ``_n_cols`` side-channel
   (a user-supplied ``.schema(...)`` bypassed ``DataSource.schema()``).

Plus the round-7 VERDICT task #1 pins: both Python DS-API readers
yield ``pyarrow.RecordBatch`` (columnar), never per-row tuples.
"""

from __future__ import annotations

import json
import os

import pytest

from etl_opensky_spark.sources.lakefeed import register_lakefeed_source
from etl_opensky_spark.sources.lakesource import register_versioned_source
from etl_opensky_spark.sources.versioned import (
    ConcurrentCommitError,
    _commit_path,
    _read_log,
    _test_hooks,
    materialize_change_feed,
    merge_versioned,
    optimize_small_files,
    purge_versioned_mor,
    read_version,
    vacuum_orphans,
    write_version,
)

from .conftest import rows


def _data_dirs(base):
    return sorted(
        n for n in os.listdir(base)
        if n.startswith("data-") and os.path.isdir(os.path.join(base, n))
    )


def _staging_dirs(base):
    return sorted(n for n in os.listdir(base) if "staging" in n)


# --- 1. non-ASCII partition values vs scoped tombstones ------------------


def test_mor_delete_applies_in_nonascii_partition(spark, tmp_path):
    """Hadoop's URI leaves non-ASCII path chars RAW while urllib.quote
    would %XX-encode their UTF-8 bytes — a ``city=Zürich`` partition
    previously fell outside every tombstone scope and its deleted rows
    resurfaced."""
    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(1, "Zürich"), (2, "Zürich"), (3, "Paris"), (4, "xé中")],
        "id int, city string",
    )
    write_version(df, base, partition_by=["city"])
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(1,), (4,)], "id int"), ["id"]
    )
    assert rows(read_version(spark, base)) == [(2, "Zürich"), (3, "Paris")]
    # and the scoped semantics still hold there: a re-inserted key in a
    # NEW file is outside the old scope and stays visible
    merge_versioned(
        spark, base,
        spark.createDataFrame([(1, "Zürich")], "id int, city string"),
        ["id"],
    )
    assert rows(read_version(spark, base)) == [
        (1, "Zürich"), (2, "Zürich"), (3, "Paris"),
    ]


# --- 2. lakefeed empty-microbatch placeholder -----------------------------


def _feed(spark, tmp_path):
    src = str(tmp_path / "src")
    feed = str(tmp_path / "feed")
    write_version(
        spark.createDataFrame([], "id int, v string"), src
    )
    merge_versioned(
        spark, src,
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"),
        ["id"],
    )
    materialize_change_feed(spark, src, feed, ["id"])
    return src, feed


def test_lakefeed_empty_batch_never_replays_tip(spark, tmp_path):
    """start == end (restart / no new data) used to plan a placeholder
    partition at ``commit=<hi>`` — an existing, already-consumed dir —
    re-emitting its rows under a fresh batch_id."""
    from etl_opensky_spark.sources.lakefeed import LakeFeedStreamReader

    _src, feed = _feed(spark, tmp_path)
    reader = LakeFeedStreamReader({"path": feed})
    hi = reader.latestOffset()["version"]
    assert hi > 0
    parts = reader.partitions({"version": hi}, {"version": hi})
    assert len(parts) == 1 and parts[0].version == -1
    assert list(reader.read(parts[0])) == []
    # non-empty planning is untouched
    live = reader.partitions({"version": 0}, {"version": hi})
    assert [p.version for p in live] and all(p.version > 0 for p in live)


def test_lakefeed_reader_yields_record_batches(spark, tmp_path):
    """VERDICT r6 #1: the stream reader decodes columnar — every yield
    is a pyarrow.RecordBatch carrying the constant ``commit`` column."""
    import pyarrow as pa

    from etl_opensky_spark.sources.lakefeed import LakeFeedStreamReader

    _src, feed = _feed(spark, tmp_path)
    reader = LakeFeedStreamReader({"path": feed})
    hi = reader.latestOffset()["version"]
    out = []
    for p in reader.partitions({"version": 0}, {"version": hi}):
        for b in reader.read(p):
            assert isinstance(b, pa.RecordBatch)
            assert b.schema.names[-1] == "commit"
            assert b["commit"].to_pylist() == [p.version] * b.num_rows
            out.extend(b["id"].to_pylist())
    assert sorted(out) == [1, 2]


def test_lakefeed_user_schema_bypasses_schema_hook(spark, tmp_path):
    """A user-supplied ``.schema(...)`` on readStream skips
    ``DataSource.schema()``; the reader previously crashed on the
    ``_n_cols`` option that only that hook populated."""
    _src, feed = _feed(spark, tmp_path)
    register_lakefeed_source(spark)
    ddl = (
        "id int, v string, _change_type string, _commit_version int, "
        "commit int"
    )
    q = (
        spark.readStream.format("lakefeed")
        .schema(ddl)
        .load(feed)
        .writeStream.format("memory")
        .queryName("r7_user_schema")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt_user_schema")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = rows(
        spark.table("r7_user_schema").select("id", "_change_type")
    )
    assert got == [(1, "insert"), (2, "insert")]


# --- 3. DS writer loses the commit race -> snapshot dir removed ----------


def test_ds_writer_lost_race_cleans_snapshot_dir(spark, tmp_path):
    from etl_opensky_spark.sources.lakesource import VersionedLakeWriter

    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([(1, "a")], "id int, v string"), base
    )
    import pyarrow as pa

    schema = read_version(spark, base).schema
    writer = VersionedLakeWriter({"path": base}, schema, overwrite=False)
    msg = writer.write(
        iter([pa.record_batch({"id": pa.array([2], pa.int32()),
                               "v": pa.array(["b"])})])
    )

    v1_dir = _read_log(base)[-1]["dir"]

    def _steal():  # one-shot: land the competing commit v2 first
        _test_hooks.pop("before_commit", None)
        with open(_commit_path(base, 2), "x") as fh:
            json.dump(
                {"version": 2, "dir": v1_dir, "op": "write", "parent": 1},
                fh,
            )

    _test_hooks["before_commit"] = _steal
    try:
        with pytest.raises(ConcurrentCommitError):
            writer.commit([msg])
    finally:
        _test_hooks.pop("before_commit", None)
    live = {e["dir"] for e in _read_log(base)}
    assert set(_data_dirs(base)) == live  # no orphan snapshot dir
    assert _staging_dirs(base) == []


# --- 4. vacuum_orphans collects every staging family ----------------------


def test_vacuum_orphans_collects_all_staging_prefixes(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([(1, "a")], "id int, v string"), base
    )
    debris = [
        "_staging-aaaa", "_dsw-staging-bbbb", "_opt-staging-cccc",
        "data-deadbeef0000",
    ]
    for d in debris:
        os.makedirs(os.path.join(base, d))
    removed = vacuum_orphans(base)
    assert sorted(removed) == sorted(debris)
    live = {e["dir"] for e in _read_log(base)}
    assert set(_data_dirs(base)) == live


# --- 5. optimize_small_files cleans up on ANY pre-commit failure ----------


def test_optimize_failure_cleans_snapshot_dir(spark, tmp_path):
    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "id int, v string"
    )
    df.repartition(4).write.parquet(str(tmp_path / "stage"))
    write_version(spark.read.parquet(str(tmp_path / "stage")), base)

    def _boom():
        _test_hooks.pop("before_commit", None)
        raise RuntimeError("injected non-CCE failure")

    _test_hooks["before_commit"] = _boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            optimize_small_files(spark, base, target_rows_per_file=100)
    finally:
        _test_hooks.pop("before_commit", None)
    live = {e["dir"] for e in _read_log(base)}
    assert set(_data_dirs(base)) == live
    assert _staging_dirs(base) == []
    # the table is untouched and a retry succeeds
    v, n = optimize_small_files(spark, base, target_rows_per_file=100)
    assert n >= 2
    assert read_version(spark, base).count() == 8


# --- VERDICT #1: batch-source reader yields RecordBatches -----------------


def test_lakesource_reader_yields_record_batches(spark, tmp_path):
    """The batch DS reader decodes columnar: RecordBatch yields with
    partition-value constant columns and the vectorized tombstone mask
    already applied."""
    import pyarrow as pa

    from etl_opensky_spark.sources.lakesource import VersionedLakeReader

    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(1, "x", "Zürich"), (2, "y", "Zürich"), (3, "z", "Paris")],
        "id int, v string, city string",
    )
    write_version(df, base, partition_by=["city"])
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(2,)], "id int"), ["id"]
    )
    register_versioned_source(spark)
    schema = spark.read.format("versioned").load(base).schema
    reader = VersionedLakeReader({"path": base}, schema)
    got = []
    for p in reader.partitions():
        for b in reader.read(p):
            assert isinstance(b, pa.RecordBatch)
            assert b.schema.names == ["id", "v", "city"]
            got.extend(zip(*(b[c].to_pylist() for c in b.schema.names)))
    assert sorted(got) == [(1, "x", "Zürich"), (3, "z", "Paris")]
