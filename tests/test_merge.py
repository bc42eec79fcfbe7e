"""merge_parquet_keyed: keyed MERGE upsert over a parquet lake path.

Covers the MERGE contract (update + insert + partition move), the
copy-on-write guarantee (untouched partitions are not rewritten), writer
isolation (lock), idempotency, and a hypothesis property comparing the
on-disk result against a driver-side reference merge.
"""

from __future__ import annotations

import os
import threading

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_opensky_spark.sources.sinks import (
    ConcurrentMergeError,
    merge_parquet_keyed,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

SCHEMA = "id long, val string, y int"


def _write_target(spark, path, rows):
    merge_parquet_keyed(
        spark, path, spark.createDataFrame(rows, SCHEMA), ["id"], ["y"]
    )


def _read(spark, path):
    return sorted(
        tuple(r) for r in spark.read.parquet(path).select("id", "val", "y").collect()
    )


def test_merge_update_insert(spark, tmp_path):
    path = str(tmp_path / "lake")
    _write_target(spark, path, [(1, "a", 1997), (2, "b", 1997), (3, "c", 1998)])
    upd = spark.createDataFrame([(2, "B", 1997), (4, "d", 1998)], SCHEMA)
    merge_parquet_keyed(spark, path, upd, ["id"], ["y"])
    assert _read(spark, path) == [
        (1, "a", 1997),
        (2, "B", 1997),
        (3, "c", 1998),
        (4, "d", 1998),
    ]


def test_merge_untouched_partition_not_rewritten(spark, tmp_path):
    """Copy-on-write: a partition with no matched keys and no incoming
    rows keeps its exact files (names AND mtimes)."""
    path = str(tmp_path / "lake")
    _write_target(spark, path, [(1, "a", 1997), (3, "c", 1998)])
    cold = os.path.join(path, "y=1998")
    before = {
        f: os.stat(os.path.join(cold, f)).st_mtime_ns
        for f in os.listdir(cold)
        if not f.startswith(("_", "."))
    }
    upd = spark.createDataFrame([(1, "A", 1997), (5, "e", 1997)], SCHEMA)
    merge_parquet_keyed(spark, path, upd, ["id"], ["y"])
    after = {
        f: os.stat(os.path.join(cold, f)).st_mtime_ns
        for f in os.listdir(cold)
        if not f.startswith(("_", "."))
    }
    assert before == after and before
    assert _read(spark, path) == [(1, "A", 1997), (3, "c", 1998), (5, "e", 1997)]


def test_merge_partition_move_vacates_old_partition(spark, tmp_path):
    """A key whose partition value changes is deleted from its old
    partition — including when that empties the partition entirely."""
    path = str(tmp_path / "lake")
    _write_target(spark, path, [(1, "a", 1997), (2, "b", 1998)])
    upd = spark.createDataFrame([(2, "b2", 1999)], SCHEMA)
    merge_parquet_keyed(spark, path, upd, ["id"], ["y"])
    assert _read(spark, path) == [(1, "a", 1997), (2, "b2", 1999)]
    assert not os.path.exists(os.path.join(path, "y=1998"))


def test_merge_partition_stable_flag_skips_move_scan(spark, tmp_path):
    path = str(tmp_path / "lake")
    _write_target(spark, path, [(1, "a", 1997), (2, "b", 1998)])
    upd = spark.createDataFrame([(2, "B", 1998), (9, "i", 1997)], SCHEMA)
    merge_parquet_keyed(
        spark, path, upd, ["id"], ["y"], keys_are_partition_stable=True
    )
    assert _read(spark, path) == [(1, "a", 1997), (2, "B", 1998), (9, "i", 1997)]


def test_merge_unpartitioned(spark, tmp_path):
    path = str(tmp_path / "flat")
    df = spark.createDataFrame([(1, "a", 0), (2, "b", 0)], SCHEMA)
    merge_parquet_keyed(spark, path, df, ["id"])
    upd = spark.createDataFrame([(2, "B", 0), (3, "c", 0)], SCHEMA)
    merge_parquet_keyed(spark, path, upd, ["id"])
    assert _read(spark, path) == [(1, "a", 0), (2, "B", 0), (3, "c", 0)]


def test_merge_duplicate_update_keys_rejected(spark, tmp_path):
    path = str(tmp_path / "lake")
    _write_target(spark, path, [(1, "a", 1997)])
    upd = spark.createDataFrame([(2, "x", 1997), (2, "y", 1997)], SCHEMA)
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_parquet_keyed(spark, path, upd, ["id"], ["y"])


def test_merge_null_partition_value_rejected(spark, tmp_path):
    path = str(tmp_path / "lake")
    _write_target(spark, path, [(1, "a", 1997)])
    upd = spark.createDataFrame([(2, "x", None)], SCHEMA)
    with pytest.raises(ValueError, match="null partition"):
        merge_parquet_keyed(spark, path, upd, ["id"], ["y"])


def test_merge_schema_mismatch_rejected(spark, tmp_path):
    path = str(tmp_path / "lake")
    _write_target(spark, path, [(1, "a", 1997)])
    upd = spark.createDataFrame([(2, 1997)], "id long, y int")
    with pytest.raises(ValueError, match="columns"):
        merge_parquet_keyed(spark, path, upd, ["id"], ["y"])


def test_merge_idempotent(spark, tmp_path):
    path = str(tmp_path / "lake")
    _write_target(spark, path, [(1, "a", 1997), (2, "b", 1998)])
    upd = spark.createDataFrame([(2, "B", 1998), (3, "c", 1997)], SCHEMA)
    merge_parquet_keyed(spark, path, upd, ["id"], ["y"])
    once = _read(spark, path)
    merge_parquet_keyed(spark, path, upd, ["id"], ["y"])
    assert _read(spark, path) == once


def test_merge_lock_blocks_second_writer(spark, tmp_path):
    path = str(tmp_path / "lake")
    _write_target(spark, path, [(1, "a", 1997)])
    lock = path + "._merge.lock"
    open(lock, "w").close()
    upd = spark.createDataFrame([(2, "b", 1997)], SCHEMA)
    with pytest.raises(ConcurrentMergeError):
        merge_parquet_keyed(spark, path, upd, ["id"], ["y"])
    os.remove(lock)
    merge_parquet_keyed(spark, path, upd, ["id"], ["y"])  # released -> fine
    assert not os.path.exists(lock)  # lock dropped after success


def test_merge_concurrent_writers_serialize(spark, tmp_path):
    """Two writers with a lock timeout: both apply, neither corrupts —
    the concurrent-writer race the reference's check-then-append loses
    (extract_flights.py:80-92)."""
    path = str(tmp_path / "lake")
    _write_target(spark, path, [(1, "a", 1997), (2, "b", 1998)])
    errs = []

    def work(rows):
        try:
            upd = spark.createDataFrame(rows, SCHEMA)
            merge_parquet_keyed(
                spark, path, upd, ["id"], ["y"], lock_timeout_sec=60.0
            )
        except Exception as exc:  # noqa: BLE001 — assert below
            errs.append(exc)

    t1 = threading.Thread(target=work, args=([(3, "c", 1997), (1, "A", 1997)],))
    t2 = threading.Thread(target=work, args=([(4, "d", 1998), (2, "B", 1998)],))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert _read(spark, path) == [
        (1, "A", 1997),
        (2, "B", 1998),
        (3, "c", 1997),
        (4, "d", 1998),
    ]


ids = st.integers(0, 6)
parts = st.integers(2000, 2002)
rows_strategy = st.lists(
    st.tuples(ids, st.text("ab", min_size=1, max_size=2), parts),
    min_size=0,
    max_size=8,
    unique_by=lambda r: r[0],
)


@SETTINGS
@given(target=rows_strategy, updates=rows_strategy)
def test_merge_matches_reference_semantics(spark, tmp_path_factory, target, updates):
    """On-disk MERGE result == driver-side reference merge (dict update
    keyed by id) for arbitrary small target/update sets."""
    path = str(tmp_path_factory.mktemp("prop") / "lake")
    tdf = spark.createDataFrame(target, SCHEMA)
    merge_parquet_keyed(spark, path, tdf, ["id"], ["y"])
    if not target:
        # empty frame -> empty dataset dir; nothing to merge into yet
        return
    udf = spark.createDataFrame(updates, SCHEMA)
    merge_parquet_keyed(spark, path, udf, ["id"], ["y"])
    expected = {r[0]: r for r in target}
    expected.update({r[0]: r for r in updates})
    assert _read(spark, path) == sorted(expected.values())
