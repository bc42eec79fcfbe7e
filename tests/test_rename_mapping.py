"""Column mapping for the versioned lake (sources.versioned.
rename_column): metadata-only renames over frozen physical names —
hardlink proof, time travel, merge/purge carry-through, full-rewrite
mapping retirement, stats/bloom pruning under logical names."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    clone_versioned,
    vacuum_versions,
    compact_versioned,
    merge_versioned,
    prune_files,
    purge_versioned,
    read_version,
    rename_column,
    write_version,
)

SCHEMA = "id long, val string, y int"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _mk(spark, tmp_path, partitioned=True, stats=False):
    base = str(tmp_path / "lake")
    write_version(
        _df(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 2)]),
        base,
        partition_by=["y"] if partitioned else (),
        stats_cols=["id"] if stats else (),
    )
    return base


def _inodes(base: str) -> set[int]:
    out = set()
    for root, _dirs, files in os.walk(base):
        for f in files:
            if f.endswith(".parquet"):
                out.add(os.stat(os.path.join(root, f)).st_ino)
    return out


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    base = _mk(spark, tmp_path)
    before = _inodes(base)
    v = rename_column(spark, base, {"val": "payload"})
    assert v == 2
    # zero data movement: every parquet inode is shared with v1
    assert _inodes(base) == before
    now = read_version(spark, base)
    assert set(now.columns) == {"id", "payload", "y"}
    assert sorted((r["id"], r["payload"]) for r in now.collect()) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    # old version still reads under the old name
    old = read_version(spark, base, as_of=1)
    assert set(old.columns) == {"id", "val", "y"}


def test_rename_rejects_partition_column_and_collisions(spark, tmp_path):
    base = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="partition column"):
        rename_column(spark, base, {"y": "year"})
    with pytest.raises(ValueError, match="collide"):
        rename_column(spark, base, {"val": "id"})
    with pytest.raises(ValueError, match="not in columns"):
        rename_column(spark, base, {"nope": "x"})


def test_merge_after_rename_keeps_physical_names(spark, tmp_path):
    base = _mk(spark, tmp_path)
    rename_column(spark, base, {"val": "payload"})
    upd = spark.createDataFrame(
        [(2, "B", 1), (4, "d", 2)], "id long, payload string, y int"
    )
    merge_versioned(spark, base, upd, keys=["id"], partition_by=["y"])
    now = read_version(spark, base)
    assert sorted((r["id"], r["payload"]) for r in now.collect()) == [
        (1, "a"), (2, "B"), (3, "c"), (4, "d")
    ]
    # the rewritten partition's files are physically named 'val': read
    # one raw file from the tip snapshot and check its columns
    from etl_opensky_spark.sources.versioned import _current

    tip = os.path.join(base, _current(base)["dir"])
    raw = spark.read.parquet(tip)
    assert "val" in raw.columns and "payload" not in raw.columns
    # untouched partition y=... from v1 still hardlink-shared
    assert len(_inodes(base)) > 0


def test_purge_after_rename(spark, tmp_path):
    base = _mk(spark, tmp_path)
    rename_column(spark, base, {"val": "payload"})
    _v, n = purge_versioned(
        spark,
        base,
        spark.createDataFrame([(1,)], "id long"),
        keys=["id"],
        partition_by=["y"],
    )
    assert n == 1
    now = read_version(spark, base)
    assert sorted(r["id"] for r in now.collect()) == [2, 3]
    assert "payload" in now.columns


def test_compact_materializes_logical_names_and_clears_mapping(
    spark, tmp_path
):
    base = _mk(spark, tmp_path, partitioned=False)
    rename_column(spark, base, {"val": "payload"})
    compact_versioned(spark, base)
    from etl_opensky_spark.sources.versioned import _current

    entry = _current(base)
    assert "column_mapping" not in entry
    tip = os.path.join(base, entry["dir"])
    raw = spark.read.parquet(tip)
    assert "payload" in raw.columns and "val" not in raw.columns
    assert sorted(
        r["payload"] for r in read_version(spark, base).collect()
    ) == ["a", "b", "c"]


def test_chained_renames_compose_to_original_physical(spark, tmp_path):
    base = _mk(spark, tmp_path)
    rename_column(spark, base, {"val": "v2"})
    rename_column(spark, base, {"v2": "v3"})
    from etl_opensky_spark.sources.versioned import _current

    assert _current(base)["column_mapping"] == {"v3": "val"}
    assert sorted(
        r["v3"] for r in read_version(spark, base).collect()
    ) == ["a", "b", "c"]
    # rename back to the physical name: mapping empties out
    rename_column(spark, base, {"v3": "val"})
    assert "column_mapping" not in _current(base) or not _current(base)[
        "column_mapping"
    ]
    assert sorted(
        r["val"] for r in read_version(spark, base).collect()
    ) == ["a", "b", "c"]


def test_stats_pruning_accepts_logical_names(spark, tmp_path):
    base = str(tmp_path / "lake")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartitionByRange(8, "k")
    write_version(df, base, stats_cols=["k"])
    rename_column(spark, base, {"k": "key"})
    kept, total = prune_files(base, {"key": (10, 20)})
    assert 0 < len(kept) < total
    got = read_version(spark, base, where={"key": (10, 20)})
    assert "key" in got.columns
    rows = got.filter(
        (F.col("key") >= 10) & (F.col("key") <= 20)
    ).count()
    assert rows == 11


def test_clone_carries_mapping(spark, tmp_path):
    base = _mk(spark, tmp_path)
    rename_column(spark, base, {"val": "payload"})
    dst = str(tmp_path / "clone")
    clone_versioned(base, dst)
    got = read_version(spark, dst)
    assert "payload" in got.columns
    assert sorted(r["payload"] for r in got.collect()) == ["a", "b", "c"]


def test_merge_schema_evolution_after_rename(spark, tmp_path):
    base = _mk(spark, tmp_path)
    rename_column(spark, base, {"val": "payload"})
    upd = spark.createDataFrame(
        [(5, "e", 2, 9.5)],
        "id long, payload string, y int, score double",
    )
    merge_versioned(
        spark, base, upd, keys=["id"], partition_by=["y"],
        merge_schema=True,
    )
    now = read_version(spark, base)
    assert set(now.columns) == {"id", "payload", "y", "score"}
    by_id = {r["id"]: r for r in now.collect()}
    assert by_id[5]["score"] == 9.5
    assert by_id[1]["score"] is None  # old hardlinked rows read null


# --- describe_history / restore_version -------------------------------------


def test_restore_rolls_back_content_append_only(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import (
        describe_history,
        restore_version,
    )

    base = _mk(spark, tmp_path)
    merge_versioned(
        spark,
        base,
        spark.createDataFrame([(1, "MUT", 1)], SCHEMA),
        keys=["id"],
        partition_by=["y"],
    )
    assert read_version(spark, base).filter(
        F.col("val") == "MUT"
    ).count() == 1
    v = restore_version(base, 1)
    assert v == 3
    # tip content == v1 content
    tip = sorted(tuple(r) for r in read_version(spark, base).collect())
    v1 = sorted(
        tuple(r) for r in read_version(spark, base, as_of=1).collect()
    )
    assert tip == v1
    # history is append-only: v2 still readable with its mutation
    assert read_version(spark, base, as_of=2).filter(
        F.col("val") == "MUT"
    ).count() == 1
    hist = describe_history(base)
    assert [h["op"] for h in hist] == ["write", "merge", "restore"]
    assert hist[-1]["version"] == 3


def test_restore_carries_mapping_and_stats(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import (
        restore_version,
    )

    base = _mk(spark, tmp_path, stats=True)
    rename_column(spark, base, {"val": "payload"})
    merge_versioned(
        spark,
        base,
        spark.createDataFrame(
            [(9, "z", 1)], "id long, payload string, y int"
        ),
        keys=["id"],
        partition_by=["y"],
        stats_cols=["id"],
    )
    restore_version(base, 2)  # rename snapshot, pre-merge
    now = read_version(spark, base)
    assert "payload" in now.columns
    assert sorted(r["id"] for r in now.collect()) == [1, 2, 3]
    # stats travel: logical-name pruning still plans
    kept, total = prune_files(base, {"id": (1, 1)})
    assert len(kept) <= total


def test_restore_survives_vacuum_of_source_version(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import (
        restore_version,
        vacuum_versions,
    )

    base = _mk(spark, tmp_path)
    merge_versioned(
        spark,
        base,
        spark.createDataFrame([(4, "d", 2)], SCHEMA),
        keys=["id"],
        partition_by=["y"],
    )
    restore_version(base, 1)
    vacuum_versions(base, keep_last=1)  # drops v1/v2 dirs, keeps v3
    tip = read_version(spark, base)
    assert sorted(r["id"] for r in tip.collect()) == [1, 2, 3]


# --- CHECK constraints ------------------------------------------------------


def test_constraint_rejects_bad_merge_before_staging(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import (
        ConstraintViolationError,
        add_constraint,
    )

    base = _mk(spark, tmp_path)
    add_constraint(spark, base, "val_nonempty", "length(val) > 0")
    with pytest.raises(ConstraintViolationError, match="val_nonempty"):
        merge_versioned(
            spark,
            base,
            spark.createDataFrame([(9, "", 1)], SCHEMA),
            keys=["id"],
            partition_by=["y"],
        )
    # nothing staged, nothing committed
    from etl_opensky_spark.sources.versioned import table_history

    assert table_history(base) == [1, 2]
    ok = merge_versioned(
        spark,
        base,
        spark.createDataFrame([(9, "ok", 1)], SCHEMA),
        keys=["id"],
        partition_by=["y"],
    )
    assert ok == 3


def test_constraint_null_passes_ansi_check(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import add_constraint

    base = _mk(spark, tmp_path)
    add_constraint(spark, base, "id_positive", "id > 0")
    upd = spark.createDataFrame([(7, None, 2)], SCHEMA)
    merge_versioned(spark, base, upd, keys=["id"], partition_by=["y"])
    assert read_version(spark, base).count() == 4


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import (
        ConstraintViolationError,
        add_constraint,
    )

    base = _mk(spark, tmp_path)
    with pytest.raises(ConstraintViolationError):
        add_constraint(spark, base, "only_a", "val = 'a'")


def test_constraint_rides_lifecycle_and_drops(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import (
        ConstraintViolationError,
        add_constraint,
        drop_constraint,
        restore_version,
        write_version as wv,
    )

    base = _mk(spark, tmp_path)
    add_constraint(spark, base, "id_positive", "id > 0")
    # survives purge and restore
    purge_versioned(
        spark, base, spark.createDataFrame([(3,)], "id long"),
        keys=["id"], partition_by=["y"],
    )
    restore_version(base, 2)
    with pytest.raises(ConstraintViolationError):
        merge_versioned(
            spark, base,
            spark.createDataFrame([(-1, "x", 1)], SCHEMA),
            keys=["id"], partition_by=["y"],
        )
    # full-overwrite write_version also validates
    with pytest.raises(ConstraintViolationError):
        wv(_df(spark, [(-5, "x", 1)]), base, partition_by=["y"])
    drop_constraint(base, "id_positive")
    merge_versioned(
        spark, base,
        spark.createDataFrame([(-1, "x", 1)], SCHEMA),
        keys=["id"], partition_by=["y"],
    )
    assert read_version(spark, base).filter(F.col("id") < 0).count() == 1


def test_rename_rejects_constrained_column(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import add_constraint

    base = _mk(spark, tmp_path)
    add_constraint(spark, base, "val_nonempty", "length(val) > 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        rename_column(spark, base, {"val": "payload"})
    # unrelated rename still fine (id unconstrained)
    rename_column(spark, base, {"id": "doc_id"})
    assert "doc_id" in read_version(spark, base).columns


# --- copy_into (file-level idempotent ingest) -------------------------------


def _landing(spark, tmp_path, n_files=2):
    src = str(tmp_path / "landing")
    import os

    os.makedirs(src, exist_ok=True)
    for i in range(n_files):
        spark.createDataFrame(
            [(i * 10 + j, f"r{i}-{j}") for j in range(3)],
            "id long, val string",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{i}")
        )
        import glob, shutil

        part = glob.glob(str(tmp_path / f"stage{i}" / "*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"batch{i}.parquet"))
    return src


def test_copy_into_is_file_idempotent(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import copy_into

    src = _landing(spark, tmp_path)
    base = str(tmp_path / "lake")
    v1, n1 = copy_into(spark, base, src)
    assert (v1, n1) == (1, 2)
    assert read_version(spark, base).count() == 6
    # re-run: nothing new, nothing committed
    v2, n2 = copy_into(spark, base, src)
    assert (v2, n2) == (1, 0)
    assert read_version(spark, base).count() == 6
    # a late file lands alone
    import os, shutil, glob

    spark.createDataFrame([(99, "late")], "id long, val string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "stage_late"))
    part = glob.glob(str(tmp_path / "stage_late" / "*.parquet"))[0]
    shutil.copy(part, os.path.join(src, "batch_late.parquet"))
    v3, n3 = copy_into(spark, base, src)
    assert (v3, n3) == (2, 1)
    assert read_version(spark, base).count() == 7
    # old snapshot isolation
    assert read_version(spark, base, as_of=1).count() == 6


def test_copy_into_respects_constraints_and_rename(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import (
        ConstraintViolationError,
        add_constraint,
        copy_into,
    )

    src = _landing(spark, tmp_path)
    base = str(tmp_path / "lake")
    copy_into(spark, base, src)
    add_constraint(spark, base, "id_small", "id < 50")
    rename_column(spark, base, {"val": "payload"})
    import glob, os, shutil

    spark.createDataFrame([(99, "big")], "id long, val string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "bad"))
    part = glob.glob(str(tmp_path / "bad" / "*.parquet"))[0]
    shutil.copy(part, os.path.join(src, "bad.parquet"))
    with pytest.raises(ConstraintViolationError):
        copy_into(spark, base, src)
    os.remove(os.path.join(src, "bad.parquet"))
    spark.createDataFrame([(42, "ok")], "id long, val string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "good"))
    part = glob.glob(str(tmp_path / "good" / "*.parquet"))[0]
    shutil.copy(part, os.path.join(src, "good.parquet"))
    v, n = copy_into(spark, base, src)
    assert n == 1
    got = read_version(spark, base)
    assert "payload" in got.columns
    assert got.filter(F.col("id") == 42).count() == 1


# --- merge-on-read deletes (deletion vectors) -------------------------------


def test_mor_delete_is_metadata_cheap_and_correct(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import purge_versioned_mor

    base = _mk(spark, tmp_path)
    before = _inodes(base)
    v, n = purge_versioned_mor(
        spark, base, spark.createDataFrame([(1,), (3,)], "id long"), ["id"]
    )
    assert (v, n) == (2, 2)
    # every DATA inode hardlink-shared: nothing was rewritten
    after = {
        os.stat(os.path.join(r, f)).st_ino
        for r, ds, fs in os.walk(base)
        for f in fs
        if f.endswith(".parquet") and "_tomb" not in r
    }
    assert before <= after
    assert sorted(r["id"] for r in read_version(spark, base).collect()) == [2]
    # time travel: pre-delete snapshot intact
    assert read_version(spark, base, as_of=1).count() == 3
    # no-match delete commits nothing
    v2, n2 = purge_versioned_mor(
        spark, base, spark.createDataFrame([(99,)], "id long"), ["id"]
    )
    assert (v2, n2) == (2, 0)


def test_mor_tombstones_stack_and_compact_materializes(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import (
        _current,
        purge_versioned_mor,
    )

    base = _mk(spark, tmp_path, partitioned=False)
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(1,)], "id long"), ["id"]
    )
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(2,)], "id long"), ["id"]
    )
    assert len(_current(base)["tombstones"]) == 2
    assert read_version(spark, base).count() == 1
    compact_versioned(spark, base)
    entry = _current(base)
    assert "tombstones" not in entry
    assert read_version(spark, base).count() == 1
    # the materialized snapshot has no hidden sidecars
    tip = os.path.join(base, entry["dir"])
    assert not [d for d in os.listdir(tip) if d.startswith("_tomb")]


def test_mor_survives_partitioned_merge_without_resurrection(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import purge_versioned_mor

    base = _mk(spark, tmp_path)  # partitions y=1 (ids 1,2), y=2 (id 3)
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(3,)], "id long"), ["id"]
    )
    # merge touches ONLY partition y=1; y=2 stays hardlinked with the
    # deleted row physically present — the tombstone must still apply
    merge_versioned(
        spark,
        base,
        spark.createDataFrame([(2, "B", 1)], SCHEMA),
        keys=["id"],
        partition_by=["y"],
    )
    got = sorted(r["id"] for r in read_version(spark, base).collect())
    assert got == [1, 2]  # id 3 must NOT resurface


def test_mor_composes_with_rename_and_stats(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import purge_versioned_mor

    base = str(tmp_path / "lake")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartitionByRange(4, "k")
    write_version(df, base, stats_cols=["k"])
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(5,), (50,)], "k long"), ["k"]
    )
    rename_column(spark, base, {"k": "key"})
    got = read_version(spark, base, where={"key": (0, 10)})
    vals = sorted(
        r["key"] for r in got.filter(F.col("key") <= 10).collect()
    )
    assert vals == [0, 1, 2, 3, 4, 6, 7, 8, 9, 10]  # 5 tombstoned
