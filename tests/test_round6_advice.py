"""Round-6 ADVICE fixes for the versioned lake.

1. (high) MOR tombstones are FILE-SCOPED (Delta deletion-vector
   semantics): a delete applies only to the data files that existed at
   delete time, so a later merge re-insert or copy_into append of the
   same key stays visible, while the physically-deleted old rows stay
   hidden.
2. (medium) restore_version never rolls the identity high-water mark
   backwards.
3. (medium) write_version carries the identity rider across full
   overwrites.
4. (low) copy_into harvests footer stats under frozen physical names on
   column-mapped tables.
5. (low) write_version pins one materialization for constraint check,
   identity count, and the data write.
"""

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    _current,
    add_constraint,
    copy_into,
    merge_versioned,
    prune_files,
    purge_versioned_mor,
    read_version,
    rename_column,
    restore_version,
    write_version,
)

from .conftest import rows


def _lake(spark, tmp_path, partitioned=True):
    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(1, "p1", "a"), (2, "p1", "b"), (3, "p2", "c"), (4, "p2", "d")],
        "id int, part string, v string",
    )
    write_version(df, base, partition_by=("part",) if partitioned else ())
    return base


# --- 1. file-scoped tombstones ---------------------------------------------


def test_mor_delete_then_merge_reinsert_visible(spark, tmp_path):
    base = _lake(spark, tmp_path)
    dk = spark.createDataFrame([(3,)], "id int")
    purge_versioned_mor(spark, base, dk, keys=("id",))
    assert sorted(r["id"] for r in read_version(spark, base).collect()) == [
        1, 2, 4,
    ]
    # re-insert id=3 through a keyed MERGE: the new row lands in a new
    # file outside the tombstone's scope and MUST be visible
    upd = spark.createDataFrame(
        [(3, "p2", "c2")], "id int, part string, v string"
    )
    merge_versioned(spark, base, upd, keys=("id",), partition_by=("part",))
    got = {r["id"]: r["v"] for r in read_version(spark, base).collect()}
    assert got == {1: "a", 2: "b", 3: "c2", 4: "d"}


def test_mor_delete_then_copy_into_append_visible(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id int, v string"
        ),
        base,
    )
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(3,)], "id int"), keys=("id",)
    )
    landing = str(tmp_path / "landing")
    spark.createDataFrame(
        [(3, "c-new")], "id int, v string"
    ).coalesce(1).write.parquet(landing)
    copy_into(spark, base, landing)
    got = sorted(
        (r["id"], r["v"]) for r in read_version(spark, base).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c-new")]


def test_reinsert_does_not_resurface_old_row(spark, tmp_path):
    """The key's OLD physical row (hardlinked, in the tombstone's file
    scope) stays deleted even after the key is re-inserted into a
    DIFFERENT partition — the table remains key-unique."""
    base = _lake(spark, tmp_path)
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(1,)], "id int"), keys=("id",)
    )
    # re-insert id=1 into p2; old id=1 row lived in p1 (hardlinked)
    upd = spark.createDataFrame(
        [(1, "p2", "a-new")], "id int, part string, v string"
    )
    merge_versioned(spark, base, upd, keys=("id",), partition_by=("part",))
    got = sorted(
        (r["id"], r["part"], r["v"])
        for r in read_version(spark, base).collect()
    )
    assert got == [
        (1, "p2", "a-new"), (2, "p1", "b"), (3, "p2", "c"), (4, "p2", "d"),
    ]


def test_scoped_tombstone_survives_unrelated_merge(spark, tmp_path):
    """A merge NOT touching the deleted key hardlinks its partition; the
    scoped tombstone still hides the old row afterwards."""
    base = _lake(spark, tmp_path)
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(3,)], "id int"), keys=("id",)
    )
    upd = spark.createDataFrame(
        [(2, "p1", "b2")], "id int, part string, v string"
    )
    merge_versioned(spark, base, upd, keys=("id",), partition_by=("part",))
    got = {r["id"]: r["v"] for r in read_version(spark, base).collect()}
    assert got == {1: "a", 2: "b2", 4: "d"}


def test_scoped_tombstone_time_travel(spark, tmp_path):
    base = _lake(spark, tmp_path)
    v_del, n = purge_versioned_mor(
        spark, base, spark.createDataFrame([(3,)], "id int"), keys=("id",)
    )
    assert n == 1
    merge_versioned(
        spark,
        base,
        spark.createDataFrame(
            [(3, "p2", "c2")], "id int, part string, v string"
        ),
        keys=("id",),
        partition_by=("part",),
    )
    # pre-delete snapshot: all four original rows
    assert sorted(
        r["id"] for r in read_version(spark, base, as_of=1).collect()
    ) == [1, 2, 3, 4]
    # the delete-era snapshot still hides id=3
    assert sorted(
        r["id"] for r in read_version(spark, base, as_of=v_del).collect()
    ) == [1, 2, 4]


def test_scoped_tombstone_with_stats_pruned_read(spark, tmp_path):
    """The pruned read path carries file provenance correctly."""
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 9)], "id int, v string"
        ).repartition(2),
        base,
        stats_cols=("id",),
    )
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(5,)], "id int"), keys=("id",)
    )
    kept, total = prune_files(base, {"id": (1, 8)})
    assert kept
    got = sorted(
        r["id"]
        for r in read_version(spark, base, where={"id": (1, 8)}).collect()
    )
    assert got == [1, 2, 3, 4, 6, 7, 8]


def test_scoped_tombstone_uri_escaped_partition_values(spark, tmp_path):
    """``_metadata.file_path`` is URI-encoded (space -> %20, %% -> %25,
    '+' untouched) while the scope sidecar stores raw on-disk paths —
    the encoding seam that silently un-applied deletes in partitions
    like ``4-NOT SPECIFIED`` (q277 regression)."""
    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [
            (1, "4-NOT SPECIFIED", "a"),
            (2, "4-NOT SPECIFIED", "b"),
            (3, "a+b", "c"),
            (4, "x%20y", "d"),
        ],
        "id int, part string, v string",
    )
    write_version(df, base, partition_by=("part",))
    purge_versioned_mor(
        spark,
        base,
        spark.createDataFrame([(1,), (3,), (4,)], "id int"),
        keys=("id",),
    )
    assert sorted(
        r["id"] for r in read_version(spark, base).collect()
    ) == [2]
    # and the post-delete merge re-insert stays visible across all three
    # escaping classes
    merge_versioned(
        spark,
        base,
        spark.createDataFrame(
            [(3, "a+b", "c2")], "id int, part string, v string"
        ),
        keys=("id",),
        partition_by=("part",),
    )
    assert sorted(
        (r["id"], r["v"]) for r in read_version(spark, base).collect()
    ) == [(2, "b"), (3, "c2")]


# --- 2/3. identity rider carriage ------------------------------------------


def test_restore_keeps_identity_high_water_monotone(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([("a",), ("b",), ("c",)], "name string"),
        base,
        identity_col="id",
    )
    assert _current(base)["identity"] == {"col": "id", "next": 4}
    write_version(
        spark.createDataFrame([("d",), ("e",)], "name string"), base
    )
    assert _current(base)["identity"]["next"] == 6
    restore_version(base, 1)
    # content is v1's, but the mark never rolls back
    assert _current(base)["identity"]["next"] == 6
    landing = str(tmp_path / "landing")
    spark.createDataFrame([("f",)], "name string").coalesce(1).write.parquet(
        landing
    )
    copy_into(spark, base, landing)
    ids = sorted(r["id"] for r in read_version(spark, base).collect())
    assert ids == [1, 2, 3, 6]  # no id reuse after the restore


def test_write_version_carries_identity_across_overwrite(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([("a",), ("b",)], "name string"),
        base,
        identity_col="id",
    )
    # full overwrite WITHOUT re-passing identity_col: rider persists,
    # GENERATED ALWAYS stays enforced, ids continue from the mark
    write_version(
        spark.createDataFrame([("c",), ("d",), ("e",)], "name string"), base
    )
    cur = _current(base)
    assert cur["identity"] == {"col": "id", "next": 6}
    ids = sorted(r["id"] for r in read_version(spark, base).collect())
    assert ids == [3, 4, 5]
    # and a frame that explicitly carries the column is still rejected
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_version(
            spark.createDataFrame([(99, "x")], "id long, name string"), base
        )


# --- 4. copy_into stats on a column-mapped table ---------------------------


def test_copy_into_stats_translate_through_mapping(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id int, val string"
        ),
        base,
        stats_cols=("id",),
    )
    rename_column(spark, base, {"id": "ident"})
    landing = str(tmp_path / "landing")
    spark.createDataFrame(
        [(10, "c")], "id int, val string"
    ).toDF("ident", "val").coalesce(1).write.parquet(landing)
    copy_into(spark, base, landing, stats_cols=("ident",))
    cur = _current(base)
    stats = cur["stats"]
    # every data file contributes stats under the frozen physical name
    assert stats and all("id" in per_col for per_col in stats.values())
    kept, total = prune_files(base, {"ident": (10, 10)})
    assert len(kept) < total  # pruning actually bites on the mapped col


# --- 5. one materialization for check + count + write ----------------------


def test_write_version_nondeterministic_source_consistent(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([(0.5,)], "x double"), base
    )
    add_constraint(spark, base, "x_small", "x < 0.69")
    # a rand() source re-evaluated per action would eventually pass the
    # check yet write violating rows; the pinned materialization makes
    # check and write observe identical rows every time
    for seed in range(6):
        df = spark.range(200).select(F.rand(seed=seed).alias("x")).filter(
            F.col("x") < 0.8
        )
        try:
            write_version(df, base)
        except Exception:
            continue
        got = read_version(spark, base)
        assert got.filter(F.col("x") >= 0.69).count() == 0
