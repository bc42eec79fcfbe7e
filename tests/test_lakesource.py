"""``versioned`` batch Python data source (sources/lakesource.py):
snapshot semantics through the DS API + pushdown-driven file skipping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.lakesource import register_versioned_source
from etl_opensky_spark.sources.versioned import (
    merge_versioned,
    purge_versioned_mor,
    read_version,
    rename_column,
    write_version,
)

from .conftest import rows


def _via_ds(spark, base, **options):
    r = spark.read.format("versioned")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(base)


def test_matches_read_version_with_partitions_and_mor(spark, tmp_path):
    """Content parity with the Catalyst path across partitioning, a
    merge, a MOR delete, and a post-delete re-insert (scoped
    tombstones)."""
    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(1, "p1", "a"), (2, "p1", "b"), (3, "p2", "c"), (4, "p2", "d")],
        "id int, part string, v string",
    )
    write_version(df, base, partition_by=("part",))
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(2,)], "id int"), ("id",)
    )
    merge_versioned(
        spark,
        base,
        spark.createDataFrame(
            [(2, "p2", "b-new")], "id int, part string, v string"
        ),
        keys=("id",),
        partition_by=("part",),
    )
    register_versioned_source(spark)
    got = _via_ds(spark, base)
    want = read_version(spark, base)
    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(got.columns)
    assert rows(got.select(*cols)) == rows(want.select(*cols))


def test_time_travel_option(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([(1, "a")], "id int, v string"), base
    )
    write_version(
        spark.createDataFrame([(2, "b")], "id int, v string"), base
    )
    register_versioned_source(spark)
    assert rows(_via_ds(spark, base, asOf=1)) == [(1, "a")]
    assert rows(_via_ds(spark, base)) == [(2, "b")]


def test_column_mapping_rename(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([(1, "a")], "id int, v string"), base
    )
    rename_column(spark, base, {"id": "ident"})
    register_versioned_source(spark)
    got = _via_ds(spark, base)
    assert set(got.columns) == {"ident", "v"}
    assert rows(got.select("ident", "v")) == [(1, "a")]


def test_schema_evolution_nulls(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([(1, "a")], "id int, v string"), base
    )
    merge_versioned(
        spark,
        base,
        spark.createDataFrame(
            [(2, "b", 9.5)], "id int, v string, score double"
        ),
        keys=("id",),
        merge_schema=True,
    )
    register_versioned_source(spark)
    got = rows(_via_ds(spark, base).select("id", "v", "score"))
    assert got == [(1, "a", None), (2, "b", 9.5)]


def test_pushdown_prunes_files_and_partitions(spark, tmp_path):
    """The pruning proof: range filters on a stats column and equality
    on a partition column shrink the PLANNED partitions (observable as
    RDD partition count), while results stay exact because every
    filter is re-applied by Spark post-scan."""
    base = str(tmp_path / "lake")
    df = spark.range(0, 80).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 4).cast("int").alias("bucket"),
        (F.col("id") * 10).cast("long").alias("val"),
    )
    # range-partitioned files inside each hive partition -> disjoint
    # id ranges per file, so min/max skipping has something to bite on
    write_version(
        df.repartitionByRange(4, "id"),
        base,
        partition_by=("bucket",),
        stats_cols=("id",),
    )
    register_versioned_source(spark)
    # planning-time pruning is opt-in (the safe default keeps the
    # cached per-load() partition list query-agnostic)
    full = _via_ds(spark, base, pruning="aggressive")
    n_all = full.rdd.getNumPartitions()
    assert n_all >= 4

    pruned = _via_ds(spark, base, pruning="aggressive").filter(
        F.col("id") < 10
    )
    assert pruned.rdd.getNumPartitions() < n_all  # manifest skipping
    assert sorted(r["id"] for r in pruned.collect()) == list(range(10))

    one_part = _via_ds(spark, base, pruning="aggressive").filter(
        F.col("bucket") == 2
    )
    assert one_part.rdd.getNumPartitions() < n_all  # dir pruning
    assert sorted(r["id"] for r in one_part.collect()) == [
        i for i in range(80) if i % 4 == 2
    ]
    # combined: equality on id -> exactly the files covering one value
    point = _via_ds(spark, base, pruning="aggressive").filter(
        (F.col("id") == 42) & (F.col("bucket") == 2)
    )
    assert point.rdd.getNumPartitions() <= 2
    assert [(r["id"], r["val"]) for r in point.collect()] == [(42, 420)]


def test_in_and_null_pushdown(spark, tmp_path):
    """IN on a partition column prunes to the named directories;
    IsNotNull skips all-null files (stats record nulls==rows)."""
    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(i, f"p{i % 4}", float(i) if i % 4 else None) for i in range(16)],
        "id int, part string, score double",
    ).repartition(1)
    write_version(df, base, partition_by=("part",), stats_cols=("score",))
    register_versioned_source(spark)
    full = _via_ds(spark, base, pruning="aggressive")
    n_all = full.rdd.getNumPartitions()
    assert n_all >= 4
    two = _via_ds(spark, base, pruning="aggressive").filter(
        F.col("part").isin("p1", "p3")
    )
    assert two.rdd.getNumPartitions() < n_all
    assert sorted(r["id"] for r in two.collect()) == [
        i for i in range(16) if i % 4 in (1, 3)
    ]
    # part=p0 holds only null scores -> IsNotNull skips that whole file
    nn = _via_ds(spark, base, pruning="aggressive").filter(
        F.col("score").isNotNull()
    )
    assert nn.rdd.getNumPartitions() < n_all
    assert sorted(r["id"] for r in nn.collect()) == [
        i for i in range(16) if i % 4
    ]
    only_null = _via_ds(spark, base, pruning="aggressive").filter(
        F.col("score").isNull()
    )
    assert only_null.rdd.getNumPartitions() < n_all
    assert sorted(r["id"] for r in only_null.collect()) == [0, 4, 8, 12]


def test_writer_append_and_overwrite(spark, tmp_path):
    """df.write.format('versioned'): overwrite creates v1/v2, append
    hardlinks the parent and lands one atomic commit; time travel and
    the Catalyst read path see every version."""
    from etl_opensky_spark.sources.versioned import _read_log

    base = str(tmp_path / "lake")
    register_versioned_source(spark)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    df1.write.format("versioned").mode("overwrite").save(base)
    assert rows(read_version(spark, base)) == [(1, "a"), (2, "b")]
    spark.createDataFrame([(3, "c")], "id int, v string").write.format(
        "versioned"
    ).mode("append").save(base)
    assert [e["op"] for e in _read_log(base)] == ["write", "append"]
    assert rows(read_version(spark, base)) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    assert rows(read_version(spark, base, as_of=1)) == [(1, "a"), (2, "b")]
    # and the DS reader sees its own writes
    assert rows(_via_ds(spark, base).select("id", "v")) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]


def test_writer_append_carries_stats_and_tombstones(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import prune_files

    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "id int, v string"
        ).repartitionByRange(2, "id"),
        base,
        stats_cols=("id",),
    )
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(3,)], "id int"), ("id",)
    )
    register_versioned_source(spark)
    spark.createDataFrame(
        [(100, "x")], "id int, v string"
    ).write.format("versioned").mode("append").save(base)
    got = sorted(r["id"] for r in read_version(spark, base).collect())
    assert got == [0, 1, 2, 4, 5, 6, 7, 100]  # delete survives the append
    # stats manifest covers old AND new files, so pruning stays live
    kept, total = prune_files(base, {"id": (100, 100)})
    assert len(kept) == 1 and total == 3
    got = sorted(
        r["id"]
        for r in read_version(spark, base, where={"id": (100, 100)})
        .collect()
    )
    assert got == [100]


def test_writer_schema_mismatch_and_guard_rails(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import add_constraint

    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([(1, "a")], "id int, v string"), base
    )
    register_versioned_source(spark)
    # a frame with UNKNOWN columns refuses by name (silent evolution
    # stays in merge_versioned(merge_schema=True)); a SUBSET of the
    # table's columns is a legal append since round 10 (Delta parity:
    # missing columns read back null) — see tests/test_subset_append.py
    with pytest.raises(Exception, match="do not exist"):
        spark.createDataFrame(
            [(2, "b")], "id int, wrong string"
        ).write.format("versioned").mode("append").save(base)
    spark.createDataFrame([(2,)], "id int").write.format(
        "versioned"
    ).mode("append").save(base)
    assert rows(read_version(spark, base).select("id", "v")) == [
        (1, "a"), (2, None),
    ]
    add_constraint(spark, base, "id_pos", "id > 0")
    with pytest.raises(Exception, match="CHECK constraints"):
        spark.createDataFrame([(3, "b")], "id int, v string").write.format(
            "versioned"
        ).mode("append").save(base)
    # nothing committed by the refused writes
    assert rows(read_version(spark, base).select("id", "v")) == [
        (1, "a"), (2, None),
    ]


def test_writer_column_mapped_table(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([(1, "a")], "id int, v string"), base
    )
    rename_column(spark, base, {"id": "ident"})
    register_versioned_source(spark)
    # append uses the LOGICAL name; files keep the frozen physical one
    spark.createDataFrame([(2, "b")], "ident int, v string").write.format(
        "versioned"
    ).mode("append").save(base)
    assert rows(read_version(spark, base).select("ident", "v")) == [
        (1, "a"), (2, "b"),
    ]


def test_filters_never_lose_rows_even_unprunable(spark, tmp_path):
    """Filters the pruner can't use (e.g. on a stat-less column) still
    return exact results — Spark re-applies everything."""
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "x")], "id int, tag string"
        ),
        base,
    )
    register_versioned_source(spark)
    got = _via_ds(spark, base).filter(F.col("tag") == "x")
    assert sorted(r["id"] for r in got.collect()) == [1, 3]


def test_shared_frame_reuse_is_exact_by_default(spark, tmp_path):
    """Round-11 correctness finding: Spark caches a Python DS
    relation's planned (read function, partitions) per ``load()`` and
    re-plans only for queries carrying pushable filters — so with
    planning-time pruning on, a shared frame's later FILTERLESS action
    would inherit the previous query's pruned file list and silently
    drop rows.  The safe default keeps the cached list query-agnostic:
    this exact sequence (count → filtered count → full aggregate) must
    stay exact on one shared frame."""
    base = str(tmp_path / "lake")
    df = spark.range(0, 40).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") % 4).cast("int").alias("bucket"),
        (F.col("id") * 10).cast("long").alias("val"),
    )
    write_version(
        df.repartitionByRange(4, "id"),
        base,
        partition_by=("bucket",),
        stats_cols=("id",),
    )
    register_versioned_source(spark)
    shared = _via_ds(spark, base)
    assert shared.count() == 40
    assert shared.filter(F.col("id") < 10).count() == 10
    assert shared.filter(F.col("bucket") == 2).count() == 10
    # the poisoned action in the failure mode: filterless aggregate
    # AFTER filtered ones on the same frame
    assert shared.agg(F.sum("val")).first()[0] == 10 * (39 * 40 // 2)
    assert shared.count() == 40
