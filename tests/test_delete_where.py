"""Positional deletion vectors (``versioned.delete_where`` — Delta DV /
Iceberg position-delete semantics, round 8): predicate MOR deletes with
no key columns, (file, row_index) sidecars, one anti-join read plan,
REORG rewriting exactly the named files, CDF recovery, and parity on
the Python DS read path and the zero-copy object-store backend."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources import versioned as V
from etl_opensky_spark.sources.versioned import (
    compact_versioned,
    delete_where,
    materialize_tombstones,
    merge_versioned,
    optimize_small_files,
    purge_versioned_mor,
    read_version,
    rename_column,
    table_changes,
    vacuum_versions,
    write_version,
)


def _df(spark, n=20, mod=3):
    return spark.createDataFrame(
        [(i, f"v{i % mod}") for i in range(n)], "id int, v string"
    )


def _ids(spark, base, as_of=None):
    return sorted(
        r["id"] for r in read_version(spark, base, as_of=as_of).collect()
    )


def test_basic_stacking_and_no_match(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(_df(spark), base)
    v, n = delete_where(spark, base, F.col("id") % 5 == 0)
    assert (v, n) == (2, 4)
    assert _ids(spark, base) == [i for i in range(20) if i % 5 != 0]
    v, n = delete_where(spark, base, "id = 7")  # SQL-string predicate
    assert (v, n) == (3, 1)
    assert _ids(spark, base) == [
        i for i in range(20) if i % 5 != 0 and i != 7
    ]
    # no-match delete commits NOTHING (no empty version)
    v, n = delete_where(spark, base, "id = 999")
    assert (v, n) == (3, 0)
    # time travel: pre-delete versions still whole
    assert _ids(spark, base, as_of=1) == list(range(20))
    assert _ids(spark, base, as_of=2) == [
        i for i in range(20) if i % 5 != 0
    ]


def test_no_keys_needed_null_rows_deletable(spark, tmp_path):
    """The capability keyed tombstones CANNOT provide: deleting
    null-valued rows (purge_versioned_mor rejects NULL keys because
    equality never matches them) and deleting from a table with no
    usable key at all."""
    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (None, "c"), (4, "d")], "id int, v string"
    )
    write_version(df, base)
    v, n = delete_where(spark, base, F.col("id").isNull())
    assert n == 2
    got = sorted(r["v"] for r in read_version(spark, base).collect())
    assert got == ["a", "d"]


def test_exact_instances_duplicates_and_reinsert(spark, tmp_path):
    """Positions kill row INSTANCES: value-identical duplicates in
    files the predicate's rows don't live in survive, and rows
    re-inserted AFTER the delete are never shadowed (file-scoped by
    construction)."""
    base = str(tmp_path / "lake")
    write_version(_df(spark), base)
    delete_where(spark, base, "id = 3")
    assert 3 not in _ids(spark, base)
    merge_versioned(
        spark, base,
        spark.createDataFrame([(3, "back")], "id int, v string"), ["id"],
    )
    got = {(r["id"], r["v"]) for r in read_version(spark, base).collect()}
    assert (3, "back") in got


def test_single_anti_join_regardless_of_stacking(spark, tmp_path):
    """Read-plan shape: THREE stacked positional deletes coalesce into
    ONE union + ONE anti-join — the plan never grows a join chain."""
    base = str(tmp_path / "lake")
    write_version(_df(spark, 30), base)
    for cond in ("id = 1", "id = 2", "id = 3"):
        delete_where(spark, base, cond)
    df = read_version(spark, base)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE repeats the tree
    assert plan.count("LeftAnti") == 1, plan
    assert _ids(spark, base) == [i for i in range(30) if i > 3 or i == 0]


def test_large_sidecar_falls_back_to_shuffled_anti_join(
    spark, tmp_path, monkeypatch
):
    base = str(tmp_path / "lake")
    write_version(_df(spark, 30), base)
    delete_where(spark, base, "id < 4")
    monkeypatch.setattr(V, "_POS_BROADCAST_MAX_BYTES", 0)
    df = read_version(spark, base)
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" not in plan or "LeftAnti" not in plan.split(
        "BroadcastHashJoin"
    )[0]
    # content identical under the shuffled strategy
    assert _ids(spark, base) == list(range(4, 30))


def test_mix_with_keyed_tombstones_and_cdf(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(_df(spark), base)
    delete_where(spark, base, "id = 0 or id = 5")
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(12,)], "id int"), ["id"]
    )
    assert _ids(spark, base) == sorted(set(range(20)) - {0, 5, 12})
    ch = table_changes(spark, base, ["id"], 1)
    dels = sorted(
        r["id"] for r in ch.collect() if r["_change_type"] == "delete"
    )
    assert dels == [0, 5, 12]
    # the positional delete rows carry full preimages
    pre = {
        (r["id"], r["v"])
        for r in ch.collect()
        if r["_change_type"] == "delete" and r["id"] in (0, 5)
    }
    assert pre == {(0, "v0"), (5, "v2")}


def test_reorg_rewrites_exactly_the_named_files(spark, tmp_path):
    """The sidecar names its files outright: REORG's rewrite set is
    exactly {files holding a recorded position} — pinned through the
    manifest (untouched files keep their origin, rewritten ones leave
    the manifest)."""
    base = str(tmp_path / "lake")
    df = spark.createDataFrame([(i,) for i in range(40)], "id int")
    write_version(df.repartitionByRange(4, "id"), base)
    before = V._entry_files(base, V._current(base))
    assert len(before) == 4
    delete_where(spark, base, "id = 2")  # lives in ONE range file
    v, n_rewritten = materialize_tombstones(spark, base)
    assert n_rewritten == 1
    after = V._entry_files(base, V._current(base))
    carried = {r for r in before if r in after}
    assert len(carried) == 3  # the three untouched range files
    assert _ids(spark, base) == [i for i in range(40) if i != 2]
    assert not V._current(base).get("tombstones")


def test_compact_and_optimize_materialize_through(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(_df(spark, 40).repartition(8), base)
    delete_where(spark, base, "id % 7 = 0")
    want = [i for i in range(40) if i % 7 != 0]
    optimize_small_files(spark, base, target_rows_per_file=40)
    assert _ids(spark, base) == want
    # optimize CARRIES the rider (kept files may still hold dead rows)
    delete_where(spark, base, "id = 1")
    compact_versioned(spark, base)
    assert _ids(spark, base) == sorted(set(want) - {1})
    assert not V._current(base).get("tombstones")


def test_rename_before_and_after(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(_df(spark), base)
    delete_where(spark, base, "id < 5")
    rename_column(spark, base, {"id": "ident"})
    got = sorted(r["ident"] for r in read_version(spark, base).collect())
    assert got == list(range(5, 20))
    delete_where(spark, base, "ident >= 18")
    got = sorted(r["ident"] for r in read_version(spark, base).collect())
    assert got == list(range(5, 18))


def test_python_ds_reader_parity(spark, tmp_path):
    from etl_opensky_spark.sources.lakesource import (
        register_versioned_source,
    )

    base = str(tmp_path / "lake")
    write_version(_df(spark, 40).repartition(4), base)
    delete_where(spark, base, "id % 3 = 0")
    register_versioned_source(spark)
    got = sorted(
        r["id"]
        for r in spark.read.format("versioned").load(base).collect()
    )
    assert got == [i for i in range(40) if i % 3 != 0]


def test_zero_copy_backend_and_vacuum_refcount(spark, tmp_path):
    from etl_opensky_spark.sources.fs import ObjectStoreFS, set_fs

    fs = ObjectStoreFS()
    prev = set_fs(fs)
    try:
        base = str(tmp_path / "lake")
        write_version(_df(spark, 40).repartition(3), base)
        before = fs.n_copies
        delete_where(spark, base, "id = 11")
        assert fs.n_copies == before  # pure metadata + fresh sidecar
        want = [i for i in range(40) if i != 11]
        assert _ids(spark, base) == want
        vacuum_versions(base, keep_last=1)
        assert _ids(spark, base) == want
    finally:
        set_fs(prev)


def test_delete_on_hive_partition_column(spark, tmp_path):
    """Partition-column predicates delete AND materialize — keyed
    tombstones refuse the REORG (keys live outside the data files);
    positions need no columns at all."""
    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(40)], "id int, b int"
    )
    write_version(df, base, partition_by=("b",))
    delete_where(spark, base, (F.col("b") == 2) | (F.col("id") == 1))
    want = [i for i in range(40) if i % 4 != 2 and i != 1]
    assert _ids(spark, base) == want
    materialize_tombstones(spark, base)
    assert _ids(spark, base) == want
    assert not V._current(base).get("tombstones")


def test_maintain_table_reorgs_positional_deletes(spark, tmp_path):
    """The maintenance policy counts positional sidecars as MOR debt
    and its REORG repair materializes them — churn converges without
    caller intervention."""
    from etl_opensky_spark.sources.maintenance import (
        maintain_table,
        table_metrics,
    )

    base = str(tmp_path / "lake")
    write_version(_df(spark, 40).repartition(2), base)
    for cond in ("id = 1", "id = 2", "id = 3", "id = 4", "id = 5"):
        delete_where(spark, base, cond)
    assert table_metrics(base)["n_tombstones"] == 5
    report = maintain_table(
        spark, base,
        policy={"max_live_tombstones": 4},
    )
    acts = ",".join(map(str, report["actions"]))
    assert "reorg" in acts or "materialize" in acts, report
    assert table_metrics(base)["n_tombstones"] == 0
    assert _ids(spark, base) == [i for i in range(40) if i > 5 or i == 0]


def test_zorder_three_columns(spark, tmp_path):
    """compact_versioned(zorder_by=(x, y, z)) — the n-dimensional
    Morton key: content preserved exactly, manifest stats recorded,
    and a 3-D box read prunes files at planning time."""
    from etl_opensky_spark.sources.versioned import prune_files

    base = str(tmp_path / "lake")
    rows_ = [
        (i, (i * 7) % 100, (i * 13) % 100, (i * 29) % 100)
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows_, "id int, x int, y int, z int")
    write_version(df.repartition(8), base)
    compact_versioned(
        spark, base,
        target_rows_per_file=500,
        zorder_by=("x", "y", "z"),
        stats_cols=("x", "y", "z"),
    )
    got = sorted(r["id"] for r in read_version(spark, base).collect())
    assert got == list(range(4000))
    kept, total = prune_files(
        base, {"x": (0, 12), "y": (0, 12), "z": (0, 12)}
    )
    assert total == 8
    assert 0 < len(kept) < total  # the box prunes, the read stays exact
    n_box = read_version(
        spark, base, where={"x": (0, 12), "y": (0, 12), "z": (0, 12)}
    ).filter("x <= 12 and y <= 12 and z <= 12").count()
    want = sum(
        1 for (_, x, y, z) in rows_ if x <= 12 and y <= 12 and z <= 12
    )
    assert n_box == want


def test_delete_with_retry_recomputes_against_new_tip(spark, tmp_path):
    """A lost commit race re-reads the NEW tip: positions from the
    losing attempt (computed against a since-compacted parent) are
    discarded wholesale, so the retry can never kill wrong rows in
    rewritten files."""
    from etl_opensky_spark.sources.versioned import (
        _test_hooks,
        delete_with_retry,
    )

    base = str(tmp_path / "lake")
    write_version(_df(spark, 30).repartition(4), base)

    fired = {"n": 0}

    def interfere():
        # first attempt only: compact the table between the position
        # computation and the commit point, stealing the version
        if fired["n"] == 0:
            fired["n"] += 1
            hook = _test_hooks.pop("before_commit")
            try:
                compact_versioned(spark, base)
            finally:
                _test_hooks["before_commit"] = hook

    _test_hooks["before_commit"] = interfere
    try:
        v, n = delete_with_retry(spark, base, "id % 10 = 0")
    finally:
        _test_hooks.pop("before_commit", None)
    assert n == 3
    assert _ids(spark, base) == [i for i in range(30) if i % 10 != 0]


def test_maintain_table_reclusters_three_columns(spark, tmp_path):
    """cluster_by now composes with the n-D ZORDER: three drifting
    columns trigger one 3-D Morton re-cluster and the depth metric
    tightens on every dimension."""
    from etl_opensky_spark.sources.maintenance import (
        clustering_depth,
        maintain_table,
    )

    base = str(tmp_path / "lake")
    rows_ = [
        (i, (i * 7) % 100, (i * 13) % 100, (i * 29) % 100)
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows_, "id int, x int, y int, z int")
    # accretion layout: every file spans all three domains
    write_version(
        df.repartition(8), base, stats_cols=("x", "y", "z")
    )
    before = clustering_depth(base, "x")
    assert before is not None and before > 2.5
    report = maintain_table(
        spark, base,
        policy={"cluster_by": ("x", "y", "z"),
                "max_clustering_depth": 2.5,
                "target_rows_per_file": 500},
    )
    acts = ",".join(str(a) for a in report["actions"])
    assert "recluster" in acts, report
    after = [clustering_depth(base, c) for c in ("x", "y", "z")]
    assert all(a is not None and a < before for a in after), (
        before, after,
    )
    got = sorted(r["id"] for r in read_version(spark, base).collect())
    assert got == list(range(4000))
