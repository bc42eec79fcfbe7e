"""``materialize_tombstones`` (REORG APPLY PURGE) and the
``maintain_table`` policy op (VERDICT r6 #5): a churn workload —
streaming-shaped small-file appends + MOR deletes — converges to
bounded files / tombstones / log length under one idempotent call.
"""

from __future__ import annotations

import os

import pytest

from etl_opensky_spark.sources.maintenance import (
    DEFAULT_POLICY,
    maintain_table,
    table_metrics,
)
from etl_opensky_spark.sources.versioned import (
    _read_log,
    copy_into,
    materialize_tombstones,
    purge_versioned_mor,
    read_version,
    write_version,
)

from .conftest import rows


def _df(spark, pairs):
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], "id int, v string"
    )


def _plan(df) -> str:
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def _bulk(spark, n=400):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(n)], "id int, v string"
    )


def test_materialize_purges_only_key_hit_files(spark, tmp_path):
    """Manifest-stats pruning bounds the rewrite: keys are range-
    clustered, so deleting low keys must rewrite the low-range files
    only — the high-range files stay hardlinked (same inodes)."""
    base = str(tmp_path / "lake")
    write_version(
        _bulk(spark).repartitionByRange(4, "id"), base, stats_cols=("id",)
    )
    purge_versioned_mor(
        spark, base,
        spark.createDataFrame([(0,), (1,), (2,)], "id int"), ["id"],
    )
    tip = _read_log(base)[-1]
    assert len(tip["tombstones"]) == 1
    from etl_opensky_spark.sources.versioned import _snapshot_files

    before = _snapshot_files(os.path.join(base, tip["dir"]))
    v, n_rewritten = materialize_tombstones(spark, base)
    assert 1 <= n_rewritten < len(before)  # pruned, not O(table)
    tip2 = _read_log(base)[-1]
    assert tip2["op"] == "reorg"
    assert not tip2.get("tombstones")
    after = _snapshot_files(os.path.join(base, tip2["dir"]))
    # untouched files carried by hardlink: inode intersection is the
    # kept set, and it is exactly n_files - n_rewritten of the parent
    kept = {ino for _r, ino in before} & {ino for _r, ino in after}
    assert len(kept) == len(before) - n_rewritten
    df = read_version(spark, base)
    assert rows(df) == [(i, f"v{i}") for i in range(3, 400)]
    assert "BroadcastHashJoin" not in _plan(df)  # join-free again
    # stats carried + re-harvested: manifest covers every live file
    live_rels = {r for r, _ino in after}
    assert set(tip2["stats"]) == live_rels
    # idempotent: nothing live -> no new commit
    assert materialize_tombstones(spark, base) == (v, 0)


def test_materialize_preserves_scoped_reinsert(spark, tmp_path):
    """A key re-inserted AFTER its delete (new file, outside the
    tombstone's scope) must survive the purge rewrite."""
    base = str(tmp_path / "lake")
    write_version(_bulk(spark, 20), base, stats_cols=("id",))
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(7,)], "id int"), ["id"]
    )
    landing = str(tmp_path / "landing")
    spark.createDataFrame(
        [(7, "v7b")], "id int, v string"
    ).coalesce(1).write.parquet(landing)
    copy_into(spark, base, landing, stats_cols=("id",))
    want = [(i, f"v{i}") for i in range(20) if i != 7] + [(7, "v7b")]
    assert rows(read_version(spark, base)) == sorted(want)
    materialize_tombstones(spark, base)
    df = read_version(spark, base)
    assert rows(df) == sorted(want)
    assert "BroadcastHashJoin" not in _plan(df)


def test_maintain_table_converges_under_churn(spark, tmp_path):
    """The lifecycle gate: 6 rounds of small-file appends + stacked
    MOR deletes, maintained with tight thresholds — files, tombstones
    and content stay bounded/correct every round, and the final call
    on a clean table is a no-op."""
    base = str(tmp_path / "lake")
    write_version(
        _bulk(spark).repartitionByRange(2, "id"), base, stats_cols=("id",)
    )
    policy = {
        "target_rows_per_file": 200,
        "max_small_files": 3,
        "max_live_tombstones": 2,
    }
    alive = {i: f"v{i}" for i in range(400)}
    for r in range(6):
        batch = [(1000 + r * 10 + j, f"b{r}_{j}") for j in range(10)]
        landing = str(tmp_path / f"landing{r}")
        spark.createDataFrame(
            batch, "id int, v string"
        ).repartition(2).write.parquet(landing)
        copy_into(spark, base, landing, stats_cols=("id",))
        alive.update(dict(batch))
        dead = [r * 3, r * 3 + 1]
        purge_versioned_mor(
            spark, base,
            spark.createDataFrame([(k,) for k in dead], "id int"),
            ["id"],
        )
        for k in dead:
            alive.pop(k)
        report = maintain_table(spark, base, policy)
        m = report["after"]
        assert m["n_small_files"] <= policy["max_small_files"]
        assert m["n_tombstones"] <= policy["max_live_tombstones"]
        assert rows(read_version(spark, base)) == sorted(alive.items())
    assert any(
        a["action"] == "materialize_tombstones"
        for rep in [report] for a in rep["actions"]
    ) or report["before"]["n_tombstones"] <= 2
    # steady state: an immediate re-run repairs nothing
    again = maintain_table(spark, base, policy)
    assert again["actions"] == []
    assert rows(read_version(spark, base)) == sorted(alive.items())


def test_maintain_vacuum_and_log_checkpoint(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import (
        _ckpt_path,
        annotate_version,
    )

    base = str(tmp_path / "lake")
    write_version(_bulk(spark, 10), base)
    for i in range(7):
        annotate_version(base, {"tick": i})
    report = maintain_table(
        spark, base,
        {"vacuum_keep_last": 2, "max_log_tail": 1,
         "max_small_files": None, "max_live_tombstones": None},
    )
    kinds = [a["action"] for a in report["actions"]]
    assert kinds == ["vacuum", "log_checkpoint"]
    log = _read_log(base)
    assert len(log) == 2
    tip = log[-1]["version"]
    assert os.path.exists(_ckpt_path(base, tip))
    assert report["after"]["log_tail"] == 0
    assert read_version(spark, base).count() == 10


def test_unknown_policy_key_rejected(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(_bulk(spark, 5), base)
    with pytest.raises(ValueError, match="unknown policy key"):
        maintain_table(spark, base, {"max_smallfiles": 1})
    assert set(DEFAULT_POLICY) >= {
        "target_rows_per_file", "max_small_files",
        "max_live_tombstones", "max_log_tail", "vacuum_keep_last",
    }


def test_table_metrics_counts(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        _bulk(spark, 100).repartition(4), base, stats_cols=("id",)
    )
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(1,)], "id int"), ["id"]
    )
    m = table_metrics(base, small_file_rows=1000)
    assert m["n_files"] == 4
    assert m["n_small_files"] == 4  # 25-row files under the cutoff
    assert m["n_tombstones"] == 1
    assert m["n_commits"] == 2
    assert m["log_tail"] == 2  # no checkpoint yet


# --- maintenance next to live writers ---------------------------------------


def test_maintain_retries_past_one_lost_race(spark, tmp_path):
    """A scheduler-driven maintenance call losing the put_if_absent
    race to an ingest commit must retry against the new tip, not
    crash."""
    import json as _json

    from etl_opensky_spark.sources.versioned import (
        _commit_path,
        _test_hooks,
    )

    base = str(tmp_path / "lake")
    write_version(_bulk(spark, 30).repartition(2), base, stats_cols=("id",))
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(1,)], "id int"), ["id"]
    )
    tip = _read_log(base)[-1]

    def _steal_once():  # competing writer lands the version reorg wants
        _test_hooks.pop("before_commit", None)
        with open(_commit_path(base, tip["version"] + 1), "x") as fh:
            _json.dump(
                {"version": tip["version"] + 1, "dir": tip["dir"],
                 "op": "annotate", "parent": tip["version"],
                 "tombstones": tip["tombstones"]},
                fh,
            )

    _test_hooks["before_commit"] = _steal_once
    try:
        report = maintain_table(
            spark, base,
            {"max_live_tombstones": 0, "max_small_files": None,
             "target_rows_per_file": 100},
        )
    finally:
        _test_hooks.pop("before_commit", None)
    done = [a for a in report["actions"]
            if a["action"] == "materialize_tombstones"]
    assert done and "skipped" not in done[0]
    assert report["after"]["n_tombstones"] == 0
    assert rows(read_version(spark, base)) == [
        (i, f"v{i}") for i in range(30) if i != 1
    ]


def test_maintain_reports_skip_after_repeated_races(spark, tmp_path):
    import json as _json

    from etl_opensky_spark.sources.versioned import (
        _commit_path,
        _test_hooks,
    )

    base = str(tmp_path / "lake")
    write_version(_bulk(spark, 10), base)
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(1,)], "id int"), ["id"]
    )

    def _steal_always():  # a writer beats BOTH attempts
        cur = _read_log(base)[-1]
        with open(_commit_path(base, cur["version"] + 1), "x") as fh:
            _json.dump(
                {"version": cur["version"] + 1, "dir": cur["dir"],
                 "op": "annotate", "parent": cur["version"],
                 "tombstones": cur.get("tombstones")},
                fh,
            )

    _test_hooks["before_commit"] = _steal_always
    try:
        report = maintain_table(
            spark, base,
            {"max_live_tombstones": 0, "max_small_files": None},
        )
    finally:
        _test_hooks.pop("before_commit", None)
    assert report["actions"] == [
        {"action": "materialize_tombstones",
         "skipped": "lost commit race"}
    ]
    # debt intact for the next scheduled run; table undamaged
    assert report["after"]["n_tombstones"] == 1
    assert rows(read_version(spark, base)) == [
        (i, f"v{i}") for i in range(10) if i != 1
    ]


def test_maintenance_composes_with_exactly_once_ingest(spark, tmp_path):
    """Interleaved maintenance commits must be invisible to the
    streaming txn cursor: replayed micro-batches stay no-ops across a
    REORG/OPTIMIZE in between, and maintained state keeps the ingest's
    content exact."""
    from etl_opensky_spark.streaming.lake import (
        last_txn_batch,
        make_merge_batch,
    )

    base = str(tmp_path / "lake")
    fn = make_merge_batch(base, ["id"], app_id="s1")
    policy = {"target_rows_per_file": 100, "max_small_files": 0,
              "max_live_tombstones": 0}
    alive: dict[int, str] = {}
    for b in range(4):
        batch = [(b * 10 + j, f"b{b}_{j}") for j in range(5)]
        fn(_df(spark, batch), b)
        alive.update(dict(batch))
        purge_versioned_mor(
            spark, base,
            spark.createDataFrame([(b * 10,)], "id int"), ["id"],
        )
        alive.pop(b * 10)
        maintain_table(spark, base, policy)
        fn(_df(spark, batch), b)  # crash-replay AFTER maintenance
        assert rows(read_version(spark, base)) == sorted(alive.items())
    assert last_txn_batch(base, "s1") == 3
    # a stale replay of batch 0 four maintenance cycles later is
    # still a commit-level no-op
    n = len(_read_log(base))
    fn(_df(spark, [(0, "b0_0")]), 0)
    assert len(_read_log(base)) == n
    assert rows(read_version(spark, base)) == sorted(alive.items())


# --- REORG edge cases: mapped / partitioned / rider-carrying tables ---------


def test_materialize_on_column_mapped_table(spark, tmp_path):
    """REORG under a rename: tombstone keys are LOGICAL names mapped to
    the frozen physical file columns; rewritten files stay physical and
    the carried mapping keeps resolving them."""
    from etl_opensky_spark.sources.versioned import rename_column

    base = str(tmp_path / "lake")
    write_version(
        _bulk(spark, 40).repartitionByRange(4, "id"), base,
        stats_cols=("id",),
    )
    rename_column(spark, base, {"id": "doc_id", "v": "payload"})
    purge_versioned_mor(
        spark, base,
        spark.createDataFrame([(2,), (39,)], "doc_id int"), ["doc_id"],
    )
    v, n = materialize_tombstones(spark, base)
    assert 1 <= n <= 4
    tip = _read_log(base)[-1]
    assert not tip.get("tombstones")
    assert tip["column_mapping"]  # mapping carried
    df = read_version(spark, base)
    assert df.columns == ["doc_id", "payload"]
    assert rows(df) == [
        (i, f"v{i}") for i in range(40) if i not in (2, 39)
    ]
    assert "BroadcastHashJoin" not in _plan(df)


def test_materialize_on_partitioned_table(spark, tmp_path):
    """REORG on a hive-partitioned layout rewrites within partition
    dirs; partition values survive; untouched partitions stay
    hardlinked."""
    from etl_opensky_spark.sources.versioned import _snapshot_files

    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(i, f"v{i}", "even" if i % 2 == 0 else "odd") for i in range(40)],
        "id int, v string, par string",
    )
    write_version(df, base, partition_by=["par"], stats_cols=("id",))
    purge_versioned_mor(
        spark, base,
        spark.createDataFrame([(4,), (6,)], "id int"), ["id"],
    )
    tip = _read_log(base)[-1]
    before = _snapshot_files(os.path.join(base, tip["dir"]))
    v, n = materialize_tombstones(spark, base)
    tip2 = _read_log(base)[-1]
    assert not tip2.get("tombstones")
    got = read_version(spark, base)
    assert sorted(tuple(r) for r in got.collect()) == sorted(
        (i, f"v{i}", "even" if i % 2 == 0 else "odd")
        for i in range(40) if i not in (4, 6)
    )
    after = _snapshot_files(os.path.join(base, tip2["dir"]))
    # rewritten output landed under the partition dirs it came from
    assert all("par=" in rel for rel, _ino in after)


def test_materialize_refuses_partition_column_keys(spark, tmp_path):
    """Tombstone keys that are hive-partition columns aren't in the
    raw data files — REORG must refuse and name compact_versioned."""
    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 3) for i in range(30)],
        "id int, v string, par int",
    )
    write_version(df, base, partition_by=["par"])
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(1,)], "par int"), ["par"]
    )
    with pytest.raises(ValueError, match="compact_versioned"):
        materialize_tombstones(spark, base)


def test_materialize_carries_constraints_and_identity(spark, tmp_path):
    """CHECK-constraint and GENERATED IDENTITY riders survive REORG,
    and the identity high-water mark keeps advancing after it."""
    from etl_opensky_spark.sources.versioned import (
        add_constraint,
        copy_into,
    )

    base = str(tmp_path / "lake")
    src = spark.createDataFrame(
        [(f"v{i}",) for i in range(20)], "v string"
    )
    write_version(src, base, identity_col="rid", stats_cols=("rid",))
    add_constraint(spark, base, "v_nonempty", "length(v) > 0")
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(3,), (4,)], "rid bigint"),
        ["rid"],
    )
    v, n = materialize_tombstones(spark, base)
    tip = _read_log(base)[-1]
    assert tip["constraints"] and tip["identity"]
    assert not tip.get("tombstones")
    assert read_version(spark, base).count() == 18
    # identity continues monotonically from the carried high-water
    landing = str(tmp_path / "landing")
    spark.createDataFrame([("x",)], "v string").coalesce(1).write.parquet(
        landing
    )
    copy_into(spark, base, landing)
    ids = [r[0] for r in read_version(spark, base).select("rid").collect()]
    assert len(ids) == 19 and len(set(ids)) == 19
    assert max(ids) >= 21  # next id minted past the pre-REORG mark


# --- clustering drift repair -------------------------------------------------


def test_clustering_depth_and_recluster_1d(spark, tmp_path):
    """An accretion layout (every file spans the id domain) measures
    depth ~ n_files; the policy re-cluster rewrites to disjoint range
    slices (depth ~ 1), pruning tightens, content identical, and the
    steady state stops re-clustering."""
    from etl_opensky_spark.sources.maintenance import clustering_depth
    from etl_opensky_spark.sources.versioned import prune_files

    base = str(tmp_path / "lake")
    # round-robin repartition -> each of 4 files spans ~the full domain
    write_version(
        _bulk(spark, 400).repartition(4), base, stats_cols=("id",)
    )
    d0 = clustering_depth(base, "id")
    assert d0 is not None and d0 > 2.5
    kept0, total0 = prune_files(base, {"id": (10, 20)})
    assert len(kept0) == total0  # unclustered: nothing prunes
    policy = {
        "target_rows_per_file": 100, "cluster_by": "id",
        "max_small_files": None, "max_live_tombstones": None,
    }
    report = maintain_table(spark, base, policy)
    acts = [a for a in report["actions"] if a["action"] == "recluster"]
    assert acts and acts[0]["depth_before"] > 2.5
    d1 = clustering_depth(base, "id")
    assert d1 is not None and d1 < 1.5
    kept1, total1 = prune_files(base, {"id": (10, 20)})
    assert total1 >= 2 and len(kept1) < total1  # slices now prune
    assert rows(read_version(spark, base)) == [
        (i, f"v{i}") for i in range(400)
    ]
    again = maintain_table(spark, base, policy)
    assert not [a for a in again["actions"] if a["action"] == "recluster"]


def test_recluster_2d_zorder(spark, tmp_path):
    from etl_opensky_spark.sources.maintenance import clustering_depth

    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(i, (i * 37) % 100, f"v{i}") for i in range(400)],
        "x int, y int, v string",
    )
    write_version(df.repartition(4), base, stats_cols=("x", "y"))
    policy = {
        "target_rows_per_file": 100, "cluster_by": ("x", "y"),
        "max_small_files": None, "max_live_tombstones": None,
        "max_clustering_depth": 2.0,
    }
    report = maintain_table(spark, base, policy)
    assert any(a["action"] == "recluster" for a in report["actions"])
    got = read_version(spark, base)
    assert got.count() == 400
    dx = clustering_depth(base, "x")
    assert dx is not None and dx < 3.0  # z-order tightens both dims
    # depth is a numeric-domain metric: strings opt out cleanly
    assert clustering_depth(base, "v") is None


def test_compact_sort_by_direct(spark, tmp_path):
    from etl_opensky_spark.sources.versioned import (
        _snapshot_files,
        compact_versioned,
    )

    base = str(tmp_path / "lake")
    write_version(
        _bulk(spark, 300).repartition(3), base, stats_cols=("id",)
    )
    with pytest.raises(ValueError, match="exclusive"):
        compact_versioned(
            spark, base, zorder_by=("id", "v"), sort_by="id"
        )
    v = compact_versioned(
        spark, base, target_rows_per_file=100, sort_by="id",
        stats_cols=("id",),
    )
    tip = _read_log(base)[-1]
    assert tip["version"] == v
    # disjoint range slices: every pair of file ranges non-overlapping
    spans = sorted(
        (s["id"]["min"], s["id"]["max"]) for s in tip["stats"].values()
    )
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    assert rows(read_version(spark, base)) == [
        (i, f"v{i}") for i in range(300)
    ]
