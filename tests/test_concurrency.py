"""Optimistic multi-writer concurrency: logical conflict detection +
rebase (round-9 VERDICT #1).

A writer that loses the commit race no longer aborts wholesale: when
every intervening winner is logically disjoint from its read/write set,
the already-written output is re-parented onto the new tip and
committed one version up — no Spark recompute, no
``ConcurrentCommitError`` surfaced.  Real overlaps raise
``LogicalConflictError`` (a ``ConcurrentCommitError`` subclass, so the
``*_with_retry`` wrappers re-run exactly as before).

Conflict matrix covered here: append/append (distinct + same landing
files), merge/merge (disjoint + overlapping partitions), delete/append,
delete/compact, merge/delete (tombstone inside + outside the merged
partitions), semantic drift, a real-thread hammer, and the zero-copy
object-store backend.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.fs import ObjectStoreFS, set_fs
from etl_opensky_spark.sources.versioned import (
    LogicalConflictError,
    _read_log,
    _test_hooks,
    compact_versioned,
    copy_into,
    delete_where,
    merge_versioned,
    read_version,
    write_version,
)

from .conftest import rows


def _pdf(spark, pairs, p=None):
    """id/v/p frame; pairs = [(id, v, p)] or [(id, v)] with fixed p."""
    if p is not None:
        pairs = [(i, v, p) for i, v in pairs]
    return spark.createDataFrame(pairs, "id long, v string, p int")


def _seed(spark, base, n=12, parts=3):
    df = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") % parts).cast("int").alias("p"),
    )
    write_version(df.repartition(2), base, partition_by=("p",))


def _interfere_once(fn):
    """Install a one-shot before_commit hook running ``fn`` (with the
    hook removed, so the interferer's own commit doesn't recurse)."""
    def hook():
        _test_hooks.pop("before_commit", None)
        fn()

    _test_hooks["before_commit"] = hook


@pytest.fixture(autouse=True)
def _clean_hooks():
    yield
    _test_hooks.pop("before_commit", None)


class TestMergeRebase:
    def test_disjoint_partition_merges_both_commit(self, spark, tmp_path):
        """The VERDICT's named scenario: two interleaved MERGEs on
        disjoint partitions — the loser rebases and commits one
        version up, without re-running (no retry wrapper here: a
        wholesale abort would surface as ConcurrentCommitError)."""
        base = str(tmp_path / "lake")
        _seed(spark, base)

        _interfere_once(
            lambda: merge_versioned(
                spark, base,
                _pdf(spark, [(0, "A0"), (100, "A100")], p=0),
                ["id"], partition_by=("p",),
                keys_are_partition_stable=True,
            )
        )
        v = merge_versioned(
            spark, base,
            _pdf(spark, [(1, "B1"), (200, "B200")], p=1),
            ["id"], partition_by=("p",),
            keys_are_partition_stable=True,
        )
        log = _read_log(base)
        assert v == 3 and [e["op"] for e in log] == [
            "write", "merge", "merge"
        ]
        got = dict(
            (r["id"], r["v"]) for r in read_version(spark, base).collect()
        )
        assert got[0] == "A0" and got[100] == "A100"   # winner applied
        assert got[1] == "B1" and got[200] == "B200"   # loser rebased
        assert got[2] == "v2"                          # untouched rows
        assert len(got) == 14

    def test_overlapping_partition_merges_conflict(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, base)
        _interfere_once(
            lambda: merge_versioned(
                spark, base, _pdf(spark, [(0, "A0")], p=0),
                ["id"], partition_by=("p",),
            )
        )
        with pytest.raises(LogicalConflictError):
            merge_versioned(
                spark, base, _pdf(spark, [(3, "B3")], p=0),
                ["id"], partition_by=("p",),
            )
        # the winner's commit stands; no loser debris in the log
        log = _read_log(base)
        assert [e["op"] for e in log] == ["write", "merge"]
        got = dict(
            (r["id"], r["v"]) for r in read_version(spark, base).collect()
        )
        assert got[0] == "A0" and got[3] == "v3"

    def test_merge_rebases_over_delete_elsewhere(self, spark, tmp_path):
        """A winner's positional delete targeting OTHER partitions
        rebases cleanly — and its tombstone still applies at the tip."""
        base = str(tmp_path / "lake")
        _seed(spark, base)
        _interfere_once(
            lambda: delete_where(spark, base, "p = 2 AND id = 2")
        )
        v = merge_versioned(
            spark, base, _pdf(spark, [(0, "B0")], p=0),
            ["id"], partition_by=("p",),
        )
        assert v == 3
        got = dict(
            (r["id"], r["v"]) for r in read_version(spark, base).collect()
        )
        assert 2 not in got          # winner's delete survives the rebase
        assert got[0] == "B0"
        assert len(got) == 11

    def test_merge_conflicts_with_delete_in_merged_partition(
        self, spark, tmp_path
    ):
        """A tombstone over a partition the merge re-derived from
        pre-delete data would resurrect the deleted rows — conflict."""
        base = str(tmp_path / "lake")
        _seed(spark, base)
        _interfere_once(
            lambda: delete_where(spark, base, "p = 0 AND id = 0")
        )
        with pytest.raises(LogicalConflictError):
            merge_versioned(
                spark, base, _pdf(spark, [(3, "B3")], p=0),
                ["id"], partition_by=("p",),
            )
        got = {r["id"] for r in read_version(spark, base).collect()}
        assert 0 not in got and len(got) == 11

    def test_semantic_drift_conflicts(self, spark, tmp_path):
        from etl_opensky_spark.sources.versioned import add_constraint

        base = str(tmp_path / "lake")
        _seed(spark, base)
        _interfere_once(
            lambda: add_constraint(spark, base, "v_nonnull", "v IS NOT NULL")
        )
        with pytest.raises(LogicalConflictError, match="constraints"):
            merge_versioned(
                spark, base, _pdf(spark, [(1, "B1")], p=1),
                ["id"], partition_by=("p",),
            )


class TestAppendRebase:
    def _unpart(self, spark, base):
        write_version(
            spark.range(10).select(
                F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
            ),
            base,
        )

    def _land(self, spark, tmp_path, name, lo, hi):
        d = str(tmp_path / name)
        spark.range(lo, hi).select(
            F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("v")
        ).repartition(1).write.mode("overwrite").parquet(d)
        return d

    def test_concurrent_appends_both_commit(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        self._unpart(spark, base)
        land_a = self._land(spark, tmp_path, "land_a", 100, 105)
        land_b = self._land(spark, tmp_path, "land_b", 200, 205)
        _interfere_once(lambda: copy_into(spark, base, land_a))
        v, n_new = copy_into(spark, base, land_b)
        assert (v, n_new) == (3, 1)
        tip = _read_log(base)[-1]
        assert len(tip["ingested_files"]) == 2  # both batches recorded
        ids = sorted(
            r["id"] for r in read_version(spark, base).collect()
        )
        assert ids == list(range(10)) + list(range(100, 105)) + list(
            range(200, 205)
        )

    def test_same_landing_files_exactly_once(self, spark, tmp_path):
        """Two concurrent copy_into runs over the SAME landing dir —
        the reference's non-ACID daily-append race
        (extract_flights.py:80-92).  The loser conflicts instead of
        double-ingesting; its re-run is a no-op."""
        base = str(tmp_path / "lake")
        self._unpart(spark, base)
        land = self._land(spark, tmp_path, "land", 100, 105)
        _interfere_once(lambda: copy_into(spark, base, land))
        with pytest.raises(LogicalConflictError, match="ingested"):
            copy_into(spark, base, land)
        v, n_new = copy_into(spark, base, land)  # the documented re-run
        assert n_new == 0 and v == 2
        ids = [r["id"] for r in read_version(spark, base).collect()]
        assert sorted(ids) == list(range(10)) + list(range(100, 105))
        assert len(ids) == len(set(ids))  # exactly once, never twice


class TestDeleteRebase:
    def _unpart(self, spark, base):
        write_version(
            spark.range(30).select(
                F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
            ).repartition(3),
            base,
        )

    def test_delete_rebases_over_append(self, spark, tmp_path):
        """Snapshot-scoped delete: positions stay valid over a blind
        append, and concurrently-appended rows matching the predicate
        are NOT deleted (WriteSerializable, like Delta)."""
        base = str(tmp_path / "lake")
        self._unpart(spark, base)
        land = str(tmp_path / "land")
        spark.range(100, 110).select(
            F.col("id"), F.lit("new").alias("v")
        ).repartition(1).write.parquet(land)
        _interfere_once(lambda: copy_into(spark, base, land))
        v, n = delete_where(spark, base, "id % 10 = 0")
        assert (v, n) == (3, 3)  # 0, 10, 20 — evaluated on the snapshot
        ids = sorted(r["id"] for r in read_version(spark, base).collect())
        assert 0 not in ids and 10 not in ids and 20 not in ids
        assert 100 in ids  # appended row matching the predicate SURVIVES
        assert len(ids) == 27 + 10

    def test_delete_conflicts_with_compaction(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        self._unpart(spark, base)
        _interfere_once(lambda: compact_versioned(spark, base))
        with pytest.raises(LogicalConflictError, match="rewrote"):
            delete_where(spark, base, "id % 10 = 0")
        # delete_with_retry's wholesale re-run remains the safe path
        from etl_opensky_spark.sources.versioned import delete_with_retry

        v, n = delete_with_retry(spark, base, "id % 10 = 0")
        assert n == 3
        assert sorted(
            r["id"] for r in read_version(spark, base).collect()
        ) == [i for i in range(30) if i % 10 != 0]

    def test_two_deletes_stack(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        self._unpart(spark, base)
        _interfere_once(lambda: delete_where(spark, base, "id = 7"))
        v, n = delete_where(spark, base, "id % 10 = 0")
        assert (v, n) == (3, 3)
        ids = sorted(r["id"] for r in read_version(spark, base).collect())
        assert ids == [
            i for i in range(30) if i % 10 != 0 and i != 7
        ]


class TestHammer:
    def test_threaded_disjoint_merges_all_commit(self, spark, tmp_path):
        """Real concurrency, no hooks: N threads each MERGE their own
        partition; every writer commits (rebase absorbs the races) and
        the final table holds all updates."""
        import threading

        base = str(tmp_path / "lake")
        _seed(spark, base, n=16, parts=4)
        errors: list = []

        def worker(p):
            try:
                merge_versioned(
                    spark, base,
                    _pdf(
                        spark,
                        [(1000 + p, f"W{p}"), (p, f"U{p}")],
                        p=p,
                    ),
                    ["id"], partition_by=("p",),
                    keys_are_partition_stable=True,
                )
            except Exception as exc:  # noqa: BLE001 - recorded for assert
                errors.append((p, exc))

        threads = [
            threading.Thread(target=worker, args=(p,)) for p in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, f"writers failed: {errors}"
        log = _read_log(base)
        assert [e["op"] for e in log] == ["write"] + ["merge"] * 4
        got = dict(
            (r["id"], r["v"]) for r in read_version(spark, base).collect()
        )
        for p in range(4):
            assert got[1000 + p] == f"W{p}"
            assert got[p] == f"U{p}"
        assert len(got) == 20

    def test_object_store_backend_rebase(self, spark, tmp_path):
        """Zero-copy manifest mode: the rebase is pure manifest
        re-reference — disjoint merges both commit and every snapshot
        resolves through origin dirs."""
        prev = set_fs(ObjectStoreFS())
        try:
            base = str(tmp_path / "lake")
            _seed(spark, base)
            _interfere_once(
                lambda: merge_versioned(
                    spark, base, _pdf(spark, [(0, "A0")], p=0),
                    ["id"], partition_by=("p",),
                    keys_are_partition_stable=True,
                )
            )
            v = merge_versioned(
                spark, base, _pdf(spark, [(1, "B1")], p=1),
                ["id"], partition_by=("p",),
                keys_are_partition_stable=True,
            )
            assert v == 3
            got = dict(
                (r["id"], r["v"])
                for r in read_version(spark, base).collect()
            )
            assert got[0] == "A0" and got[1] == "B1" and len(got) == 12
            # historical snapshots stay readable after the rebase
            assert len(rows(read_version(spark, base, as_of=2))) == 12
        finally:
            set_fs(prev)


class TestPurgeMorRebase:
    def _unpart(self, spark, base):
        write_version(
            spark.range(30).select(
                F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
            ).repartition(3),
            base,
        )

    def test_mor_purge_rebases_over_append(self, spark, tmp_path):
        """Keyed MOR delete vs blind append: the tombstone's file scope
        is the READ snapshot, so appended rows with the same key stay
        visible (the deletion-vector contract) and the rebase stacks
        the sidecar onto the winner's tip."""
        from etl_opensky_spark.sources.versioned import (
            purge_versioned_mor,
        )

        base = str(tmp_path / "lake")
        self._unpart(spark, base)
        land = str(tmp_path / "land")
        spark.range(2, 4).select(
            F.col("id"), F.lit("new").alias("v")
        ).repartition(1).write.parquet(land)
        _interfere_once(lambda: copy_into(spark, base, land))
        v, n = purge_versioned_mor(
            spark, base,
            spark.createDataFrame([(2,), (3,)], "id long"), ["id"],
        )
        assert (v, n) == (3, 2)
        got = [
            (r["id"], r["v"])
            for r in read_version(spark, base).collect()
        ]
        dead = {i for i, v_ in got if v_.startswith("v") and i in (2, 3)}
        assert not dead                       # snapshot rows deleted
        assert (2, "new") in got and (3, "new") in got  # appends live
        assert len(got) == 30  # 30 - 2 deleted + 2 appended

    def test_mor_purge_conflicts_with_compaction(self, spark, tmp_path):
        from etl_opensky_spark.sources.versioned import (
            purge_versioned_mor,
        )

        base = str(tmp_path / "lake")
        self._unpart(spark, base)
        _interfere_once(lambda: compact_versioned(spark, base))
        with pytest.raises(LogicalConflictError):
            purge_versioned_mor(
                spark, base,
                spark.createDataFrame([(2,)], "id long"), ["id"],
            )


class TestOptimizeRebase:
    """Incremental OPTIMIZE vs live ingest: the auto-compaction tick
    racing a stream's append is THE steady-state contention at scale —
    the compaction now rebases over winners that stayed off the files
    it rewrote, instead of burning a wholesale retry."""

    def _small_files_table(self, spark, base):
        # one right-sized file + four tiny ones
        write_version(
            spark.range(0, 1000).select(
                F.col("id"), F.lit("bulk").alias("v")
            ).coalesce(1),
            base,
        )
        for i in range(4):
            land = base + f"_land{i}"
            spark.range(2000 + i, 2001 + i).select(
                F.col("id"), F.lit("tiny").alias("v")
            ).coalesce(1).write.mode("overwrite").parquet(land)
            copy_into(spark, base, land)

    def test_optimize_rebases_over_append(self, spark, tmp_path):
        from etl_opensky_spark.sources.versioned import (
            optimize_small_files,
        )

        base = str(tmp_path / "lake")
        self._small_files_table(spark, base)
        land = str(tmp_path / "race")
        spark.range(5000, 5003).select(
            F.col("id"), F.lit("raced").alias("v")
        ).coalesce(1).write.parquet(land)
        _interfere_once(lambda: copy_into(spark, base, land))
        v, n = optimize_small_files(
            spark, base, target_rows_per_file=500
        )
        assert n >= 4  # the tiny files were compacted
        log = _read_log(base)
        assert log[-1]["op"] == "optimize"
        assert log[-2]["op"] == "copy_into"  # the winner's commit stands
        ids = sorted(r["id"] for r in read_version(spark, base).collect())
        assert ids == (
            list(range(1000))
            + [2000, 2001, 2002, 2003]
            + [5000, 5001, 5002]
        )

    def test_optimize_conflicts_when_small_file_deleted(
        self, spark, tmp_path
    ):
        """A winner's positional delete on a file the compaction
        rewrote: the compacted output was derived pre-delete and the
        positions die with the removed file — conflict, wholesale
        retry purges correctly."""
        from etl_opensky_spark.sources.versioned import (
            optimize_small_files,
        )

        base = str(tmp_path / "lake")
        self._small_files_table(spark, base)
        _interfere_once(lambda: delete_where(spark, base, "id = 2001"))
        with pytest.raises(LogicalConflictError):
            optimize_small_files(spark, base, target_rows_per_file=500)
        # the conflicted attempt left no debris; a re-run converges and
        # physically purges the winner's delete
        v, n = optimize_small_files(spark, base, target_rows_per_file=500)
        assert n >= 4
        ids = sorted(r["id"] for r in read_version(spark, base).collect())
        assert 2001 not in ids and len(ids) == 1003

    def test_optimize_rebases_over_delete_on_kept_file(
        self, spark, tmp_path
    ):
        """A winner's delete targeting only KEPT (right-sized) files is
        disjoint from the compaction's write set: rebase carries the
        new sidecar and the delete still applies at the tip."""
        from etl_opensky_spark.sources.versioned import (
            optimize_small_files,
        )

        base = str(tmp_path / "lake")
        self._small_files_table(spark, base)
        _interfere_once(lambda: delete_where(spark, base, "id = 17"))
        v, n = optimize_small_files(
            spark, base, target_rows_per_file=500
        )
        assert n >= 4
        ids = sorted(r["id"] for r in read_version(spark, base).collect())
        assert 17 not in ids
        assert len(ids) == 1003  # 1000 bulk - 1 deleted + 4 tiny


class TestPurgeCowRebase:
    def test_partitioned_purge_rebases_over_disjoint_merge(
        self, spark, tmp_path
    ):
        from etl_opensky_spark.sources.versioned import purge_versioned

        base = str(tmp_path / "lake")
        _seed(spark, base)
        _interfere_once(
            lambda: merge_versioned(
                spark, base, _pdf(spark, [(1, "A1")], p=1),
                ["id"], partition_by=("p",),
            )
        )
        v, n = purge_versioned(
            spark, base,
            spark.createDataFrame([(0,), (3,)], "id long"), ["id"],
            partition_by=("p",),
        )
        assert (v, n) == (3, 2)
        got = dict(
            (r["id"], r["v"]) for r in read_version(spark, base).collect()
        )
        assert 0 not in got and 3 not in got
        assert got[1] == "A1"  # the winner's merge survives
        assert len(got) == 10

    def test_partitioned_purge_conflicts_on_same_partition(
        self, spark, tmp_path
    ):
        from etl_opensky_spark.sources.versioned import purge_versioned

        base = str(tmp_path / "lake")
        _seed(spark, base)
        _interfere_once(
            lambda: merge_versioned(
                spark, base, _pdf(spark, [(0, "A0")], p=0),
                ["id"], partition_by=("p",),
            )
        )
        with pytest.raises(LogicalConflictError):
            purge_versioned(
                spark, base,
                spark.createDataFrame([(3,)], "id long"), ["id"],
                partition_by=("p",),
            )


class TestRandomizedInterleavings:
    """Seeded randomized rebase property: rounds of a writer losing to
    one or two DISJOINT interferers (merges on other partitions,
    point deletes elsewhere) must converge to the model that applies
    every committed op — the rebase can never drop a winner's effect
    or its own."""

    def test_model_equivalence(self, spark, tmp_path):
        import random

        rng = random.Random(9090)
        base = str(tmp_path / "lake")
        n_parts = 4
        model = {}  # id -> v
        seed_pairs = [(i, f"v{i}") for i in range(16)]
        model.update(seed_pairs)
        write_version(
            spark.createDataFrame(
                [(i, v, i % n_parts) for i, v in seed_pairs],
                "id long, v string, p int",
            ).repartition(2),
            base,
            partition_by=("p",),
        )
        next_id = 1000

        def model_merge(pairs, p):
            for i, v in pairs:
                model[i] = v

        def do_merge(tag, p):
            nonlocal next_id
            pairs = [(next_id, f"{tag}{next_id}")]
            next_id += 1
            # sometimes also update an existing key of that partition
            existing = [i for i in model if i % n_parts == p and i < 1000]
            if existing and rng.random() < 0.7:
                k = rng.choice(existing)
                pairs.append((k, f"{tag}u{k}"))
            pairs = [(i, v) for i, v in pairs if i % n_parts == p or i >= 1000]
            # force inserts into partition p
            upd = spark.createDataFrame(
                [(i, v, p) for i, v in pairs], "id long, v string, p int"
            )
            merge_versioned(
                spark, base, upd, ["id"], partition_by=("p",),
                keys_are_partition_stable=True,
            )
            model_merge(pairs, p)

        def do_delete(i):
            delete_where(spark, base, f"id = {i}")
            model.pop(i, None)

        for round_no in range(10):
            parts = rng.sample(range(n_parts), 3)
            outer_p, int_p1, int_p2 = parts
            interferers = []
            # interferer 1: merge on a different partition
            interferers.append(lambda p=int_p1: do_merge("A", p))
            # interferer 2 (sometimes): delete an id OUTSIDE outer_p
            victims = [
                i for i in model
                if i % n_parts == int_p2 and i < 1000
            ]
            if victims and rng.random() < 0.6:
                interferers.append(
                    lambda i=rng.choice(victims): do_delete(i)
                )

            def hook(fns=tuple(interferers)):
                _test_hooks.pop("before_commit", None)
                for fn in fns:
                    fn()

            _test_hooks["before_commit"] = hook
            try:
                do_merge("B", outer_p)
            finally:
                _test_hooks.pop("before_commit", None)

        got = dict(
            (r["id"], r["v"])
            for r in read_version(spark, base).collect()
        )
        assert got == model, (
            f"diverged: extra={sorted(set(got) - set(model))[:5]} "
            f"missing={sorted(set(model) - set(got))[:5]} "
            f"changed={[k for k in got if k in model and got[k] != model[k]][:5]}"
        )
        # every round committed 2-3 versions, none aborted
        ops = [e["op"] for e in _read_log(base)]
        assert ops[0] == "write" and len(ops) >= 21


class TestReorgRebase:
    """Round-10 VERDICT #4: REORG was abort-only under concurrency; it
    now rebases over winners that stayed off its rewritten files AND
    left the tombstone riders untouched — blind appends, the common
    live-ingest race — while any rider change or rewrite overlap still
    aborts (a dropped rider must exactly match the tip's)."""

    def _mor_table(self, spark, base):
        write_version(
            spark.range(30).select(
                F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
            ).repartition(3),
            base,
        )
        delete_where(spark, base, "id < 5")  # positional scoped rider

    def test_reorg_rebases_over_blind_append(self, spark, tmp_path):
        from etl_opensky_spark.sources.versioned import (
            materialize_tombstones,
        )

        base = str(tmp_path / "lake")
        self._mor_table(spark, base)
        land = str(tmp_path / "land")
        spark.range(100, 103).select(
            F.col("id"), F.lit("new").alias("v")
        ).repartition(1).write.parquet(land)
        _interfere_once(lambda: copy_into(spark, base, land))
        v, n_rewritten = materialize_tombstones(spark, base)
        assert v == 4 and n_rewritten > 0
        log = _read_log(base)
        assert [e["op"] for e in log] == [
            "write", "delete_where", "copy_into", "reorg"
        ]
        assert not log[-1].get("tombstones")  # riders dropped
        got = sorted(
            r["id"] for r in read_version(spark, base).collect()
        )
        assert got == list(range(5, 30)) + [100, 101, 102]

    def test_reorg_conflicts_with_concurrent_delete(
        self, spark, tmp_path
    ):
        """A winner that ADDED a rider must defeat the rebase: REORG's
        commit drops every rider, which would silently un-delete the
        winner's rows."""
        from etl_opensky_spark.sources.versioned import (
            materialize_tombstones,
        )

        base = str(tmp_path / "lake")
        self._mor_table(spark, base)
        _interfere_once(lambda: delete_where(spark, base, "id = 7"))
        with pytest.raises(LogicalConflictError):
            materialize_tombstones(spark, base)
        # the winner's delete stands untouched
        got = sorted(
            r["id"] for r in read_version(spark, base).collect()
        )
        assert got == [i for i in range(5, 30) if i != 7]
        # and a plain re-run against the new tip converges
        v, _ = materialize_tombstones(spark, base)
        assert v == 4
        assert not _read_log(base)[-1].get("tombstones")
        assert sorted(
            r["id"] for r in read_version(spark, base).collect()
        ) == [i for i in range(5, 30) if i != 7]

    def test_reorg_conflicts_when_rewritten_file_compacted(
        self, spark, tmp_path
    ):
        """A winner that REWROTE one of the REORG's candidate files
        (OPTIMIZE carrying the riders forward) invalidates the staged
        purge of those bytes."""
        from etl_opensky_spark.sources.versioned import (
            materialize_tombstones,
            optimize_small_files,
        )

        base = str(tmp_path / "lake")
        self._mor_table(spark, base)
        _interfere_once(
            lambda: optimize_small_files(
                spark, base, target_rows_per_file=100
            )
        )
        with pytest.raises(LogicalConflictError):
            materialize_tombstones(spark, base)
