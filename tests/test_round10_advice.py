"""Round-10 ADVICE regression tests.

1. (high) A partition-scoped MERGE with movable keys
   (``keys_are_partition_stable=False``) must NOT rebase over a winner
   that inserted keys it cannot prove disjoint from its own updates —
   two merges upserting the SAME key into different partitions would
   otherwise both commit and duplicate the key.  With manifest stats
   proving disjointness, the rebase still goes through.
2. (medium) ``repair_change_feed`` parses claim names defensively: a
   claimant that crashed inside ``put_if_absent`` leaves a
   ``_claim-<v>.put-<hex>`` staging temp which used to crash the
   repair with ValueError; now it is garbage-collected and the repair
   proceeds.
3. (low) ``_where_file_verdict`` evaluates every bound column before
   declaring "partial": one provably-disjoint column excludes the file
   even when another column is unprovable, independent of the where
   dict's iteration order.
4. (low) ``_commit_rebased(cleanup_on_error=True)`` (OPTIMIZE) removes
   the assembled snapshot dir even when the failure happens INSIDE the
   build callback (stats harvest), not just after it returns.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    LogicalConflictError,
    _read_log,
    _test_hooks,
    _where_file_verdict,
    materialize_change_feed,
    merge_versioned,
    metadata_aggregate,
    optimize_small_files,
    read_version,
    repair_change_feed,
    write_version,
)

from .conftest import rows


def _pdf(spark, triples):
    return spark.createDataFrame(triples, "id long, v string, p int")


def _seed(spark, base, n=12, parts=3, stats_cols=()):
    df = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") % parts).cast("int").alias("p"),
    )
    write_version(
        df.repartition(2), base, partition_by=("p",),
        stats_cols=stats_cols,
    )


def _interfere_once(fn):
    def hook():
        _test_hooks.pop("before_commit", None)
        fn()

    _test_hooks["before_commit"] = hook


@pytest.fixture(autouse=True)
def _clean_hooks():
    yield
    _test_hooks.pop("before_commit", None)


class TestMergeKeyLevelConflict:
    def test_same_key_different_partitions_conflicts(
        self, spark, tmp_path
    ):
        """The ADVICE r9 #1 scenario verbatim: both merges insert NEW
        key 500, the winner into p=0, the loser into p=1.  The
        partitions are disjoint, but the loser's moved_from probe read
        every partition's keys — a serial re-run would have routed its
        upsert onto the winner's row.  Without a key-disjointness
        proof (no stats here) the rebase must refuse; the table must
        hold key 500 exactly once."""
        base = str(tmp_path / "lake")
        _seed(spark, base)
        _interfere_once(
            lambda: merge_versioned(
                spark, base, _pdf(spark, [(500, "WINNER", 0)]),
                ["id"], partition_by=("p",),
            )
        )
        with pytest.raises(LogicalConflictError):
            merge_versioned(
                spark, base, _pdf(spark, [(500, "LOSER", 1)]),
                ["id"], partition_by=("p",),
            )
        got = [
            (r["v"], r["p"])
            for r in read_version(spark, base)
            .filter(F.col("id") == 500).collect()
        ]
        assert got == [("WINNER", 0)]  # exactly once, winner's row
        assert [e["op"] for e in _read_log(base)] == ["write", "merge"]

    def test_stats_prove_disjoint_keys_rebase(self, spark, tmp_path):
        """With key-column stats in the winner's manifest and truly
        disjoint key ranges, the movable-key merge still rebases —
        the conservative check only refuses UNPROVABLE overlap."""
        base = str(tmp_path / "lake")
        _seed(spark, base, stats_cols=("id",))
        _interfere_once(
            lambda: merge_versioned(
                spark, base,
                _pdf(spark, [(1000, "A1000", 0), (1001, "A1001", 0)]),
                ["id"], partition_by=("p",), stats_cols=("id",),
            )
        )
        v = merge_versioned(
            spark, base, _pdf(spark, [(2000, "B2000", 1)]),
            ["id"], partition_by=("p",), stats_cols=("id",),
        )
        assert v == 3
        assert [e["op"] for e in _read_log(base)] == [
            "write", "merge", "merge"
        ]
        got = dict(
            (r["id"], r["v"])
            for r in read_version(spark, base).collect()
        )
        assert got[1000] == "A1000" and got[2000] == "B2000"
        assert len(got) == 15

    def test_stats_overlapping_keys_conflict(self, spark, tmp_path):
        """Stats present but ranges overlap: still a refusal — the
        proof must be positive, not merely attempted."""
        base = str(tmp_path / "lake")
        _seed(spark, base, stats_cols=("id",))
        _interfere_once(
            lambda: merge_versioned(
                spark, base, _pdf(spark, [(1000, "A", 0)]),
                ["id"], partition_by=("p",), stats_cols=("id",),
            )
        )
        with pytest.raises(LogicalConflictError):
            merge_versioned(
                spark, base, _pdf(spark, [(1000, "B", 1)]),
                ["id"], partition_by=("p",), stats_cols=("id",),
            )

    def test_key_preserving_winner_still_rebases(self, spark, tmp_path):
        """A winner that cannot introduce keys (delete_where) needs no
        proof: the movable-key merge rebases over it as before."""
        from etl_opensky_spark.sources.versioned import delete_where

        base = str(tmp_path / "lake")
        _seed(spark, base)
        _interfere_once(lambda: delete_where(spark, base, "id = 2"))
        v = merge_versioned(
            spark, base, _pdf(spark, [(0, "B0", 0)]),
            ["id"], partition_by=("p",),
        )
        assert v == 3
        got = dict(
            (r["id"], r["v"])
            for r in read_version(spark, base).collect()
        )
        assert got[0] == "B0" and 2 not in got


class TestRepairFeedDefensiveParse:
    def test_stray_put_temp_does_not_crash_repair(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        out = str(tmp_path / "feed")
        df = spark.range(4).select(
            F.col("id").alias("k"), F.lit("a").alias("v")
        )
        write_version(df, base)
        merge_versioned(
            spark, base,
            spark.createDataFrame([(9, "b")], "k long, v string"),
            ["k"],
        )
        materialize_change_feed(spark, base, out, ["k"])
        assert os.path.isdir(os.path.join(out, "commit=2"))
        # simulate a claimant that died inside put_if_absent (staging
        # temp left) plus one that died after claiming but before
        # publishing (claim without a published dir)
        import shutil

        shutil.rmtree(os.path.join(out, "commit=2"))
        open(os.path.join(out, "_claim-00000002"), "w").close()
        stray = os.path.join(out, "_claim-00000002.put-ab12cd34")
        open(stray, "w").close()
        n_done, _ = repair_change_feed(spark, base, out, ["k"])
        assert n_done == 1
        assert os.path.isdir(os.path.join(out, "commit=2"))
        assert not os.path.exists(stray)  # GC'd, not crashed on


class TestWhereVerdictOrderIndependence:
    def test_disjoint_column_wins_regardless_of_order(self):
        per_col = {"a": {"min": 10, "max": 20, "nulls": 0, "rows": 5}}
        # "b" has no stats (unprovable); "a" is provably disjoint
        assert _where_file_verdict(
            "f.parquet", per_col, {"b": (0, 1), "a": (100, 200)}
        ) == "none"
        assert _where_file_verdict(
            "f.parquet", per_col, {"a": (100, 200), "b": (0, 1)}
        ) == "none"
        # and with no disjoint column, still partial
        assert _where_file_verdict(
            "f.parquet", per_col, {"b": (0, 1), "a": (10, 20)}
        ) == "partial"

    def test_metadata_aggregate_excludes_despite_unprovable_col(
        self, spark, tmp_path
    ):
        base = str(tmp_path / "lake")
        df = spark.range(10).select(
            F.col("id").alias("a"), (F.col("id") * 2).alias("b")
        )
        # stats harvested on "a" only: bounds on "b" are unprovable
        write_version(df.repartition(2), base, stats_cols=("a",))
        out = metadata_aggregate(
            base, ["a"], where={"b": (0, 5), "a": (100, 200)}
        )
        assert out["rows"] == 0  # every file disjoint on "a": excluded


class TestOptimizeBuildFailureCleanup:
    def test_build_time_failure_leaves_no_debris(
        self, spark, tmp_path, monkeypatch
    ):
        import etl_opensky_spark.sources.versioned as V

        base = str(tmp_path / "lake")
        df = spark.range(40).select(
            F.col("id"), (F.col("id") * 3).alias("v")
        )
        # many small files so OPTIMIZE has work; stats so build harvests
        write_version(df.repartition(8), base, stats_cols=("id",))

        def boom(*a, **k):
            raise RuntimeError("injected stats-harvest failure")

        monkeypatch.setattr(V, "_harvest_file_stats", boom)
        with pytest.raises(RuntimeError, match="injected"):
            optimize_small_files(spark, base, target_rows_per_file=40)
        monkeypatch.undo()
        referenced = {e["dir"] for e in _read_log(base)}
        on_disk = {
            d for d in os.listdir(base) if d.startswith("data-")
        }
        assert on_disk == referenced  # eager cleanup covered build too
        # table unharmed
        assert len(rows(read_version(spark, base))) == 40


class TestKeyUniquenessProperty:
    def test_no_interleaving_duplicates_keys(self, spark, tmp_path):
        """Randomized adversarial property for the ADVICE r9 #1 class:
        rounds of a merge losing to an interferer that sometimes
        inserts the SAME new key under a DIFFERENT partition value.
        Whatever the outcome of each round (rebase or refusal), the
        table must NEVER hold a key twice, and every committed value
        must be one some serial order produces."""
        import random

        from etl_opensky_spark.sources.versioned import (
            ConcurrentCommitError,
        )

        rng = random.Random(1010)
        base = str(tmp_path / "lake")
        _seed(spark, base, n=12, parts=3)
        next_new = 5000
        for _round in range(8):
            outer_p = rng.randrange(3)
            inner_p = (outer_p + 1 + rng.randrange(2)) % 3
            if rng.random() < 0.5:
                # adversarial: both writers insert the SAME new key
                shared = next_new
                next_new += 1
                inner_pairs = [(shared, f"I{shared}", inner_p)]
                outer_pairs = [(shared, f"O{shared}", outer_p)]
            else:
                a, b = next_new, next_new + 1
                next_new += 2
                inner_pairs = [(a, f"I{a}", inner_p)]
                outer_pairs = [(b, f"O{b}", outer_p)]
            _interfere_once(
                lambda p=inner_pairs: merge_versioned(
                    spark, base, _pdf(spark, p),
                    ["id"], partition_by=("p",),
                )
            )
            try:
                merge_versioned(
                    spark, base, _pdf(spark, outer_pairs),
                    ["id"], partition_by=("p",),
                )
            except ConcurrentCommitError:
                pass  # refusal is a legal outcome; duplication is not
            finally:
                _test_hooks.pop("before_commit", None)
        rows_ = read_version(spark, base).collect()
        ids = [r["id"] for r in rows_]
        assert len(ids) == len(set(ids)), (
            f"duplicate keys: "
            f"{sorted(i for i in ids if ids.count(i) > 1)}"
        )
        # winners' rows are never lost or altered by a loser's refusal
        for r in rows_:
            if r["id"] >= 5000:
                assert r["v"] in (f"I{r['id']}", f"O{r['id']}")
