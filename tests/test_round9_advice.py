"""Round-9 ADVICE regression tests.

1. (high) ``_bloom_extend`` must not mutate the hardlink-shared parent
   sidecar inode — ancestors' indexes are immutable committed history.
2. (low) ``_bloom_extend`` hashes at the index's RECORDED dtype, so an
   ingested file with a narrower physical type still point-looks-up.
3. (low) ``vacuum_versions(retain_seconds=...)`` keeps commits whose
   timestamp is unresolvable (documented conservative behavior).
4. (medium) lakefeed ``initialOffset`` seeds the admission-control
   cursor without ever downgrading an already-advanced one.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    _bloom_load,
    _commit_path,
    _entry_files,
    _read_log,
    _write_checkpoint,
    copy_into,
    prune_files_eq,
    read_version,
    read_version_eq,
    vacuum_versions,
    write_version,
)


def _bloom_lake(spark, tmp_path, landing_cast=None):
    """A bloom-indexed table plus one copy_into append; returns
    (base, parent_entry, ingested-only key)."""
    base = str(tmp_path / "lake")
    landing = str(tmp_path / "landing")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    write_version(
        df.filter(F.col("k") < 200).repartitionByRange(4, "k"),
        base,
        bloom_cols=("k",),
        bloom_bits=1 << 14,
    )
    new = df.filter(F.col("k") >= 200)
    if landing_cast:
        new = new.withColumn("k", F.col("k").cast(landing_cast))
    new.repartition(2).write.mode("overwrite").parquet(landing)
    parent = _read_log(base)[-1]
    copy_into(spark, base, landing)
    return base, parent, 399


class TestBloomExtendIsolation:
    def test_parent_sidecar_untouched(self, spark, tmp_path):
        """copy_into extends the CHILD's bloom index only: the parent
        snapshot's sidecar (hardlink-carried on POSIX) must keep its
        own inode and its own file list — in-place truncation of the
        shared inode corrupted every ancestor's committed index (r8
        ADVICE, high)."""
        base, parent, _k = _bloom_lake(spark, tmp_path)
        parent_dir = os.path.join(base, parent["dir"])
        side = _bloom_load(parent_dir)
        assert side is not None
        parent_files = set(_entry_files(base, parent))
        for idx in side.values():
            listed = set(idx["files"])
            assert listed <= parent_files, (
                "parent bloom index lists files outside the parent "
                f"manifest: {sorted(listed - parent_files)[:3]}"
            )
        # time-travel point lookup at the parent resolves every rel
        kept, total = prune_files_eq(
            spark, base, "k", 7, as_of=parent["version"]
        )
        assert kept and total == len(parent_files)
        got = (
            read_version_eq(spark, base, "k", 7, as_of=parent["version"])
            .filter(F.col("k") == 7)
            .collect()
        )
        assert [(r["k"], r["v"]) for r in got] == [(7, 14)]

    def test_child_index_covers_ingested_files(self, spark, tmp_path):
        base, parent, k_new = _bloom_lake(spark, tmp_path)
        kept, total = prune_files_eq(spark, base, "k", k_new)
        assert kept, "ingested-only key false-negatived"
        assert total > len(_entry_files(base, parent))
        got = (
            read_version_eq(spark, base, "k", k_new)
            .filter(F.col("k") == k_new)
            .collect()
        )
        assert [(r["k"], r["v"]) for r in got] == [(k_new, 2 * k_new)]

    def test_extend_hashes_at_recorded_dtype(self, spark, tmp_path):
        """Landing files storing the bloom column at a NARROWER
        physical type (int32 where the index recorded bigint) must
        still be point-lookupable: lookups cast the probe to the
        recorded dtype, so the build side has to hash the widened
        value too (r8 ADVICE, low)."""
        base, _parent, k_new = _bloom_lake(
            spark, tmp_path, landing_cast="int"
        )
        kept, _total = prune_files_eq(spark, base, "k", k_new)
        assert any(rel.startswith("ing-") for rel in kept), (
            "int32-typed ingested file false-negatived the lookup"
        )
        got = (
            read_version_eq(spark, base, "k", k_new)
            .filter(F.col("k") == k_new)
            .collect()
        )
        assert [(r["k"], r["v"]) for r in got] == [(k_new, 2 * k_new)]


class TestVacuumUnresolvableTs:
    def test_unknown_ts_kept_and_scan_stops(self, spark, tmp_path):
        """A commit whose effective timestamp is unresolvable (legacy
        entry surviving only via a checkpoint roll-up) must NEVER be
        age-vacuumed — it could be younger than the window.  Before
        the fix it inherited the PREVIOUS entry's (old) time and was
        dropped (r8 ADVICE, low)."""
        base = str(tmp_path / "lake")
        df = spark.range(0, 50).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        )
        write_version(df, base)
        for i in range(3):
            landing = str(tmp_path / f"land{i}")
            spark.range(100 + i, 101 + i).select(
                F.col("id").alias("k"), F.lit("y").alias("v")
            ).write.mode("overwrite").parquet(landing)
            copy_into(spark, base, landing)
        # age v1 far beyond the retention window; strip v2's ts
        for v, patch in ((1, {"ts": time.time() - 10_000}), (2, None)):
            p = _commit_path(base, v)
            with open(p) as fh:
                doc = json.load(fh)
            if patch:
                doc.update(patch)
            else:
                doc.pop("ts", None)
            with open(p, "w") as fh:
                json.dump(doc, fh)
        # roll the (ts-less) v2 entry into a checkpoint, then drop its
        # commit file: _commit_ts(v2) now has neither ts nor mtime
        _write_checkpoint(base, 4)
        os.remove(_commit_path(base, 2))
        dropped = vacuum_versions(base, keep_last=1, retain_seconds=3600)
        assert dropped == [1], (
            f"expected only the provably-old v1 dropped, got {dropped}"
        )
        # v2 (unknown age) and everything after survive and read
        assert read_version(spark, base, as_of=3).count() == 52
        assert read_version(spark, base).count() == 53


class TestInitialOffsetSeedsCursor:
    def _feed(self, spark, tmp_path):
        from etl_opensky_spark.sources.versioned import (
            materialize_change_feed,
            merge_versioned,
        )

        src = str(tmp_path / "src")
        feed = str(tmp_path / "feed")
        write_version(
            spark.createDataFrame([], "id long, v string"), src
        )
        for i in range(4):
            merge_versioned(
                spark,
                src,
                spark.createDataFrame([(i, f"v{i}")], "id long, v string"),
                ["id"],
            )
        materialize_change_feed(spark, src, feed, ["id"])
        return feed

    def test_initial_offset_first_caps_first_batch(self, spark, tmp_path):
        """Protocol shape of an engine that calls initialOffset before
        the first latestOffset: the seed makes the FIRST batch of a
        fresh query obey maxCommitsPerBatch (r8 ADVICE, medium)."""
        from etl_opensky_spark.sources.lakefeed import (
            LakeFeedStreamReader,
            _commit_versions,
        )

        feed = self._feed(spark, tmp_path)
        versions = _commit_versions(feed)
        assert len(versions) >= 3
        r = LakeFeedStreamReader({"path": feed, "maxCommitsPerBatch": "1"})
        base = r.initialOffset()
        assert base == {"version": 0}
        first = r.latestOffset()
        assert first == {"version": versions[0]}, (
            "fresh query's first batch not capped after initialOffset"
        )

    def test_initial_offset_never_downgrades_cursor(self, spark, tmp_path):
        """Spark 4.1.2's traced order is latestOffset FIRST (the
        engine records that offset), then initialOffset, then
        partitions — a later initialOffset must not move the cursor
        backward, or a re-probe would return an offset below one
        already in the engine's log."""
        from etl_opensky_spark.sources.lakefeed import (
            LakeFeedStreamReader,
            _commit_versions,
        )

        feed = self._feed(spark, tmp_path)
        versions = _commit_versions(feed)
        r = LakeFeedStreamReader({"path": feed, "maxCommitsPerBatch": "1"})
        tip = r.latestOffset()
        assert tip == {"version": versions[-1]}  # base unknown: uncapped
        r.initialOffset()
        assert r.latestOffset() == tip, (
            "initialOffset downgraded an already-returned offset"
        )

    def test_starting_version_seed(self, spark, tmp_path):
        from etl_opensky_spark.sources.lakefeed import (
            LakeFeedStreamReader,
            _commit_versions,
        )

        feed = self._feed(spark, tmp_path)
        versions = _commit_versions(feed)
        start_at = versions[1]
        r = LakeFeedStreamReader(
            {
                "path": feed,
                "maxCommitsPerBatch": "1",
                "startingVersion": str(start_at),
            }
        )
        assert r.initialOffset() == {"version": start_at - 1}
        assert r.latestOffset() == {"version": start_at}


class TestQ301Deterministic:
    def test_gate_separates_commit_clocks(self, spark):
        sf_dir = "/root/testdata/sf0.001"
        if not os.path.isdir(sf_dir):
            pytest.skip("driver testdata not present")
        from etl_opensky_spark.queries import q301_timestamp_time_travel

        row = q301_timestamp_time_travel(spark, sf_dir).first()
        assert (row["v_mid"], row["v_tip"]) == (2, 3)


class TestDsTimeTravelOptions:
    """SQL-surface time travel (round-9 VERDICT #6):
    spark.read.format('versioned').option('versionAsOf'|'timestampAsOf')
    — oracle-pinned against read_version in gate q308."""

    def _lake(self, spark, tmp_path):
        from etl_opensky_spark.sources.lakesource import (
            register_versioned_source,
        )
        from etl_opensky_spark.sources.versioned import copy_into

        register_versioned_source(spark)
        base = str(tmp_path / "lake")
        land = str(tmp_path / "land")
        spark.range(0, 10).select(
            F.col("id").alias("k"), F.lit("old").alias("v")
        ).write.parquet(land)
        write_version(
            spark.range(100, 105).select(
                F.col("id").alias("k"), F.lit("v1").alias("v")
            ),
            base,
        )
        copy_into(spark, base, land)
        return base

    def test_version_as_of(self, spark, tmp_path):
        base = self._lake(spark, tmp_path)
        v1 = (
            spark.read.format("versioned")
            .option("versionAsOf", "1").load(base)
        )
        assert sorted(r["k"] for r in v1.collect()) == list(
            range(100, 105)
        )
        tip = spark.read.format("versioned").load(base)
        assert tip.count() == 15

    def test_timestamp_as_of(self, spark, tmp_path):
        from etl_opensky_spark.sources.versioned import describe_history

        base = self._lake(spark, tmp_path)
        ts1 = describe_history(base)[0]["ts"]
        df = (
            spark.read.format("versioned")
            .option("timestampAsOf", str(ts1)).load(base)
        )
        assert df.count() == 5
        # ISO string form resolves through the same clock
        import datetime as dt

        iso = dt.datetime.fromtimestamp(
            describe_history(base)[-1]["ts"] + 1
        ).isoformat()
        tip = (
            spark.read.format("versioned")
            .option("timestampAsOf", iso).load(base)
        )
        assert tip.count() == 15

    def test_exclusive_options_rejected(self, spark, tmp_path):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import AnalysisException

        base = self._lake(spark, tmp_path)
        with pytest.raises((Py4JJavaError, AnalysisException, Exception)):
            (
                spark.read.format("versioned")
                .option("versionAsOf", "1")
                .option("timestampAsOf", "1.0")
                .load(base)
                .collect()
            )

    def test_legacy_asof_alias(self, spark, tmp_path):
        base = self._lake(spark, tmp_path)
        v1 = (
            spark.read.format("versioned").option("asof", "1").load(base)
        )
        assert v1.count() == 5
