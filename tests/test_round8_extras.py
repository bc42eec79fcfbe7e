"""Round-8 extensions beyond the VERDICT/ADVICE list: TIMESTAMP AS OF
time travel (``version_at_timestamp`` / ``read_version(as_of_timestamp=)``)
and ``lakefeed`` backlog admission control (``maxCommitsPerBatch``)."""

from __future__ import annotations

import json
import os

import pytest

from etl_opensky_spark.sources.versioned import (
    describe_history,
    merge_versioned,
    read_version,
    version_at_timestamp,
    write_version,
)

from .conftest import rows


def _df(spark, pairs):
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], "id int, v string"
    )


def _set_commit_ts(base: str, ts_by_version: dict[int, float | None]):
    """Rewrite the ``ts`` field of commit files in place (test-only:
    simulates specific wall clocks / pre-r8 logs without sleeping)."""
    cdir = os.path.join(base, "_commits")
    for name in os.listdir(cdir):
        if name.endswith(".checkpoint.json") or not name.endswith(".json"):
            continue
        path = os.path.join(cdir, name)
        with open(path) as fh:
            doc = json.load(fh)
        v = doc["version"]
        if v not in ts_by_version:
            continue
        ts = ts_by_version[v]
        if ts is None:
            doc.pop("ts", None)
        else:
            doc["ts"] = ts
        with open(path, "w") as fh:
            json.dump(doc, fh)


def _three_version_lake(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(_df(spark, [(1, "a")]), base)
    merge_versioned(spark, base, _df(spark, [(2, "b")]), ["id"])
    merge_versioned(spark, base, _df(spark, [(3, "c")]), ["id"])
    return base


class TestTimestampAsOf:
    def test_resolution_between_and_at_commits(self, spark, tmp_path):
        base = _three_version_lake(spark, tmp_path)
        _set_commit_ts(base, {1: 100.0, 2: 200.0, 3: 300.0})
        assert version_at_timestamp(base, 150.0) == 1
        assert version_at_timestamp(base, 200.0) == 2  # inclusive bound
        assert version_at_timestamp(base, 10_000.0) == 3  # after tip: tip
        with pytest.raises(ValueError, match="precedes"):
            version_at_timestamp(base, 50.0)

    def test_read_version_as_of_timestamp(self, spark, tmp_path):
        base = _three_version_lake(spark, tmp_path)
        _set_commit_ts(base, {1: 100.0, 2: 200.0, 3: 300.0})
        got = read_version(spark, base, as_of_timestamp=250.0)
        assert rows(got) == rows(read_version(spark, base, as_of=2))
        with pytest.raises(ValueError, match="exclusive"):
            read_version(spark, base, as_of=1, as_of_timestamp=250.0)

    def test_monotonic_clamp_on_clock_regression(self, spark, tmp_path):
        """A writer with a regressed wall clock cannot make history
        non-monotonic: each effective time is clamped up to its
        parent's (Delta's adjustment), so later versions never resolve
        EARLIER than their ancestors."""
        base = _three_version_lake(spark, tmp_path)
        _set_commit_ts(base, {1: 200.0, 2: 100.0, 3: 300.0})
        # v2's effective time is max(200, 100) = 200 -> ts=200 sees v2
        assert version_at_timestamp(base, 200.0) == 2
        assert version_at_timestamp(base, 250.0) == 2
        assert version_at_timestamp(base, 300.0) == 3
        with pytest.raises(ValueError, match="precedes"):
            version_at_timestamp(base, 150.0)

    def test_legacy_commits_fall_back_to_file_mtime(self, spark, tmp_path):
        """Pre-r8 commit files carry no ``ts``: resolution degrades to
        the commit file's mtime, exactly like Delta on foreign logs."""
        base = _three_version_lake(spark, tmp_path)
        _set_commit_ts(base, {1: None, 2: None, 3: None})
        cdir = os.path.join(base, "_commits")
        for v, t in ((1, 1000.0), (2, 2000.0), (3, 3000.0)):
            os.utime(os.path.join(cdir, f"{v:08d}.json"), (t, t))
        assert version_at_timestamp(base, 1500.0) == 1
        assert version_at_timestamp(base, 2000.0) == 2

    def test_describe_history_carries_ts(self, spark, tmp_path):
        base = _three_version_lake(spark, tmp_path)
        hist = describe_history(base)
        ts = [h["ts"] for h in hist]
        assert all(isinstance(t, float) for t in ts)
        assert ts == sorted(ts)


class TestLakefeedAdmissionControl:
    def _feed(self, spark, tmp_path, n_commits=4):
        from etl_opensky_spark.sources.versioned import (
            materialize_change_feed,
        )

        src = str(tmp_path / "src")
        feed = str(tmp_path / "feed")
        write_version(_df(spark, []), src)
        for i in range(n_commits):
            merge_versioned(
                spark, src, _df(spark, [(i, f"v{i}")]), ["id"]
            )
        materialize_change_feed(spark, src, feed, ["id"])
        return src, feed

    def test_known_base_caps_each_batch(self, spark, tmp_path):
        """Driver-side unit drive of the reader protocol: once the
        base is known (a replayed batch revealed it via partitions),
        every latestOffset admits at most N published commit dirs,
        walking the backlog instead of planning it as one batch."""
        from etl_opensky_spark.sources.lakefeed import (
            LakeFeedStreamReader,
            _commit_versions,
        )

        _src, feed = self._feed(spark, tmp_path)
        versions = _commit_versions(feed)
        assert len(versions) >= 3
        r = LakeFeedStreamReader(
            {"path": feed, "maxCommitsPerBatch": "1"}
        )
        # restart-with-replay shape: the engine re-plans the last
        # checkpointed batch before asking for a new offset
        start = {"version": 0}
        r.partitions(start, start)
        walked = []
        for expected in versions:
            end = r.latestOffset()
            assert end["version"] == expected
            parts = r.partitions(start, end)
            walked.extend(
                p.version for p in parts if p.version >= 0
            )
            start = end
        assert walked == versions
        # drained: the offset stops advancing
        assert r.latestOffset() == {"version": versions[-1]}

    def test_cap_of_two_batches_pairs(self, spark, tmp_path):
        from etl_opensky_spark.sources.lakefeed import (
            LakeFeedStreamReader,
            _commit_versions,
        )

        _src, feed = self._feed(spark, tmp_path)
        versions = _commit_versions(feed)
        r = LakeFeedStreamReader(
            {"path": feed, "maxCommitsPerBatch": "2"}
        )
        start = {"version": 0}
        r.partitions(start, start)  # base revealed by replay
        first = r.latestOffset()
        assert first["version"] == versions[1]  # two dirs admitted
        # idempotent until the batch is planned (the engine probes
        # latestOffset more than once per trigger)
        assert r.latestOffset() == first
        r.partitions(start, first)
        second = r.latestOffset()["version"]
        assert second == versions[min(3, len(versions) - 1)]

    def test_first_offset_of_a_run_is_uncapped(self, spark, tmp_path):
        """The first latestOffset of a run (base unknown — the engine
        calls it before initialOffset even on fresh queries, and the
        checkpointed start of a restart is never exposed) must NOT
        return a capped offset: anything below the checkpoint would be
        recorded backward in the offset log and replayed as duplicates.
        It reports the true latest; capping starts once the base is
        known."""
        from etl_opensky_spark.sources.lakefeed import (
            LakeFeedStreamReader,
            _commit_versions,
        )

        _src, feed = self._feed(spark, tmp_path)
        versions = _commit_versions(feed)
        r = LakeFeedStreamReader(
            {"path": feed, "maxCommitsPerBatch": "1"}
        )
        assert r.latestOffset() == {"version": versions[-1]}

    def test_end_to_end_burst_is_capped(self, spark, tmp_path):
        """Full streaming drive: after the (API-forced, uncapped)
        first batch of the run, a BURST of newly published commits —
        the materializer draining a table backlog between triggers —
        flows one commit per microbatch, and the drain still reaches
        the complete feed content."""
        from etl_opensky_spark.sources.lakefeed import (
            register_lakefeed_source,
        )
        from etl_opensky_spark.sources.versioned import (
            materialize_change_feed,
        )

        src, feed = self._feed(spark, tmp_path)
        register_lakefeed_source(spark)
        batches: list[set] = []

        def collect(batch_df, _bid):
            got = {r["commit"] for r in batch_df.collect()}
            if got:
                batches.append(got)

        q = (
            spark.readStream.format("lakefeed")
            .option("maxCommitsPerBatch", "1")
            .load(feed)
            .writeStream.foreachBatch(collect)
            .option(
                "checkpointLocation", str(tmp_path / "ck_capped")
            )
            .start()
        )
        try:
            q.processAllAvailable()
            n_first = len(batches)
            # burst: three table commits published at once mid-run
            for i in range(10, 13):
                merge_versioned(
                    spark, src, _df(spark, [(i, f"v{i}")]), ["id"]
                )
            materialize_change_feed(spark, src, feed, ["id"])
            q.processAllAvailable()
        finally:
            q.stop()
        assert all(len(b) == 1 for b in batches[n_first:])
        assert len(batches[n_first:]) == 3
        want = {
            r["commit"]
            for r in spark.read.parquet(feed)
            .select("commit")
            .distinct()
            .collect()
        }
        assert set().union(*batches) == want

    def test_invalid_cap_rejected(self, spark, tmp_path):
        from etl_opensky_spark.sources.lakefeed import (
            LakeFeedStreamReader,
        )

        with pytest.raises(ValueError, match="maxCommitsPerBatch"):
            LakeFeedStreamReader(
                {"path": "/x", "maxCommitsPerBatch": "0"}
            )


class TestTimestampComposedApis:
    def _lake(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        write_version(_df(spark, [(1, "a")]), base)
        merge_versioned(spark, base, _df(spark, [(2, "b")]), ["id"])
        merge_versioned(spark, base, _df(spark, [(3, "c")]), ["id"])
        return base

    def test_vacuum_retention_window(self, spark, tmp_path):
        from etl_opensky_spark.sources.versioned import vacuum_versions

        base = self._lake(spark, tmp_path)
        _set_commit_ts(base, {1: 100.0, 2: 200.0})  # ancient
        # everything still inside an enormous retention window: the
        # age gate overrides keep_last and nothing drops
        assert vacuum_versions(base, 1, retain_seconds=1e12) == []
        assert len(describe_history(base)) == 3
        # ancient versions fall out of a 1h window
        assert vacuum_versions(base, 1, retain_seconds=3600.0) == [1, 2]
        assert [h["version"] for h in describe_history(base)] == [3]

    def test_vacuum_retention_partial(self, spark, tmp_path):
        import time as _t

        from etl_opensky_spark.sources.versioned import vacuum_versions

        base = self._lake(spark, tmp_path)
        # v1 ancient, v2 recent: only v1 leaves a 1h window even
        # though keep_last=1 would drop both
        _set_commit_ts(base, {1: 100.0, 2: _t.time()})
        assert vacuum_versions(base, 1, retain_seconds=3600.0) == [1]
        assert [h["version"] for h in describe_history(base)] == [2, 3]

    def test_restore_by_timestamp(self, spark, tmp_path):
        from etl_opensky_spark.sources.versioned import restore_version

        base = self._lake(spark, tmp_path)
        _set_commit_ts(base, {1: 100.0, 2: 200.0, 3: 300.0})
        v = restore_version(base, to_timestamp=250.0)  # state at 250 = v2
        assert v == 4
        assert rows(read_version(spark, base)) == rows(
            read_version(spark, base, as_of=2)
        )
        with pytest.raises(ValueError, match="exactly one"):
            restore_version(base)
        with pytest.raises(ValueError, match="exactly one"):
            restore_version(base, to_version=1, to_timestamp=1.0)

    def test_table_changes_by_timestamp(self, spark, tmp_path):
        from etl_opensky_spark.sources.versioned import table_changes

        base = self._lake(spark, tmp_path)
        _set_commit_ts(base, {1: 100.0, 2: 200.0, 3: 300.0})
        by_v = table_changes(spark, base, ["id"], from_version=1)
        by_ts = table_changes(spark, base, ["id"], from_timestamp=150.0)
        assert rows(by_v) == rows(by_ts)
        with pytest.raises(ValueError, match="exclusive"):
            table_changes(
                spark, base, ["id"], from_version=1, from_timestamp=1.0
            )
        with pytest.raises(ValueError, match="required"):
            table_changes(spark, base, ["id"])


class TestLakefeedStartingVersion:
    def test_fresh_query_starts_at_version(self, spark, tmp_path):
        from etl_opensky_spark.sources.lakefeed import (
            LakeFeedStreamReader,
            _commit_versions,
            register_lakefeed_source,
        )
        from etl_opensky_spark.sources.versioned import (
            materialize_change_feed,
        )

        src = str(tmp_path / "src")
        feed = str(tmp_path / "feed")
        write_version(_df(spark, []), src)
        for i in range(4):
            merge_versioned(
                spark, src, _df(spark, [(i, f"v{i}")]), ["id"]
            )
        materialize_change_feed(spark, src, feed, ["id"])
        versions = _commit_versions(feed)
        start_at = versions[2]
        r = LakeFeedStreamReader(
            {"path": feed, "startingVersion": str(start_at)}
        )
        assert r.initialOffset() == {"version": start_at - 1}
        with pytest.raises(ValueError, match="startingVersion"):
            LakeFeedStreamReader(
                {"path": feed, "startingVersion": "0"}
            )
        # e2e: a fresh query consumes only commits >= startingVersion
        register_lakefeed_source(spark)
        seen: set[int] = set()

        def collect(batch_df, _bid):
            seen.update(r["commit"] for r in batch_df.collect())

        q = (
            spark.readStream.format("lakefeed")
            .option("startingVersion", str(start_at))
            .load(feed)
            .writeStream.foreachBatch(collect)
            .option("checkpointLocation", str(tmp_path / "ck_sv"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert seen == set(versions[2:])

    def test_starting_version_past_tip_floors_offset(
        self, spark, tmp_path
    ):
        """startingVersion ahead of the feed tip: latestOffset must
        never report an offset below startingVersion-1 — Spark records
        whatever it returns, and commits published in the gap would
        later be consumed against the user's exclusion."""
        from etl_opensky_spark.sources.lakefeed import (
            LakeFeedStreamReader,
            _commit_versions,
        )
        from etl_opensky_spark.sources.versioned import (
            materialize_change_feed,
        )

        src = str(tmp_path / "src")
        feed = str(tmp_path / "feed")
        write_version(_df(spark, []), src)
        for i in range(3):
            merge_versioned(
                spark, src, _df(spark, [(i, f"v{i}")]), ["id"]
            )
        materialize_change_feed(spark, src, feed, ["id"])
        tip = _commit_versions(feed)[-1]
        future = tip + 5
        r = LakeFeedStreamReader(
            {"path": feed, "startingVersion": str(future)}
        )
        start = r.initialOffset()
        assert start == {"version": future - 1}
        end = r.latestOffset()
        assert end["version"] >= future - 1  # floored, no regression
        parts = [
            p.version
            for p in r.partitions(start, end)
            if p.version >= 0
        ]
        assert parts == []  # nothing below startingVersion ever planned


class TestBloomOnFileAddingCommits:
    """r8 review finding: prune_files_eq iterates the bloom index's
    file list, so files added AFTER the bloom build must be indexed
    (copy_into extends) or the index must go (DS append drops) — a
    carried stale index silently false-negatives point lookups."""

    def test_copy_into_extends_bloom(self, spark, tmp_path):
        from etl_opensky_spark.sources.versioned import (
            copy_into,
            prune_files_eq,
            read_version_eq,
        )

        base = str(tmp_path / "lake")
        landing = str(tmp_path / "landing")
        write_version(
            _df(spark, [(i, f"v{i}") for i in range(10)]),
            base, bloom_cols=("id",),
        )
        spark.createDataFrame(
            [(99, "new")], "id int, v string"
        ).write.parquet(landing)
        copy_into(spark, base, landing)
        kept, total = prune_files_eq(spark, base, "id", 99)
        assert kept, "ingested file invisible to the bloom index"
        got = read_version_eq(spark, base, "id", 99).filter(
            "id = 99"
        ).collect()
        assert [(r["id"], r["v"]) for r in got] == [(99, "new")]
        # old keys still resolve through the extended index
        assert read_version_eq(spark, base, "id", 3).filter(
            "id = 3"
        ).count() == 1

    def test_ds_append_drops_bloom(self, spark, tmp_path):
        from etl_opensky_spark.sources.lakesource import (
            register_versioned_source,
        )
        from etl_opensky_spark.sources.versioned import prune_files_eq

        base = str(tmp_path / "lake")
        write_version(
            _df(spark, [(i, f"v{i}") for i in range(10)]),
            base, bloom_cols=("id",),
        )
        register_versioned_source(spark)
        spark.createDataFrame(
            [(99, "new")], "id int, v string"
        ).write.format("versioned").mode("append").save(base)
        # correctness over staleness: the index is gone, not lying
        with pytest.raises(ValueError, match="no bloom"):
            prune_files_eq(spark, base, "id", 99)
        got = sorted(
            r["id"] for r in read_version(spark, base).collect()
        )
        assert got == sorted(list(range(10)) + [99])
