"""Multi-materializer change feed (round 9): per-version conditional-PUT
claims make each ``commit=<v>`` publish single-writer, lakefeed's
contiguity cap refuses to consume past a hole, and
``repair_change_feed`` recovers a crashed claimant's stall."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_opensky_spark.sources.fs import ObjectStoreFS, set_fs
from etl_opensky_spark.sources.lakefeed import (
    LakeFeedStreamReader,
    _commit_versions,
)
from etl_opensky_spark.sources.versioned import (
    _feed_claim_path,
    materialize_change_feed,
    merge_versioned,
    repair_change_feed,
    write_version,
)


def _src(spark, tmp_path, n_commits=4):
    src = str(tmp_path / "src")
    write_version(
        spark.createDataFrame([], "id long, v string"), src
    )
    for i in range(n_commits):
        merge_versioned(
            spark, src,
            spark.createDataFrame([(i, f"v{i}")], "id long, v string"),
            ["id"],
        )
    return src


def _feed_rows(spark, feed):
    return (
        spark.read.option("basePath", feed).parquet(feed + "/commit=*")
        .select("id", "_change_type")
        .collect()
    )


class TestClaims:
    def test_concurrent_materializers_publish_exactly_once(
        self, spark, tmp_path
    ):
        """Two uncoordinated materializer threads drain the same
        backlog: claims split the versions between them, every commit
        dir publishes exactly once, and the combined feed holds each
        change row exactly once."""
        import threading

        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        results = []
        errors = []

        def worker():
            try:
                results.append(
                    materialize_change_feed(spark, src, feed, ["id"], multi_writer=True)
                )
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=worker) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert sum(n for n, _ in results) == 4  # split, never doubled
        assert _commit_versions(feed) == [2, 3, 4, 5]
        rows = _feed_rows(spark, feed)
        assert sorted(r["id"] for r in rows) == [0, 1, 2, 3]
        assert {r["_change_type"] for r in rows} == {"insert"}

    def test_rerun_is_noop_with_claims_present(self, spark, tmp_path):
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        assert materialize_change_feed(spark, src, feed, ["id"], multi_writer=True)[0] == 4
        assert materialize_change_feed(spark, src, feed, ["id"], multi_writer=True) == (0, 0)

    def test_crashed_claim_stalls_then_repairs(self, spark, tmp_path):
        """A claim without a published dir (claimant died pre-publish)
        stalls the feed at the hole — lakefeed's contiguity cap — and
        repair_change_feed republishes it."""
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        os.makedirs(feed)
        # simulate the crash: version 3's claim exists, dir never lands
        with open(_feed_claim_path(feed, 3), "w"):
            pass
        n, _rows = materialize_change_feed(spark, src, feed, ["id"], multi_writer=True)
        assert n == 3  # v3 skipped (someone "owns" it)
        assert _commit_versions(feed) == [2, 4, 5]
        r = LakeFeedStreamReader({"path": feed})
        assert r.latestOffset() == {"version": 2}  # capped at the hole
        n2, _ = repair_change_feed(spark, src, feed, ["id"])
        assert n2 == 1
        assert _commit_versions(feed) == [2, 3, 4, 5]
        assert r.latestOffset() == {"version": 5}  # cap lifted
        rows = _feed_rows(spark, feed)
        assert sorted(r["id"] for r in rows) == [0, 1, 2, 3]

    def test_repair_spares_published_claims(self, spark, tmp_path):
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        materialize_change_feed(spark, src, feed, ["id"], multi_writer=True)
        claims = sorted(
            n for n in os.listdir(feed) if n.startswith("_claim-")
        )
        assert len(claims) == 4
        assert repair_change_feed(spark, src, feed, ["id"]) == (0, 0)
        assert sorted(
            n for n in os.listdir(feed) if n.startswith("_claim-")
        ) == claims

    def test_object_store_backend(self, spark, tmp_path):
        """Claims are conditional PUTs — the object-store double
        counts them and the whole lifecycle stays marker-gated."""
        prev = set_fs(ObjectStoreFS())
        try:
            src = _src(spark, tmp_path, n_commits=2)
            feed = str(tmp_path / "feed")
            n, _ = materialize_change_feed(spark, src, feed, ["id"], multi_writer=True)
            assert n == 2
            assert _commit_versions(feed) == [2, 3]
            rows = _feed_rows(spark, feed)
            assert sorted(r["id"] for r in rows) == [0, 1]
        finally:
            set_fs(prev)


class TestGapCap:
    def test_offset_never_crosses_a_hole(self, spark, tmp_path):
        """Even the uncapped first offset of a run stops at a gap in
        the published sequence — a skipped version would be lost
        forever once the offset log records anything above it."""
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        materialize_change_feed(spark, src, feed, ["id"], multi_writer=True)
        # knock v4 out (simulate: its claimant crashed pre-dir under a
        # concurrent drain where v5 already landed)
        import shutil

        shutil.rmtree(os.path.join(feed, "commit=4"))
        r = LakeFeedStreamReader({"path": feed})
        assert r.latestOffset() == {"version": 3}
        r2 = LakeFeedStreamReader(
            {"path": feed, "maxCommitsPerBatch": "1"}
        )
        start = {"version": 0}
        r2.partitions(start, start)
        assert r2.latestOffset() == {"version": 2}


class TestSingleWriterDefault:
    def test_no_claims_and_self_heal(self, spark, tmp_path):
        """The default stays the r8 contract: no claim files, and a
        crashed publish (stripped marker) self-heals on the next run —
        the at-least-once side of the trade."""
        from etl_opensky_spark.sources.fs import PUBLISH_MARKER

        src = _src(spark, tmp_path, n_commits=2)
        feed = str(tmp_path / "feed")
        n, _ = materialize_change_feed(spark, src, feed, ["id"])
        assert n == 2
        assert not [
            f for f in os.listdir(feed) if f.startswith("_claim-")
        ]
        marker = os.path.join(feed, "commit=3", PUBLISH_MARKER)
        if os.path.exists(marker):
            os.remove(marker)  # simulate a crashed publish
        assert _commit_versions(feed) == [2]
        n2, _ = materialize_change_feed(spark, src, feed, ["id"])
        assert n2 == 1  # republished without any repair call
        assert _commit_versions(feed) == [2, 3]
