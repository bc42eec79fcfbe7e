"""Change-feed retention + incremental trigger listing (round-10
VERDICT #1).

The feed used to grow forever and every ``latestOffset`` stat-ed one
publish marker per commit dir ever published — O(feed history) HEADs
per trigger on an object store.  Now:

- ``vacuum_change_feed`` drops consumed ``commit=<v>`` dirs behind an
  atomically-published low-water mark; later reads of a dropped
  version RAISE (the ``vacuum_versions`` contract), and
  ``materialize_change_feed`` treats vacuumed versions as done.
- ``LakeFeedStreamReader`` lists incrementally from its tracked
  cursor: marker stats per trigger are bounded by the number of NEW
  versions, pinned here via the in-process ``_N_PUBLISH_STATS``
  counter.
"""

from __future__ import annotations

import os
import shutil

import pytest

import etl_opensky_spark.sources.lakefeed as LF
from etl_opensky_spark.sources.lakefeed import (
    LakeFeedStreamReader,
    _commit_versions,
    feed_low_water,
    register_lakefeed_source,
)
from etl_opensky_spark.sources.versioned import (
    materialize_change_feed,
    merge_versioned,
    vacuum_change_feed,
    write_version,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], "id int, v string"
    )


def _lake(spark, tmp_path, n=4):
    """Table with versions 1..n+1; feed dirs commit=2..commit=n+1."""
    src = str(tmp_path / "src")
    feed = str(tmp_path / "feed")
    write_version(_df(spark, []), src)
    for i in range(n):
        merge_versioned(
            spark, src, _df(spark, [(i, f"v{i}")]), ["id"]
        )
    materialize_change_feed(spark, src, feed, ["id"])
    return src, feed


def _more_commits(spark, src, feed, ids):
    for i in ids:
        merge_versioned(spark, src, _df(spark, [(i, f"v{i}")]), ["id"])
    materialize_change_feed(spark, src, feed, ["id"])


def _stats_reset():
    LF._N_PUBLISH_STATS = 0


def _stats():
    return LF._N_PUBLISH_STATS


class TestPrunedListing:
    def test_trigger_stats_bounded_by_new_versions(self, spark, tmp_path):
        src, feed = _lake(spark, tmp_path)  # commit=2..5 published
        r = LakeFeedStreamReader({"path": feed})
        assert r.initialOffset() == {"version": 0}
        _stats_reset()
        assert r.latestOffset() == {"version": 5}
        assert _stats() == 4  # first probe of a run: full sweep, once
        r.partitions({"version": 0}, {"version": 5})
        _stats_reset()
        # steady state, nothing new: zero marker stats
        assert r.latestOffset() == {"version": 5}
        assert _stats() == 0
        # two new versions -> exactly two stats per probe
        _more_commits(spark, src, feed, [100, 101])  # commit=6,7
        _stats_reset()
        assert r.latestOffset() == {"version": 7}
        assert _stats() == 2
        _stats_reset()
        parts = r.partitions({"version": 5}, {"version": 7})
        assert [p.version for p in parts] == [6, 7]
        assert _stats() == 2

    def test_hole_behind_cursor_caps_offset(self, spark, tmp_path):
        """With the cursor at 5, a published 7 whose predecessor 6 is
        missing (crashed claimant) must NOT advance the offset — the
        contiguity run starts at cursor+1, pruned listing or not."""
        src, feed = _lake(spark, tmp_path)
        r = LakeFeedStreamReader({"path": feed})
        r.latestOffset()
        r.partitions({"version": 0}, {"version": 5})  # consumed 2..5
        _more_commits(spark, src, feed, [100, 101])  # commit=6,7
        shutil.rmtree(os.path.join(feed, "commit=6"))
        assert r.latestOffset() == {"version": 5}  # capped at the hole


class TestVacuum:
    def test_vacuum_drops_dirs_and_raises_low_water(
        self, spark, tmp_path
    ):
        src, feed = _lake(spark, tmp_path)
        assert _commit_versions(feed) == [2, 3, 4, 5]
        dropped = vacuum_change_feed(feed, keep_after=3)
        assert dropped == [2, 3]
        assert _commit_versions(feed) == [4, 5]
        assert feed_low_water(feed) == 3
        # a second vacuum below the mark is a no-op, never a downgrade
        assert vacuum_change_feed(feed, keep_after=2) == []
        assert feed_low_water(feed) == 3

    def test_materializer_treats_vacuumed_as_done(self, spark, tmp_path):
        src, feed = _lake(spark, tmp_path)
        vacuum_change_feed(feed, keep_after=5)
        # directory cursor alone would re-publish 2..5 — the low-water
        # must keep them done
        assert materialize_change_feed(spark, src, feed, ["id"]) == (0, 0)
        assert _commit_versions(feed) == []
        _more_commits(spark, src, feed, [100])
        assert _commit_versions(feed) == [6]

    def test_fresh_query_below_low_water_raises(self, spark, tmp_path):
        src, feed = _lake(spark, tmp_path)
        vacuum_change_feed(feed, keep_after=3)
        r = LakeFeedStreamReader({"path": feed})
        assert r.latestOffset() == {"version": 5}
        with pytest.raises(ValueError, match="startingVersion"):
            r.partitions({"version": 0}, {"version": 5})
        # the named remedy works: start above the low-water
        r2 = LakeFeedStreamReader(
            {"path": feed, "startingVersion": "4"}
        )
        assert r2.latestOffset() == {"version": 5}
        parts = r2.partitions({"version": 3}, {"version": 5})
        assert [p.version for p in parts] == [4, 5]

    def test_resumed_stream_across_vacuum(self, spark, tmp_path):
        """The round-10 done-criterion: drain on a checkpoint, vacuum
        the consumed window, keep committing — the resumed stream on
        the SAME checkpoint admits only the new versions and never
        touches (or needs) the dropped dirs."""
        register_lakefeed_source(spark)
        src, feed = _lake(spark, tmp_path)
        ckpt = str(tmp_path / "ckpt")
        seen: list[tuple] = []

        def drain():
            q = (
                spark.readStream.format("lakefeed")
                .load(feed)
                .writeStream.foreachBatch(
                    lambda df, _bid: seen.extend(
                        (r["id"], r["v"], r["commit"])
                        for r in df.collect()
                    )
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        drain()
        assert sorted(r[0] for r in seen) == [0, 1, 2, 3]
        vacuum_change_feed(feed, keep_after=5)
        _more_commits(spark, src, feed, [100, 101])
        before = len(seen)
        drain()
        new = seen[before:]
        assert sorted(r[0] for r in new) == [100, 101]
        assert sorted(r[2] for r in new) == [6, 7]
        # and the feed directory stayed bounded
        assert _commit_versions(feed) == [6, 7]


class TestDescribeAndKeepLast:
    def test_describe_change_feed(self, spark, tmp_path):
        import json as _json
        import time as _time

        from etl_opensky_spark.sources.versioned import (
            _feed_claim_path,
            describe_change_feed,
            vacuum_change_feed,
        )

        src, feed = _lake(spark, tmp_path)  # commits 2..5
        d = describe_change_feed(feed)
        assert (d["first"], d["tip"], d["n_published"]) == (2, 5, 4)
        assert d["low_water"] == 0
        assert d["holes"] == [] and d["unpublished"] == []
        # carve a hole + add a crashed lease claim
        shutil.rmtree(os.path.join(feed, "commit=4"))
        with open(_feed_claim_path(feed, 4, 2), "w") as fh:
            _json.dump({"owner": "dead", "ts": _time.time() - 500}, fh)
        vacuum_change_feed(feed, keep_after=2)
        d = describe_change_feed(feed)
        assert d["low_water"] == 2
        assert (d["first"], d["tip"]) == (3, 5)
        assert d["holes"] == [4]
        (claim,) = d["claims"]
        assert claim["version"] == 4 and claim["gen"] == 2
        assert claim["mode"] == "lease" and not claim["published"]
        assert claim["age_seconds"] > 400
        assert claim["heartbeat_age_seconds"] is None

    def test_keep_last(self, spark, tmp_path):
        from etl_opensky_spark.sources.versioned import (
            vacuum_change_feed,
        )

        src, feed = _lake(spark, tmp_path)  # commits 2..5
        assert vacuum_change_feed(feed, keep_last=2) == [2, 3]
        assert _commit_versions(feed) == [4, 5]
        assert feed_low_water(feed) == 3
        with pytest.raises(ValueError, match="exactly one"):
            vacuum_change_feed(feed)
        with pytest.raises(ValueError, match="exactly one"):
            vacuum_change_feed(feed, keep_after=1, keep_last=1)
