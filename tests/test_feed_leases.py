"""Claim leases for the multi-writer change feed (round-10 VERDICT #2).

``materialize_change_feed(..., lease_ttl=T)`` upgrades bare claims to
leases: generational claim files carrying a creation timestamp, a
heartbeat sidecar the owner renews, conditional-PUT takeover of lapsed
leases (exactly one taker per generation), and publish FENCING — an
owner superseded while extracting aborts instead of racing the taker's
publish.  A crashed claimant therefore stalls the feed only until the
TTL lapses; no manual ``repair_change_feed`` needed.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F  # noqa: F401 - parity w/ suite

from etl_opensky_spark.sources.fs import is_published
from etl_opensky_spark.sources.lakefeed import (
    LakeFeedStreamReader,
    _commit_versions,
)
from etl_opensky_spark.sources.versioned import (
    _feed_claim_path,
    _feed_claims,
    _test_hooks,
    materialize_change_feed,
    merge_versioned,
    write_version,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], "id int, v string"
    )


def _src(spark, tmp_path, n_commits=4):
    src = str(tmp_path / "src")
    write_version(_df(spark, []), src)
    for i in range(n_commits):
        merge_versioned(spark, src, _df(spark, [(i, f"v{i}")]), ["id"])
    return src


def _feed_ids(spark, feed):
    return sorted(
        r["id"]
        for r in spark.read.option("basePath", feed)
        .parquet(feed + "/commit=*").select("id").collect()
    )


class TestLeaseLifecycle:
    def test_fresh_run_claims_with_generation(self, spark, tmp_path):
        src = _src(spark, tmp_path, n_commits=2)
        feed = str(tmp_path / "feed")
        n, _ = materialize_change_feed(
            spark, src, feed, ["id"], lease_ttl=300
        )
        assert n == 2
        claims = _feed_claims(feed)
        assert claims == {2: 1, 3: 1}
        # payload carries owner + ts; heartbeat sidecar exists
        with open(_feed_claim_path(feed, 2, 1), "rb") as fh:
            meta = json.loads(fh.read())
        assert set(meta) == {"owner", "ts"}
        assert os.path.exists(_feed_claim_path(feed, 2, 1) + ".hb")

    def test_live_lease_is_respected(self, spark, tmp_path):
        """A fresh (unexpired) claim without a published dir means a
        live claimant is working: another materializer must skip it,
        stalling the feed rather than double-publishing."""
        src = _src(spark, tmp_path, n_commits=3)
        feed = str(tmp_path / "feed")
        os.makedirs(feed)
        with open(_feed_claim_path(feed, 3, 1), "w") as fh:
            json.dump({"owner": "other", "ts": time.time()}, fh)
        n, _ = materialize_change_feed(
            spark, src, feed, ["id"], lease_ttl=300
        )
        assert n == 2  # v3 skipped: its lease is live
        assert _commit_versions(feed) == [2, 4]

    def test_crashed_claimant_auto_recovers(self, spark, tmp_path):
        """The round-10 done-criterion: a claimant died mid-publish
        (expired claim + unmarked partial dir debris); the NEXT
        materializer takes the lease over by itself — no
        repair_change_feed — republishes atomically, and the feed and
        reader offsets are whole."""
        src = _src(spark, tmp_path, n_commits=3)
        feed = str(tmp_path / "feed")
        os.makedirs(feed)
        with open(_feed_claim_path(feed, 3, 1), "w") as fh:
            json.dump({"owner": "dead", "ts": time.time() - 3600}, fh)
        # unmarked debris: the crash happened mid-copy into final
        debris = os.path.join(feed, "commit=3")
        os.makedirs(debris)
        with open(os.path.join(debris, "torn.parquet"), "w") as fh:
            fh.write("not parquet")
        n, _ = materialize_change_feed(
            spark, src, feed, ["id"], lease_ttl=1
        )
        assert n == 3  # all three, including the taken-over v3
        assert _feed_claims(feed)[3] == 2  # generation bumped
        assert _commit_versions(feed) == [2, 3, 4]
        assert is_published(os.path.join(feed, "commit=3"))
        assert not os.path.exists(os.path.join(debris, "torn.parquet"))
        assert _feed_ids(spark, feed) == [0, 1, 2]
        r = LakeFeedStreamReader({"path": feed})
        assert r.latestOffset() == {"version": 4}

    def test_heartbeat_renewal_blocks_takeover(self, spark, tmp_path):
        """An old claim whose HEARTBEAT is fresh is a slow-but-alive
        claimant: renewal must hold the lease."""
        src = _src(spark, tmp_path, n_commits=3)
        feed = str(tmp_path / "feed")
        os.makedirs(feed)
        claim = _feed_claim_path(feed, 3, 1)
        with open(claim, "w") as fh:
            json.dump({"owner": "slow", "ts": time.time() - 3600}, fh)
        with open(claim + ".hb", "w") as fh:
            fh.write(str(time.time()))
        n, _ = materialize_change_feed(
            spark, src, feed, ["id"], lease_ttl=60
        )
        assert n == 2  # v3 still owned: heartbeat renewed the lease
        assert _feed_claims(feed)[3] == 1

    def test_superseded_owner_fences_at_publish(self, spark, tmp_path):
        """A claimant that outlives its lease while EXTRACTING must not
        publish: the moment before its publish, a taker has already
        claimed generation+1 and published — the zombie aborts (staged
        output discarded), no torn dir, content stays exactly-once."""
        src = _src(spark, tmp_path, n_commits=2)
        feed = str(tmp_path / "feed")
        fenced: list[int] = []

        def takeover(v):
            _test_hooks.pop("feed_before_publish", None)
            fenced.append(v)
            # the zombie's lease has lapsed by now (ttl tiny); the
            # taker drains the whole backlog, including v
            time.sleep(0.3)
            n, _ = materialize_change_feed(
                spark, src, feed, ["id"], lease_ttl=0.05
            )
            assert n == 2

        _test_hooks["feed_before_publish"] = takeover
        try:
            n_zombie, _ = materialize_change_feed(
                spark, src, feed, ["id"], lease_ttl=0.05
            )
        finally:
            _test_hooks.pop("feed_before_publish", None)
        assert fenced == [2]
        # the zombie published nothing it lost: v2 was fenced away;
        # v3 raced the taker's fresh claim and was skipped outright
        assert n_zombie == 0
        assert _commit_versions(feed) == [2, 3]
        assert _feed_ids(spark, feed) == [0, 1]  # exactly once
        # no stray staging temps
        assert not [
            d for d in os.listdir(feed) if d.startswith("_tmp-")
        ]

    def test_two_leased_materializers_split_exactly_once(
        self, spark, tmp_path
    ):
        import threading

        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        results, errors = [], []

        def worker():
            try:
                results.append(
                    materialize_change_feed(
                        spark, src, feed, ["id"], lease_ttl=300
                    )
                )
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=worker) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert sum(n for n, _ in results) == 4
        assert _commit_versions(feed) == [2, 3, 4, 5]
        assert _feed_ids(spark, feed) == [0, 1, 2, 3]
