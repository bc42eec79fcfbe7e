"""Round-11 feed hardening (VERDICT r10 next-round #1/#3/#5, ADVICE
r10 #2):

- **Mode exclusivity**: one lock implementation per feed.  The first
  claimed-mode materializer locks the feed via a conditional PUT of
  ``_FEED_MODE``; bare-then-leased, leased-then-bare, and
  single-after-claimed all refuse BY NAME instead of silently letting
  one writer slip past the other mode's claims.
- **Store-authoritative lease clocks**: expiry is measured from
  ``fs.mtime``/``fs.now`` (one clock — the store's), never from the
  wall-clock timestamp another host stamped into the claim payload.
- **Vacuum/lease interaction**: vacuum leaves claim files whose lease
  still shows life (within ``claim_grace`` on the store clock) so a
  live owner below the threshold stays visible to fence probes.
- **repair_change_feed refuses leased feeds**: deleting a live owner's
  generation claim would reopen the two-writer publish race.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from etl_opensky_spark.sources.fs import LakeFS, set_fs
from etl_opensky_spark.sources.lakefeed import _commit_versions
from etl_opensky_spark.sources.versioned import (
    _feed_claim_path,
    _feed_claims,
    describe_change_feed,
    feed_claim_mode,
    materialize_change_feed,
    merge_versioned,
    repair_change_feed,
    vacuum_change_feed,
    write_version,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], "id int, v string"
    )


def _src(spark, tmp_path, n_commits=3):
    src = str(tmp_path / "src")
    write_version(_df(spark, []), src)
    for i in range(n_commits):
        merge_versioned(spark, src, _df(spark, [(i, f"v{i}")]), ["id"])
    return src


class TestFeedModeExclusivity:
    def test_bare_then_leased_refuses(self, spark, tmp_path):
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        materialize_change_feed(
            spark, src, feed, ["id"], multi_writer=True
        )
        assert feed_claim_mode(feed) == "bare"
        with pytest.raises(ValueError, match="locked to 'bare'"):
            materialize_change_feed(
                spark, src, feed, ["id"], lease_ttl=60
            )

    def test_leased_then_bare_refuses(self, spark, tmp_path):
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        materialize_change_feed(
            spark, src, feed, ["id"], lease_ttl=60
        )
        assert feed_claim_mode(feed) == "lease"
        with pytest.raises(ValueError, match="locked to 'lease'"):
            materialize_change_feed(
                spark, src, feed, ["id"], multi_writer=True
            )

    def test_single_after_claimed_refuses(self, spark, tmp_path):
        """The single-writer default probes NO claims at all — running
        it against a claimed feed is the same slip-past hazard."""
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        materialize_change_feed(
            spark, src, feed, ["id"], lease_ttl=60
        )
        with pytest.raises(ValueError, match="'single'"):
            materialize_change_feed(spark, src, feed, ["id"])

    def test_single_stays_unmarked_and_upgrades(self, spark, tmp_path):
        """A single-writer feed publishes no marker; the first
        claimed-mode call locks it (a one-way upgrade)."""
        src = _src(spark, tmp_path, n_commits=2)
        feed = str(tmp_path / "feed")
        materialize_change_feed(spark, src, feed, ["id"])
        assert feed_claim_mode(feed) is None
        merge_versioned(
            spark, src, _df(spark, [(9, "z")]), ["id"]
        )
        n, _ = materialize_change_feed(
            spark, src, feed, ["id"], multi_writer=True
        )
        assert n == 1
        assert feed_claim_mode(feed) == "bare"
        with pytest.raises(ValueError, match="'single'"):
            materialize_change_feed(spark, src, feed, ["id"])

    def test_same_mode_reruns_fine(self, spark, tmp_path):
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        materialize_change_feed(
            spark, src, feed, ["id"], lease_ttl=300
        )
        assert materialize_change_feed(
            spark, src, feed, ["id"], lease_ttl=300
        ) == (0, 0)
        assert _commit_versions(feed) == [2, 3, 4]

    def test_describe_reports_mode(self, spark, tmp_path):
        src = _src(spark, tmp_path, n_commits=2)
        feed = str(tmp_path / "feed")
        materialize_change_feed(
            spark, src, feed, ["id"], multi_writer=True
        )
        assert describe_change_feed(feed)["mode"] == "bare"

    def test_vacuum_preserves_mode_marker(self, spark, tmp_path):
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        materialize_change_feed(
            spark, src, feed, ["id"], multi_writer=True
        )
        vacuum_change_feed(feed, keep_after=3)
        assert feed_claim_mode(feed) == "bare"


class TestStoreClockLeases:
    def test_future_stamped_ts_cannot_extend_lease(
        self, spark, tmp_path
    ):
        """VERDICT r10 #3 done-criterion: a claimant whose wall clock
        runs 10 minutes fast stamps a future ``ts`` into its claim —
        takeover must still happen ``lease_ttl`` after the last
        heartbeat WRITE (store mtime), not ``ts + lease_ttl``."""
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        os.makedirs(feed)
        claim = _feed_claim_path(feed, 3, 1)
        with open(claim, "w") as fh:
            json.dump({"owner": "fast-clock", "ts": time.time() + 600}, fh)
        with open(claim + ".hb", "w") as fh:
            fh.write("x")
        # the lease lapsed on the STORE clock: last heartbeat write
        # (mtime) is 120 s old, ttl is 60 s — the future payload ts
        # must not keep the lease alive
        old = time.time() - 120
        os.utime(claim, (old, old))
        os.utime(claim + ".hb", (old, old))
        n, _ = materialize_change_feed(
            spark, src, feed, ["id"], lease_ttl=60
        )
        assert n == 3  # v3 taken over despite ts 10 min in the future
        assert _feed_claims(feed)[3] == 2
        assert _commit_versions(feed) == [2, 3, 4]

    def test_fresh_heartbeat_holds_despite_future_ts(
        self, spark, tmp_path
    ):
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        os.makedirs(feed)
        claim = _feed_claim_path(feed, 3, 1)
        with open(claim, "w") as fh:
            json.dump({"owner": "fast-clock", "ts": time.time() + 600}, fh)
        with open(claim + ".hb", "w") as fh:
            fh.write("x")
        n, _ = materialize_change_feed(
            spark, src, feed, ["id"], lease_ttl=60
        )
        assert n == 2  # v3 skipped: its heartbeat is store-fresh
        assert _feed_claims(feed)[3] == 1

    def test_expiry_uses_fs_seam_clock(self, spark, tmp_path):
        """Injecting a backend whose store clock runs ahead expires a
        just-written lease — proof the protocol reads ``fs.now`` /
        ``fs.mtime``, not ``time.time`` / local stat directly."""
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        os.makedirs(feed)
        claim = _feed_claim_path(feed, 3, 1)
        with open(claim, "w") as fh:
            json.dump({"owner": "other", "ts": time.time()}, fh)
        with open(claim + ".hb", "w") as fh:
            fh.write("x")

        class StoreAheadFS(LakeFS):
            def now(self) -> float:  # the store's clock, 10 min ahead
                return time.time() + 600

        prev = set_fs(StoreAheadFS())
        try:
            n, _ = materialize_change_feed(
                spark, src, feed, ["id"], lease_ttl=60
            )
        finally:
            set_fs(prev)
        assert n == 3  # lease lapsed on the injected store clock
        assert _feed_claims(feed)[3] == 2


class TestVacuumLeaseInteraction:
    def _leased_feed(self, spark, tmp_path):
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        materialize_change_feed(
            spark, src, feed, ["id"], lease_ttl=300
        )
        return src, feed

    def test_vacuum_spares_live_claims(self, spark, tmp_path):
        """A claim below the threshold whose heartbeat is store-fresh
        survives the vacuum: deleting it would hide the owner from a
        takeover's max-gen+1 fence probe (VERDICT r10 wrong #2)."""
        _src_, feed = self._leased_feed(spark, tmp_path)
        claim = _feed_claim_path(feed, 2, 1)
        assert os.path.exists(claim)
        dropped = vacuum_change_feed(feed, keep_after=3)
        assert dropped == [2, 3]
        assert os.path.exists(claim)  # just published: lease shows life
        assert os.path.exists(claim + ".hb")

    def test_vacuum_removes_lapsed_claims(self, spark, tmp_path):
        _src_, feed = self._leased_feed(spark, tmp_path)
        old = time.time() - 3600
        for v in (2, 3):
            c = _feed_claim_path(feed, v, 1)
            os.utime(c, (old, old))
            os.utime(c + ".hb", (old, old))
        vacuum_change_feed(feed, keep_after=3, claim_grace=900)
        assert not os.path.exists(_feed_claim_path(feed, 2, 1))
        assert not os.path.exists(_feed_claim_path(feed, 3, 1) + ".hb")
        # above the threshold: untouched regardless of age
        assert os.path.exists(_feed_claim_path(feed, 4, 1))

    def test_claim_grace_zero_restores_unconditional(
        self, spark, tmp_path
    ):
        _src_, feed = self._leased_feed(spark, tmp_path)
        vacuum_change_feed(feed, keep_after=3, claim_grace=0)
        assert not os.path.exists(_feed_claim_path(feed, 2, 1))
        assert not os.path.exists(_feed_claim_path(feed, 3, 1))


class TestRepairRefusesLeases:
    def test_marker_locked_lease_feed(self, spark, tmp_path):
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        materialize_change_feed(
            spark, src, feed, ["id"], lease_ttl=300
        )
        with pytest.raises(ValueError, match="leased"):
            repair_change_feed(spark, src, feed, ["id"])

    def test_markerless_generational_claims(self, spark, tmp_path):
        """A legacy (pre-marker) feed that carries generation claims is
        a leased feed too — repair must not delete a live owner's
        claim (ADVICE r10 #2)."""
        src = _src(spark, tmp_path)
        feed = str(tmp_path / "feed")
        os.makedirs(feed)
        with open(_feed_claim_path(feed, 3, 2), "w") as fh:
            json.dump({"owner": "live", "ts": time.time()}, fh)
        with pytest.raises(ValueError, match="generational claims"):
            repair_change_feed(spark, src, feed, ["id"])

    def test_repair_keeps_single_feed_unmarked(self, spark, tmp_path):
        """repair on a pristine single-writer feed must not lock it to
        bare mode (that would refuse every later single-writer run)."""
        src = _src(spark, tmp_path, n_commits=2)
        feed = str(tmp_path / "feed")
        materialize_change_feed(spark, src, feed, ["id"])
        assert repair_change_feed(spark, src, feed, ["id"]) == (0, 0)
        assert feed_claim_mode(feed) is None
        merge_versioned(spark, src, _df(spark, [(7, "y")]), ["id"])
        n, _ = materialize_change_feed(spark, src, feed, ["id"])
        assert n == 1  # single-writer keeps working after a repair
