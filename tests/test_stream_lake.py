"""Exactly-once streaming ingest into the versioned lake
(``streaming.lake`` — Delta txnAppId/txnVersion idempotent writes).

Covers: replayed micro-batches are commit-level no-ops, crash-
interrupted two-half streams converge to the batch MERGE result,
within-batch key collapse is deterministic, multiple app_ids share one
table, and a randomized replay schedule (property test) always lands on
the apply-each-batch-once state.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    _read_log,
    read_version,
    table_changes,
    write_version,
)
from etl_opensky_spark.streaming.lake import (
    last_txn_batch,
    make_merge_batch,
    merge_stream_sink,
)

from .conftest import rows


def _df(spark, pairs):
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], "id int, v string"
    )


def _n_commits(base):
    return len(_read_log(base))


# --- replay is a commit-level no-op -----------------------------------------


def test_replayed_batch_skipped(spark, tmp_path):
    base = str(tmp_path / "lake")
    fn = make_merge_batch(base, ["id"], app_id="s1")
    fn(_df(spark, [(1, "a"), (2, "b")]), 0)
    assert _n_commits(base) == 1
    fn(_df(spark, [(1, "a"), (2, "b")]), 0)  # crash-replay of batch 0
    assert _n_commits(base) == 1  # no second commit, no feed double-count
    fn(_df(spark, [(2, "b2"), (3, "c")]), 1)
    assert _n_commits(base) == 2
    assert rows(read_version(spark, base)) == [
        (1, "a"), (2, "b2"), (3, "c"),
    ]
    assert last_txn_batch(base, "s1") == 1
    # the change feed saw batch 1 exactly once (v1->v2: one insert of
    # id=3, one update pair for id=2 — a replayed re-merge would have
    # added a spurious commit with zero or duplicated images)
    ch = table_changes(spark, base, ["id"], 1, 2)
    got = sorted((r["_change_type"], r["id"]) for r in ch.collect())
    assert got == [
        ("insert", 3), ("update_postimage", 2), ("update_preimage", 2),
    ]


def test_replay_preserves_change_feed_and_identity(spark, tmp_path):
    """The failure mode the cursor exists for: a bare re-MERGE of a
    replayed batch converges on CONTENT but double-counts the feed and
    (with updates) writes spurious update pre/post images."""
    base = str(tmp_path / "lake")
    fn = make_merge_batch(base, ["id"], app_id="s1")
    fn(_df(spark, [(1, "a")]), 0)
    fn(_df(spark, [(1, "a2")]), 1)
    fn(_df(spark, [(1, "a2")]), 1)  # replay of the update batch
    assert _n_commits(base) == 2
    ch = table_changes(spark, base, ["id"], 1, 2)
    got = sorted(
        (r["_change_type"], r["v"]) for r in ch.collect()
    )
    assert got == [
        ("update_postimage", "a2"),
        ("update_preimage", "a"),
    ]


def test_empty_batch_commits_nothing(spark, tmp_path):
    base = str(tmp_path / "lake")
    fn = make_merge_batch(base, ["id"], app_id="s1")
    fn(_df(spark, [(1, "a")]), 0)
    fn(_df(spark, []).filter(F.lit(False)), 1)  # idle trigger
    assert _n_commits(base) == 1
    assert last_txn_batch(base, "s1") == 0  # cursor not advanced
    fn(_df(spark, [(2, "b")]), 2)
    assert rows(read_version(spark, base)) == [(1, "a"), (2, "b")]


def test_two_streams_share_one_table(spark, tmp_path):
    """Foreign commits (another stream, a manual write) don't move this
    stream's cursor."""
    base = str(tmp_path / "lake")
    a = make_merge_batch(base, ["id"], app_id="A")
    b = make_merge_batch(base, ["id"], app_id="B")
    a(_df(spark, [(1, "a")]), 0)
    b(_df(spark, [(2, "b")]), 0)  # same batch_id, different stream
    assert _n_commits(base) == 2
    a(_df(spark, [(3, "c")]), 1)
    assert last_txn_batch(base, "A") == 1
    assert last_txn_batch(base, "B") == 0
    assert rows(read_version(spark, base)) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]


# --- within-batch key collapse ----------------------------------------------


def test_batch_dup_keys_require_order_by(spark, tmp_path):
    base = str(tmp_path / "lake")
    fn = make_merge_batch(base, ["id"], app_id="s1")
    with pytest.raises(ValueError, match="duplicate keys"):
        fn(_df(spark, [(1, "a"), (1, "b")]), 0)


def test_batch_dup_keys_last_wins_with_order_by(spark, tmp_path):
    base = str(tmp_path / "lake")
    fn = make_merge_batch(base, ["id"], app_id="s1", order_by="seq")
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")],
        "id int, seq int, v string",
    )
    fn(df, 0)
    assert rows(read_version(spark, base)) == [
        (1, 20, "new"), (2, 5, "only"),
    ]


# --- end-to-end: crash-interrupted availableNow stream ----------------------


def test_two_half_stream_matches_batch_merge(spark, tmp_path):
    """Stream a table in two halves (two availableNow runs over one
    checkpoint — a stop/restart, i.e. a crash between runs), assert the
    final table equals the one-shot batch MERGE of the same updates."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    half1 = _df(spark, [(1, "a"), (2, "b"), (3, "c")])
    half2 = _df(spark, [(2, "b2"), (4, "d")])  # update + insert
    half1.coalesce(1).write.parquet(f"{src}/batch=0")
    q = merge_stream_sink(
        spark.readStream.schema(half1.schema).parquet(f"{src}/batch=*"),
        base, ["id"], ckpt, app_id="ingest",
    )
    q.awaitTermination()
    assert rows(read_version(spark, base)) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    half2.coalesce(1).write.parquet(f"{src}/batch=1")
    q = merge_stream_sink(
        spark.readStream.schema(half1.schema).parquet(f"{src}/batch=*"),
        base, ["id"], ckpt, app_id="ingest",
    )
    q.awaitTermination()
    # oracle: the batch-MERGE result of half1 then half2
    expect = str(tmp_path / "expect")
    write_version(half1, expect)
    from etl_opensky_spark.sources.versioned import merge_versioned

    merge_versioned(spark, expect, half2, ["id"])
    assert rows(read_version(spark, base)) == rows(
        read_version(spark, expect)
    )


# --- CDC apply: stream a change feed into a replica --------------------------


def _feed(spark, rows):
    """(id, v, change_type, commit_version) feed rows."""
    return spark.createDataFrame(
        rows, "id int, v string, _change_type string, _commit_version int"
    )


def test_cdc_apply_basic(spark, tmp_path):
    from etl_opensky_spark.streaming.lake import make_cdc_apply_batch

    base = str(tmp_path / "replica")
    fn = make_cdc_apply_batch(base, ["id"], app_id="cdc")
    fn(
        _feed(spark, [
            (1, "a", "insert", 1),
            (2, "b", "insert", 1),
            (3, "c", "insert", 1),
        ]),
        0,
    )
    assert _n_commits(base) == 1
    # batch 1: update 2 (pre+post), delete 3, insert 4 — and a key
    # churned twice in-window (5 inserted at v2, updated at v3)
    fn(
        _feed(spark, [
            (2, "b", "update_preimage", 2),
            (2, "b2", "update_postimage", 2),
            (3, "c", "delete", 2),
            (4, "d", "insert", 2),
            (5, "e", "insert", 2),
            (5, "e", "update_preimage", 3),
            (5, "e2", "update_postimage", 3),
        ]),
        1,
    )
    assert _n_commits(base) == 3  # merge + delete
    assert rows(read_version(spark, base)) == [
        (1, "a"), (2, "b2"), (4, "d"), (5, "e2"),
    ]
    # full replay of the final batch: zero new commits
    fn(
        _feed(spark, [
            (2, "b", "update_preimage", 2),
            (2, "b2", "update_postimage", 2),
            (3, "c", "delete", 2),
            (4, "d", "insert", 2),
            (5, "e", "insert", 2),
            (5, "e", "update_preimage", 3),
            (5, "e2", "update_postimage", 3),
        ]),
        1,
    )
    assert _n_commits(base) == 3


def test_cdc_insert_and_delete_same_window(spark, tmp_path):
    """A key born and deleted inside one batch never reaches the
    replica, and the delete step doesn't commit an empty purge."""
    from etl_opensky_spark.streaming.lake import make_cdc_apply_batch

    base = str(tmp_path / "replica")
    fn = make_cdc_apply_batch(base, ["id"], app_id="cdc")
    fn(_feed(spark, [(1, "a", "insert", 1)]), 0)
    fn(
        _feed(spark, [
            (9, "x", "insert", 2),
            (9, "x", "delete", 3),
        ]),
        1,
    )
    assert rows(read_version(spark, base)) == [(1, "a")]
    assert _n_commits(base) == 1  # batch 1 had nothing applicable


def test_cdc_crash_between_steps_resumes_at_delete(spark, tmp_path):
    """Crash AFTER the merge commit but BEFORE the delete commit: the
    replay must skip the merge (no duplicate feed entries) and apply
    only the delete."""
    from etl_opensky_spark.sources import versioned as V
    from etl_opensky_spark.streaming.lake import make_cdc_apply_batch

    base = str(tmp_path / "replica")
    fn = make_cdc_apply_batch(base, ["id"], app_id="cdc")
    fn(
        _feed(spark, [
            (1, "a", "insert", 1), (2, "b", "insert", 1),
        ]),
        0,
    )
    batch1 = [
        (1, "a2", "update_postimage", 2),
        (2, "b", "delete", 2),
    ]
    calls = {"n": 0}

    def crash_before_second_commit():
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("injected: crashed before the delete commit")

    V._test_hooks["before_commit"] = crash_before_second_commit
    try:
        with pytest.raises(OSError, match="injected"):
            fn(_feed(spark, batch1), 1)
    finally:
        V._test_hooks.clear()
    # merge landed, delete didn't
    assert rows(read_version(spark, base)) == [(1, "a2"), (2, "b")]
    n_after_crash = _n_commits(base)
    fn(_feed(spark, batch1), 1)  # checkpoint replays batch 1
    assert rows(read_version(spark, base)) == [(1, "a2")]
    # exactly ONE new commit (the delete) — the merge was not replayed
    assert _n_commits(base) == n_after_crash + 1
    ch = table_changes(spark, base, ["id"], 1, _n_commits(base))
    assert (
        ch.filter(F.col("_change_type") == "update_postimage").count() == 1
    )


def test_cdc_stream_end_to_end_replication(spark, tmp_path):
    """The full loop: source lake -> materialized change feed (file
    stream) -> cdc_stream_sink replica, across two stream runs with a
    delete-then-reinsert that exercises file-scoped tombstones."""
    from etl_opensky_spark.operators.replication import replica_in_sync
    from etl_opensky_spark.sources.versioned import (
        materialize_change_feed,
        merge_versioned,
        purge_versioned_mor,
    )
    from etl_opensky_spark.streaming.lake import cdc_stream_sink

    src = str(tmp_path / "src")
    feed = str(tmp_path / "feed")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    # v1 is empty: a change feed carries commits AFTER the first
    # version, so a feed-replicated table starts from an empty seed
    # and every data row flows through the feed
    write_version(_df(spark, []), src)
    merge_versioned(
        spark, src, _df(spark, [(1, "a"), (2, "b"), (3, "c")]), ["id"]
    )
    merge_versioned(
        spark, src, _df(spark, [(2, "b2"), (4, "d")]), ["id"]
    )
    materialize_change_feed(spark, src, feed, ["id"])
    schema = spark.read.parquet(feed).schema

    def run():
        q = cdc_stream_sink(
            spark.readStream.schema(schema)
            .option("basePath", feed)
            .parquet(feed + "/commit=*"),
            dst,
            ["id"],
            ckpt,
            app_id="repl",
        )
        q.awaitTermination()

    run()
    assert replica_in_sync(spark, src, dst, ["id"])
    # second window: delete 2, re-insert 2 with new value, insert 5
    purge_versioned_mor(
        spark, src, spark.createDataFrame([(2,)], "id int"), ["id"]
    )
    merge_versioned(
        spark, src, _df(spark, [(2, "b3"), (5, "e")]), ["id"]
    )
    materialize_change_feed(spark, src, feed, ["id"])
    run()
    assert replica_in_sync(spark, src, dst, ["id"])
    assert rows(read_version(spark, dst)) == [
        (1, "a"), (2, "b3"), (3, "c"), (4, "d"), (5, "e"),
    ]


# --- property: any replay schedule converges ---------------------------------


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_replay_schedule_converges(spark, tmp_path_factory, data):
    """For a random sequence of batches with random crash-replays
    interleaved (each batch delivered 1-3 times, in order, as
    at-least-once foreachBatch does), the lake equals the apply-once
    state and history holds exactly one commit per non-empty batch."""
    tmp = tmp_path_factory.mktemp("replay")
    base = str(tmp / "lake")
    n_batches = data.draw(st.integers(2, 4), label="n_batches")
    batches = [
        data.draw(
            st.lists(
                st.tuples(st.integers(1, 6), st.text("ab", max_size=2)),
                max_size=4,
                unique_by=lambda t: t[0],
            ),
            label=f"batch{i}",
        )
        for i in range(n_batches)
    ]
    fn = make_merge_batch(base, ["id"], app_id="p")
    for i, b in enumerate(batches):
        reps = data.draw(st.integers(1, 3), label=f"reps{i}")
        for _ in range(reps):
            fn(_df(spark, b), i)
    # apply-once expectation, driver-side
    state: dict[int, str] = {}
    for b in batches:
        state.update(dict(b))
    if state:
        assert rows(read_version(spark, base)) == sorted(state.items())
    assert _n_commits(base) == sum(1 for b in batches if b)
