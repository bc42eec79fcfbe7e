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
