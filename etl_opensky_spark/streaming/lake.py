"""Exactly-once Structured Streaming ingest into the versioned lake.

The reference's core invariant is idempotent re-runnable ingest
(reference: src/jobs/extract_flights.py:80-92 — check-then-append per
daily partition).  ``append_missing_sink`` (streaming/daily.py) is the
plain-parquet streaming form; this module is the LAKE form: each
micro-batch lands as one keyed ``merge_versioned`` commit, made
exactly-once by a per-stream transaction cursor riding the commit's
``user_meta`` — Delta's ``txnAppId``/``txnVersion`` idempotent-writes
pattern, and the same cursor idiom as ``operators/replication.py``.

Why the cursor is needed at all: Structured Streaming's ``foreachBatch``
is at-least-once — after a crash between the sink action and the
checkpoint commit, the SAME ``batch_id`` is replayed.  A bare MERGE of
the same post-images would converge for upserts, but any batch that
INSERTS (every ingest batch) would double-commit history: the table
content converges, yet the change feed / identity mints / replicas see
the batch twice.  The cursor makes the replay a NO-OP commit-level:

- crash BEFORE the lake commit  -> cursor un-advanced -> replay merges
- crash AFTER the lake commit   -> cursor at batch_id -> replay skips

The cursor scan is O(log tail): commits are scanned newest-first and the
first ``stream_txn`` entry for the app wins (foreign commits on the
table — a manual merge, compaction, a SECOND stream with a different
``app_id`` — simply don't move it, so multiple streams can share one
target table).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    _read_log,
    merge_with_retry,
    purge_versioned_mor,
    read_version,
)

_TXN_KEY = "stream_txn"


def _txn_meta(base: str, app_id: str) -> dict | None:
    """Newest ``stream_txn`` commit metadata for ``app_id`` at ``base``
    (or None).  Foreign commits — other streams, manual merges,
    compaction — are skipped, so streams compose on one table."""
    for entry in reversed(_read_log(base)):
        meta = (entry.get("user_meta") or {}).get(_TXN_KEY)
        if meta and meta.get("app_id") == app_id:
            return meta
    return None


def last_txn_batch(base: str, app_id: str) -> int:
    """Newest committed micro-batch id for ``app_id`` at ``base``, or
    ``-1`` if the stream has never committed there."""
    meta = _txn_meta(base, app_id)
    return int(meta["batch_id"]) if meta else -1


def make_merge_batch(
    base: str,
    keys: Sequence[str],
    app_id: str,
    partition_by: Sequence[str] = (),
    order_by: str | None = None,
    **merge_kwargs,
) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` body, exposed for direct testing (replay =
    calling it twice with the same ``batch_id``).

    Within-batch key collapse: ``merge_versioned`` requires key-unique
    updates, but one micro-batch can carry several versions of a key
    (a burst of updates for the same id).  With ``order_by`` the LAST
    version wins deterministically (max ``order_by`` per key, ties
    broken by the remaining columns so replays pick the same row);
    without it, duplicate keys in one batch are an error — silent
    arbitrary picks are how streams corrupt tables.
    """
    keys = list(keys)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if int(batch_id) <= last_txn_batch(base, app_id):
            return  # replayed micro-batch: the lake already has it
        spark = batch_df.sparkSession
        upd = batch_df
        if order_by is not None:
            others = [
                c for c in upd.columns if c not in keys and c != order_by
            ]
            w = Window.partitionBy(*keys).orderBy(
                F.col(order_by).desc(),
                *[F.col(c).desc_nulls_last() for c in others],
            )
            upd = (
                upd.withColumn("_sm_rn__", F.row_number().over(w))
                .filter(F.col("_sm_rn__") == 1)
                .drop("_sm_rn__")
            )
        if upd.isEmpty():
            # nothing to commit; do NOT advance the cursor — replaying
            # an empty batch is free, and an empty commit would bloat
            # history one snapshot per idle trigger
            return
        merge_with_retry(
            spark,
            base,
            upd,
            keys=keys,
            partition_by=partition_by,
            user_meta={
                _TXN_KEY: {"app_id": app_id, "batch_id": int(batch_id)}
            },
            **merge_kwargs,
        )

    return write_batch


#: change-feed row types that carry a post-state to upsert
CDC_UPSERT_TYPES = ("insert", "update_postimage")


def make_cdc_apply_batch(
    base: str,
    keys: Sequence[str],
    app_id: str,
    partition_by: Sequence[str] = (),
    type_col: str = "_change_type",
    version_col: str = "_commit_version",
    **merge_kwargs,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body applying CHANGE-FEED rows (the
    ``table_changes`` /  ``materialize_change_feed`` surface: insert /
    update_preimage / update_postimage / delete) to a versioned replica
    — the streaming form of ``operators.replication``, with the txn
    cursor upgraded to PER-STEP granularity.

    A CDC batch can need TWO lake commits (a keyed MERGE for upserts,
    a MOR DELETE for deletes).  A crash between them must not replay
    the merge: each commit's cursor records ``(batch_id, step, final)``
    so the replay resumes at the first un-committed step — upserts
    merge once, deletes purge once, history and the replica's own
    change feed see each change exactly once.

    Within-batch reduction mirrors ``replicate_versioned``: the newest
    commit wins per key (``version_col`` descending, post-image over
    pre-image), a key updated five times then deleted is just deleted,
    and deletes are left-semi-restricted to keys the replica holds.
    Pre-image rows are informational only.  A key deleted then
    re-inserted in LATER batches stays correct because MOR tombstones
    are file-scoped (deletion-vector semantics).
    """
    keys = list(keys)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        meta = _txn_meta(base, app_id)
        committed_step = 0
        if meta is not None:
            if int(meta["batch_id"]) > int(batch_id):
                return  # stale replay of an older, fully-applied batch
            if int(meta["batch_id"]) == int(batch_id):
                if meta.get("final", True):
                    return  # fully-applied replay
                committed_step = int(meta.get("step", 0))
        spark = batch_df.sparkSession
        w = Window.partitionBy(*keys).orderBy(
            F.col(version_col).desc(),
            F.when(F.col(type_col) == "update_preimage", 1)
            .otherwise(0)
            .asc(),
        )
        final = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint()  # both branches + the type census consume it
        )
        drop_cols = [
            c
            for c in (type_col, version_col, "commit")
            if c in final.columns
        ]
        # ONE aggregate over the pinned batch decides which steps exist
        # (round 11, guide §1.2): the previous shape paid an isEmpty
        # job per branch plus an unconditional semi-join+checkpoint for
        # deletes even when the batch carried none — three Spark jobs
        # of pure overhead on every delete-free micro-batch (the common
        # case for ingest feeds)
        census = final.agg(
            F.sum(
                F.when(F.col(type_col).isin(*CDC_UPSERT_TYPES), 1).otherwise(0)
            ).alias("_n_up"),
            F.sum(
                F.when(F.col(type_col) == "delete", 1).otherwise(0)
            ).alias("_n_del"),
        ).first()
        upserts = final.filter(F.col(type_col).isin(*CDC_UPSERT_TYPES)).drop(
            *drop_cols
        )
        steps: list[tuple[str, DataFrame]] = []
        if census["_n_up"]:
            steps.append(("merge", upserts))
        if census["_n_del"]:
            # a delete only needs a commit when its key WILL exist on
            # the replica once the merge step lands: semi-join against
            # existing keys UNION this batch's upserts, and PIN it
            # (localCheckpoint) before any commit — lazily evaluating
            # against the tip after the merge would be
            # replay-order-dependent, and evaluating against only
            # pre-merge keys drops deletes for keys this same batch
            # inserts (insert+delete-of-sibling in one feed window)
            existing = (
                read_version(spark, base).select(*keys)
                if _read_log(base)
                else upserts.select(*keys).filter(F.lit(False))
            )
            deletes = (
                final.filter(F.col(type_col) == "delete")
                .select(*keys)
                .join(
                    existing.unionByName(upserts.select(*keys)),
                    on=keys,
                    how="left_semi",
                )
                .localCheckpoint()
            )
            if not deletes.isEmpty():
                steps.append(("delete", deletes))
        if not steps:
            return  # nothing to commit; replaying is free
        for i, (kind, df) in enumerate(steps, start=1):
            if i <= committed_step:
                continue  # this step's commit survived the crash
            step_meta = {
                _TXN_KEY: {
                    "app_id": app_id,
                    "batch_id": int(batch_id),
                    "step": i,
                    "final": i == len(steps),
                }
            }
            if kind == "merge":
                merge_with_retry(
                    spark,
                    base,
                    df,
                    keys=keys,
                    partition_by=partition_by,
                    user_meta=step_meta,
                    **merge_kwargs,
                )
            else:
                purge_versioned_mor(
                    spark, base, df, keys, user_meta=step_meta
                )

    return apply_batch


def cdc_stream_sink(
    stream: DataFrame,
    base: str,
    keys: Sequence[str],
    checkpoint_dir: str,
    app_id: str,
    partition_by: Sequence[str] = (),
    available_now: bool = True,
    **merge_kwargs,
):
    """Tail a change feed (e.g. ``readStream`` over a
    ``materialize_change_feed`` directory) and apply it to the replica
    at ``base`` exactly once — streaming table replication."""
    writer = stream.writeStream.foreachBatch(
        make_cdc_apply_batch(
            base, keys, app_id, partition_by=partition_by, **merge_kwargs
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_stream_sink(
    stream: DataFrame,
    base: str,
    keys: Sequence[str],
    checkpoint_dir: str,
    app_id: str,
    partition_by: Sequence[str] = (),
    order_by: str | None = None,
    available_now: bool = True,
    **merge_kwargs,
):
    """Start a Structured Streaming query that upserts every micro-batch
    into the versioned table at ``base`` exactly once.

    ``app_id`` names the (stream, checkpoint) pair — reuse it with the
    SAME checkpoint only.  Wiping the checkpoint while keeping the
    ``app_id`` makes Spark restart batch ids at 0, which the cursor
    would then skip (the Delta ``txnAppId`` contract is identical: the
    checkpoint and the transaction identity live and die together).
    """
    writer = stream.writeStream.foreachBatch(
        make_merge_batch(
            base,
            keys,
            app_id,
            partition_by=partition_by,
            order_by=order_by,
            **merge_kwargs,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
