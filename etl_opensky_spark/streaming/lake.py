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
)

_TXN_KEY = "stream_txn"


def last_txn_batch(base: str, app_id: str) -> int:
    """Newest committed micro-batch id for ``app_id`` at ``base``, or
    ``-1`` if the stream has never committed there."""
    for entry in reversed(_read_log(base)):
        meta = (entry.get("user_meta") or {}).get(_TXN_KEY)
        if meta and meta.get("app_id") == app_id:
            return int(meta["batch_id"])
    return -1


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
