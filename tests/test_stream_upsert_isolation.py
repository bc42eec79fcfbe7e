"""Concurrent reader vs STREAMING upsert (VERDICT r4 #7, the q111/q205
shape): while a Structured Streaming query foreachBatch-merges
micro-batches into a manifest-committed versioned lake, a reader thread
polls the lake continuously.  Every observed snapshot must be WHOLE —
exactly the contents of some prefix of committed merges, never a partial
partition, never a torn file set, never an error."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    merge_versioned,
    read_version,
)

N_BATCHES = 8
ROWS_PER_BATCH = 100


def test_reader_never_observes_partial_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    # N_BATCHES files, each 100 unique keys; partition key y spreads every
    # batch across 3 partitions so a torn per-partition commit WOULD split
    # a batch if the protocol allowed one
    for b in range(N_BATCHES):
        spark.createDataFrame(
            [(b * ROWS_PER_BATCH + i, b, (i % 3)) for i in range(ROWS_PER_BATCH)],
            "k long, batch int, y int",
        ).coalesce(1).write.mode("append").parquet(landing)

    observed: list[tuple[int, int]] = []  # (n_rows, n_distinct_keys)
    errors: list[str] = []
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            try:
                snap = read_version(spark, lake)
                row = snap.agg(
                    F.count("*").alias("n"),
                    F.count_distinct("k").alias("nk"),
                ).first()
                observed.append((row["n"], row["nk"]))
            except ValueError:
                pass  # no committed version yet — fine
            except Exception as exc:  # noqa: BLE001 — the assertion target
                errors.append(f"{type(exc).__name__}: {exc}")

    stream = (
        spark.readStream.schema("k long, batch int, y int")
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )

    def merge_batch(batch_df, batch_id):
        merge_versioned(
            spark, lake, batch_df, ["k"], ["y"],
            keys_are_partition_stable=True,
        )

    reader = threading.Thread(target=poll)
    reader.start()
    try:
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        stop.set()
        reader.join()

    assert not errors, errors[:3]
    assert observed, "reader never got a snapshot in"
    for n, nk in observed:
        # whole-batch multiples only: a torn snapshot would show a
        # count that is not a multiple of the batch size, or duplicated
        # keys from a half-replaced partition
        assert n % ROWS_PER_BATCH == 0, f"partial batch visible: {n} rows"
        assert n == nk, f"duplicate keys visible: {n} rows, {nk} keys"
    # monotone progress: snapshots never go backwards
    counts = [n for n, _ in observed]
    assert counts == sorted(counts)
    # final state = all batches exactly once
    final = read_version(spark, lake)
    assert final.count() == N_BATCHES * ROWS_PER_BATCH
    assert final.select("k").distinct().count() == N_BATCHES * ROWS_PER_BATCH
