"""Surrogate-key operators (SURVEY §2.7: W1, §2.11: X5).

The reference mints dim ids with ``row_number`` over a GLOBAL (unpartitioned)
window (reference: src/jobs/load_dim_airports.py:50,
load_dim_aircrafts.py:118-122) — a single-task bottleneck Spark itself warns
about.  ``surrogate_key`` keeps that mode for bit-compatibility but defaults
to a deterministic ``xxhash64`` of the natural key: fully parallel, stable
under upstream reordering, collision probability ~n²/2⁶⁵ (negligible below
~10⁹ dim rows; use mode="row_number" or widen the key if that ever matters).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def surrogate_key(
    df: DataFrame,
    natural_key: Sequence[str],
    out_col: str,
    mode: str = "hash",
) -> DataFrame:
    """Add a surrogate id column derived from the natural key.

    mode="hash"        -> xxhash64(natural key), parallel, deterministic.
    mode="row_number"  -> dense 1..N by global sort on the natural key
                          (reference-compatible; single-partition shuffle —
                          only for small dims).
    """
    if mode == "hash":
        return df.withColumn(out_col, F.xxhash64(*natural_key))
    if mode == "row_number":
        window = Window.orderBy(*natural_key)
        return df.withColumn(out_col, F.row_number().over(window).cast("long"))
    raise ValueError(f"unknown surrogate key mode: {mode!r}")


def date_dim_id(col: Column) -> Column:
    """X5 — smart date key y*10000 + m*100 + d from a date/timestamp column
    (reference: src/jobs/load_fct_flights.py:49-52, load_dim_dates.py:73-77)."""
    return (
        (F.year(col) * F.lit(10000) + F.month(col) * F.lit(100) + F.dayofmonth(col))
        .cast("int")
    )


def assign_identity(df: DataFrame, start: int, out_col: str) -> DataFrame:
    """Dense identity assignment: every row gets a UNIQUE id and the ids
    are EXACTLY the range ``[start, start + count(df))`` — Delta's
    ``GENERATED ALWAYS AS IDENTITY`` contract (uniqueness + a provable
    range; WHICH row gets which id depends on physical partitioning, a
    promise Delta doesn't make either — use ``surrogate_key`` when the
    id must be a function of the data).

    Zero shuffles: the frame is checkpointed to pin its partitioning,
    per-partition counts come back as driver scalars (one cheap agg),
    and the id is ``partition_offset + local_counter`` where the local
    counter is decoded from ``monotonically_increasing_id`` (counter in
    the low 33 bits, partition in the high bits — contiguous from 0
    within each partition by construction).  The lake integration
    (``write_version(identity_col=)``, ``copy_into``,
    ``merge_versioned``) persists the high-water mark in the commit log
    so every append continues where the last one stopped."""
    pinned = df.localCheckpoint(eager=False)
    counts = (
        pinned.groupBy(F.spark_partition_id().alias("_pid"))
        .count()
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = start
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["count"]
    if not offsets:
        return pinned.withColumn(out_col, F.lit(None).cast("long"))
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    mid = F.monotonically_increasing_id()
    local = mid.bitwiseAND(F.lit((1 << 33) - 1))
    return pinned.withColumn(
        out_col,
        (off_map[F.spark_partition_id()] + local).cast("long"),
    )
