"""Interval sweep-line analytics: concurrency of open intervals.

The reference's fact rows are intervals in disguise — a flight is
``[firstSeen, lastSeen]`` (``extract_flights.py:45-46``) — and the
classic warehouse question over them is "how many were airborne at
once?".  The naive answer self-joins intervals on overlap (O(n²) pairs
on busy days); the scale shape is the **sweep line**:

1. every interval emits two deltas — ``+1`` at its start date, ``-1``
   the day after its end date;
2. deltas are summed per date (map-side combinable; the result is
   bounded by the number of DISTINCT dates in the data, not the row
   count — a few thousand rows for decades of days);
3. the running (prefix) sum over that bounded date table is the exact
   concurrency level on each change date.

Step 3 uses a single-partition window, which is fine *because the
input is the bounded distinct-date table* — the same "window over
bounded state" rule as ``operators/aggregates.equal_frequency_bins``'s
offset table.  Concurrency between change dates is constant, so max /
min per calendar bucket over change dates is exact for every bucket
that contains at least one change date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["interval_concurrency"]


def interval_concurrency(
    df: DataFrame, start_col: str, end_col: str
) -> DataFrame:
    """Sweep-line concurrency at date grain: returns one row per
    distinct change date ``(d, delta, concurrent)`` where ``concurrent``
    is the number of intervals ``[start, end]`` (inclusive) open on
    ``d``.  Timestamps are truncated to dates; intervals with
    ``end < start`` contribute their deltas as-is (caller's contract to
    pre-filter if that is invalid).
    """
    starts = df.select(
        F.to_date(F.col(start_col)).alias("d"), F.lit(1).alias("delta")
    )
    ends = df.select(
        F.date_add(F.to_date(F.col(end_col)), 1).alias("d"),
        F.lit(-1).alias("delta"),
    )
    deltas = (
        starts.unionAll(ends)
        .groupBy("d")
        .agg(F.sum("delta").alias("delta"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return deltas.withColumn(
        "concurrent", F.sum("delta").over(w).cast("long")
    )
