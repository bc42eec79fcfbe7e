"""Datetime column functions (SURVEY §2.11: X1-X5).

Session timezone must be UTC (session.py pins it) — epoch conversions and
y/m/d extraction are timezone-sensitive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_to_timestamp(col: Column) -> Column:
    """X1 — epoch seconds (long) -> timestamp
    (reference: src/jobs/extract_flights.py:53-56)."""
    return F.timestamp_seconds(col)


def ymd_columns(ts: Column) -> dict[str, Column]:
    """X2 — partition columns from an event timestamp, with the reference's
    narrow types (reference: src/jobs/extract_flights.py:59-61,
    src/config/config_services.py:72-77)."""
    return {
        "flight_year": F.year(ts).cast("short"),
        "flight_month": F.month(ts).cast("byte"),
        "flight_day": F.dayofmonth(ts).cast("byte"),
    }


def calendar_attrs(date_col: Column) -> dict[str, Column]:
    """X3 — dim_dates attribute set (reference: src/jobs/load_dim_dates.py:79-83).

    ``week_of_year`` is ISO week (Spark/Hive WEEKOFYEAR); ``day_of_week``
    is 1=Sunday..7=Saturday (Spark/Hive DAYOFWEEK).
    """
    return {
        "year": F.year(date_col).cast("short"),
        "month": F.month(date_col).cast("byte"),
        "day": F.dayofmonth(date_col).cast("byte"),
        "week_of_year": F.weekofyear(date_col).cast("byte"),
        "day_of_week": F.dayofweek(date_col).cast("byte"),
    }


def business_days_between(start: Column, end: Column) -> Column:
    """Weekdays (Mon–Fri) in the half-open date range ``(start, end]``,
    CLOSED FORM — no per-row date explosion, pure integer arithmetic,
    so it is exact and engine-portable.

    Portability note (the reason this exists): engines disagree on
    weekday numbering — Spark ``dayofweek`` is 1=Sunday, DuckDB
    ``dayofweek`` is 0=Sunday, ISO ``weekday`` differs again.  This
    formula never asks the engine for a weekday: it counts from the
    epoch (1970-01-01 was a THURSDAY), with ``g(n)`` = weekdays among
    epoch days [0, n) = ``5·(n div 7) + c[n mod 7]`` where
    ``c = [0,1,2,2,2,3,4]`` (Thu,Fri,Sat,Sun,Mon,Tue,Wed prefix
    counts).  Result = g(end_days+1) − g(start_days+1).

    Pre-epoch safety: the decomposition ``n = 7·q + r`` must use FLOOR
    division and FLOOR mod (r ∈ [0,7)) or every branch misses for
    negative ``n`` — Spark's ``%`` is truncated (sign of dividend), so
    ``pmod`` is mandatory here, and ``q`` is derived as ``(n − r) / 7``
    which is exact integer arithmetic under floor-mod.
    """
    epoch = F.lit("1970-01-01").cast("date")

    def g(days: Column) -> Column:
        n = (days + 1).cast("long")  # [0, n) covers through the given day
        r = F.pmod(n, F.lit(7))  # floor-mod: r in [0,7) even for n < 0
        c = (
            F.when(r == 1, 1)
            .when(r == 2, 2)
            .when(r == 3, 2)
            .when(r == 4, 2)
            .when(r == 5, 3)
            .when(r == 6, 4)
            .otherwise(0)
        )
        return 5 * ((n - r) / 7).cast("long") + c

    return (
        g(F.datediff(F.to_date(end), epoch))
        - g(F.datediff(F.to_date(start), epoch))
    ).cast("long")
