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
