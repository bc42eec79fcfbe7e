"""dim_dates — calendar dimension (reference: src/jobs/load_dim_dates.py).

Spine 2018-01-01..2028-01-01 in the reference DAG
(src/dags/flights_daily.py:130-135).  ``build_dim_dates`` is the pure
generator; ``load_dim_dates`` adds the reference's incremental contract:
count-equality fast path, then EXCEPT-append of missing rows.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_opensky_spark.functions.datetime import calendar_attrs
from etl_opensky_spark.operators.keys import date_dim_id
from etl_opensky_spark.operators.reshape import date_spine
from etl_opensky_spark.operators.sets import append_missing

DIM_DATES_COLUMNS = [
    "date_dim_id",
    "date_date",
    "year",
    "month",
    "day",
    "week_of_year",
    "day_of_week",
]


def build_dim_dates(spark: SparkSession, start_date: str, end_date: str) -> DataFrame:
    """One row per calendar day with smart key + date attributes
    (semantics of reference populate_date_df, src/jobs/load_dim_dates.py:45-87;
    week_of_year = ISO week, day_of_week 1=Sunday)."""
    spine = date_spine(spark, start_date, end_date, out_col="date_date")
    attrs = calendar_attrs(F.col("date_date"))
    return spine.withColumns(
        {"date_dim_id": date_dim_id(F.col("date_date")), **attrs}
    ).select(*DIM_DATES_COLUMNS)


def load_dim_dates(
    spark: SparkSession,
    start_date: str,
    end_date: str,
    table: str = "dim_dates",
) -> str:
    """Idempotent load: skip when fully loaded, else append only missing days
    (reference: src/jobs/load_dim_dates.py:22-42)."""
    expected = (
        dt.date.fromisoformat(end_date) - dt.date.fromisoformat(start_date)
    ).days + 1

    if not spark.catalog.tableExists(table):
        df = build_dim_dates(spark, start_date, end_date)
        df.write.mode("overwrite").saveAsTable(table)
        return "created"

    current = spark.table(table).filter(
        F.col("date_date").between(start_date, end_date)
    )
    if current.count() == expected:
        return "skipped"

    df_append = append_missing(
        build_dim_dates(spark, start_date, end_date), current
    )
    df_append.write.mode("append").saveAsTable(table)
    return "appended"
