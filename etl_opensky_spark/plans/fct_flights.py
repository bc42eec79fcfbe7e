"""fct_flights — fact load (reference: src/jobs/load_fct_flights.py).

One day's lake partition -> rename/derive -> three broadcast dim-key
lookups (airports twice as a role-playing dim, aircrafts once) -> EXCEPT
against the existing warehouse partition -> append.  Left joins preserve
fact rows with unmatched dims (null FKs allowed by the warehouse DDL).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_opensky_spark.functions.datetime import epoch_to_timestamp
from etl_opensky_spark.operators.filters import filter_partition
from etl_opensky_spark.operators.joins import lookup_dim
from etl_opensky_spark.operators.projections import rename_columns, select_columns
from etl_opensky_spark.operators.sets import append_missing

FCT_FLIGHTS_COLUMNS = [
    "aircraft_dim_id",
    "depart_ts",
    "depart_airport_dim_id",
    "arrival_ts",
    "arrival_airport_dim_id",
    "flight_date_dim_id",
]


def build_fct_flights(
    flights: DataFrame, dim_airports: DataFrame, dim_aircrafts: DataFrame
) -> DataFrame:
    """Transform one partition of lake flights into fact rows
    (reference: src/jobs/load_fct_flights.py:31-100)."""
    df = rename_columns(
        flights,
        {
            "icao24": "aircraft_icao24",
            "firstSeen": "depart_ts",
            "estDepartureAirport": "depart_airport_icao",
            "lastSeen": "arrival_ts",
            "estArrivalAirport": "arrival_airport_icao",
        },
    )
    df = df.withColumns(
        {
            "depart_ts": epoch_to_timestamp(F.col("depart_ts")),
            "arrival_ts": epoch_to_timestamp(F.col("arrival_ts")),
            "flight_date_dim_id": (
                F.col("flight_year").cast("int") * 10000
                + F.col("flight_month").cast("int") * 100
                + F.col("flight_day").cast("int")
            ),
        }
    ).drop("flight_year", "flight_month", "flight_day")

    # role-playing airports dim: same dim joined under two names
    df = lookup_dim(
        df,
        dim_airports,
        fact_key="depart_airport_icao",
        dim_key="icao_code",
        attach={"airport_dim_id": "depart_airport_dim_id"},
    )
    df = lookup_dim(
        df,
        dim_airports,
        fact_key="arrival_airport_icao",
        dim_key="icao_code",
        attach={"airport_dim_id": "arrival_airport_dim_id"},
    )
    df = lookup_dim(
        df,
        dim_aircrafts,
        fact_key="aircraft_icao24",
        dim_key="icao24_addr",
        attach={"aircraft_dim_id": "aircraft_dim_id"},
    )
    # positional order matters for the EXCEPT-based idempotent append
    return select_columns(df, FCT_FLIGHTS_COLUMNS)


def load_fct_flights(
    spark: SparkSession,
    data_date: dt.date,
    lake_path: str,
    table: str = "fct_flights",
    dim_airports: str = "dim_airports",
    dim_aircrafts: str = "dim_aircrafts",
) -> str:
    """Idempotent daily fact load (reference: src/jobs/load_fct_flights.py:102-116)."""
    flights = filter_partition(
        spark.read.parquet(lake_path),
        flight_year=data_date.year,
        flight_month=data_date.month,
        flight_day=data_date.day,
    )
    df = build_fct_flights(flights, spark.table(dim_airports), spark.table(dim_aircrafts))

    date_key = data_date.year * 10000 + data_date.month * 100 + data_date.day
    if not spark.catalog.tableExists(table):
        df.write.mode("overwrite").partitionBy("flight_date_dim_id").saveAsTable(table)
        return "created"

    current = spark.table(table).filter(F.col("flight_date_dim_id") == date_key)
    df_append = append_missing(df, select_columns(current, FCT_FLIGHTS_COLUMNS))
    if df_append.isEmpty():
        return "skipped"
    df_append.write.mode("append").partitionBy("flight_date_dim_id").saveAsTable(table)
    return "appended"
