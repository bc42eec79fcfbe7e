"""Flights ingest — REST -> partitioned parquet lake
(reference: src/jobs/extract_flights.py).

Fetch departures + arrivals for one airport-day, derive y/m/d partition
columns from the event time (firstSeen for departures, lastSeen for
arrivals), then append idempotently: only rows not already present in the
day's partition are written.
"""

from __future__ import annotations

import datetime as dt
import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_opensky_spark.functions.datetime import epoch_to_timestamp, ymd_columns
from etl_opensky_spark.operators.filters import filter_partition
from etl_opensky_spark.operators.sets import append_missing, union_by_name
from etl_opensky_spark.schemas import SRC_FLIGHTS
from etl_opensky_spark.sources.rest import RestSource

logger = logging.getLogger(__name__)

#: event-time column per flight kind (reference: src/jobs/extract_flights.py:45-46)
EVENT_TIME = {"departure": "firstSeen", "arrival": "lastSeen"}


def path_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence check via the Hadoop FileSystem API —
    works for local, HDFS, and object-store paths alike (the reference's
    one JVM escape hatch, src/jobs/extract_flights.py:69-73)."""
    jvm = spark._jvm
    jsc = spark._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(jsc.hadoopConfiguration())
    return bool(fs.exists(hadoop_path))


def with_partition_columns(df: DataFrame, event_col: str) -> DataFrame:
    """Derive flight_year/month/day from the event-time epoch column
    (reference: src/jobs/extract_flights.py:52-63)."""
    ts = epoch_to_timestamp(F.col(event_col))
    return df.withColumns(
        {name: expr for name, expr in ymd_columns(ts).items()}
    )


def extract_day(
    spark: SparkSession,
    source: RestSource,
    airport_icao: str,
    begin_ts: int,
    end_ts: int,
) -> DataFrame:
    """Fetch + union departures and arrivals for one airport-day."""
    frames: list[DataFrame] = []
    for kind in ("departure", "arrival"):
        df = source.fetch_batch(
            spark,
            endpoint=f"flights/{kind}",
            params={"airport": airport_icao, "begin": begin_ts, "end": end_ts},
        )
        event_col = EVENT_TIME[kind]
        null_events = df.filter(F.col(event_col).isNull()).count()
        if null_events:
            logger.warning(
                "%d NULLs in %s flights' event-time column %s (partition source)",
                null_events,
                kind,
                event_col,
            )
        frames.append(with_partition_columns(df, event_col))
    out = frames[0]
    for df in frames[1:]:
        out = union_by_name(out, df)
    # bind to the registry schema's column order and exact types
    return out.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in SRC_FLIGHTS.fields]
    )


def ingest_flights(
    spark: SparkSession,
    source: RestSource,
    airport_icao: str,
    data_date: dt.date,
    lake_path: str,
) -> str:
    """One airport-day REST -> lake load with EXCEPT-based idempotency
    (reference: src/jobs/extract_flights.py:66-100)."""
    begin_ts = int(
        dt.datetime.combine(data_date, dt.time(), tzinfo=dt.timezone.utc).timestamp()
    )
    end_ts = begin_ts + 86400
    extracted = extract_day(spark, source, airport_icao, begin_ts, end_ts)

    # explicit existence check (reference: src/jobs/extract_flights.py:69-79)
    # — a broad except around the read would misread transient read errors
    # as "first write" and silently append duplicates
    if not path_exists(spark, lake_path):
        extracted.write.mode("append").partitionBy(
            "flight_year", "flight_month", "flight_day"
        ).parquet(lake_path)
        return "created"
    current = filter_partition(
        spark.read.parquet(lake_path),
        flight_year=data_date.year,
        flight_month=data_date.month,
        flight_day=data_date.day,
    )

    if current.count() == extracted.count():
        return "skipped"
    df_append = append_missing(extracted, current.select(*extracted.columns))
    df_append.write.mode("append").partitionBy(
        "flight_year", "flight_month", "flight_day"
    ).parquet(lake_path)
    return "appended"
