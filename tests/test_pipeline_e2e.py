"""Golden end-to-end pipeline test: REST ingest -> lake -> dims -> fact via
the runner, run TWICE — the second run must be a no-op (the reference's
core idempotency invariant, SURVEY §5.2)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark import schemas
from etl_opensky_spark.plans.dim_aircrafts import build_dim_aircrafts
from etl_opensky_spark.plans.dim_airports import build_dim_airports
from etl_opensky_spark.plans.dim_dates import load_dim_dates
from etl_opensky_spark.plans.fct_flights import load_fct_flights
from etl_opensky_spark.plans.ingest_flights import ingest_flights
from etl_opensky_spark.plans.runner import Pipeline, Task, TaskStatus
from etl_opensky_spark.sources.rest import RestSource
from tests import fixtures

BASE = 1514764800  # 2018-01-01T00:00:00Z


def fake_opensky_fetch(endpoint: str, params: dict) -> list[dict]:
    """Deterministic API double for one airport-day (departures+arrivals)."""
    if "departure" in endpoint:
        return [
            {"icao24": "abc001", "firstSeen": BASE + 3600, "lastSeen": BASE + 7200,
             "estDepartureAirport": "EDDF", "estArrivalAirport": "EGLL",
             "callsign": "DLH1"},
            {"icao24": "abc002", "firstSeen": BASE + 4000, "lastSeen": BASE + 9000,
             "estDepartureAirport": "EDDF", "estArrivalAirport": None,
             "callsign": "DLH2"},
        ]
    return [
        {"icao24": "abc003", "firstSeen": BASE + 5000, "lastSeen": BASE + 9500,
         "estDepartureAirport": None, "estArrivalAirport": "EDDF",
         "callsign": "BAW9"},
    ]


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    """Run the full daily pipeline twice into a temp lake + catalog."""
    lake = str(tmp_path_factory.mktemp("e2e") / "flights")
    data_date = dt.date(2018, 1, 1)
    source = RestSource(fetch=fake_opensky_fetch, schema=schemas.SRC_FLIGHTS)

    def run_once() -> dict[str, TaskStatus]:
        pipeline = Pipeline()
        pipeline.add(
            Task(
                "extract_flights",
                lambda: ingest_flights(spark, source, "EDDF", data_date, lake),
                retries=2,
            )
        )
        pipeline.add(
            Task(
                "load_dim_dates",
                lambda: load_dim_dates(spark, "2018-01-01", "2018-01-31"),
                trigger_rule="none_failed",
            )
        )
        pipeline.add(
            Task(
                "load_dim_airports",
                lambda: build_dim_airports(fixtures.src_airports(spark))
                .write.mode("overwrite")
                .saveAsTable("dim_airports"),
                trigger_rule="none_failed",
            )
        )
        pipeline.add(
            Task(
                "load_dim_aircrafts",
                lambda: build_dim_aircrafts(
                    fixtures.src_aircrafts(spark),
                    fixtures.src_manufacturers(spark),
                    fixtures.src_aircraft_types(spark),
                    fixtures.src_airlines(spark),
                )
                .write.mode("overwrite")
                .saveAsTable("dim_aircrafts"),
                trigger_rule="none_failed",
            )
        )
        pipeline.add(
            Task(
                "load_fct_flights",
                lambda: load_fct_flights(spark, data_date, lake),
                depends_on=[
                    "extract_flights",
                    "load_dim_dates",
                    "load_dim_airports",
                    "load_dim_aircrafts",
                ],
                # a skipped extract (no new data) must not block the fact load
                trigger_rule="none_failed",
            )
        )
        return pipeline.run()

    first = run_once()
    second = run_once()
    return {"first": first, "second": second, "lake": lake, "spark": spark}


def test_all_tasks_succeed_first_run(warehouse):
    assert all(
        s in (TaskStatus.SUCCESS, TaskStatus.SKIPPED)
        for s in warehouse["first"].values()
    ), warehouse["first"]


def test_second_run_is_noop(warehouse, spark):
    assert warehouse["second"]["extract_flights"] is TaskStatus.SKIPPED
    assert warehouse["second"]["load_dim_dates"] is TaskStatus.SKIPPED
    assert warehouse["second"]["load_fct_flights"] is TaskStatus.SKIPPED
    # fact row count unchanged after re-run
    assert spark.table("fct_flights").count() == 3


def test_lake_partition_layout(warehouse, spark):
    lake_df = spark.read.parquet(warehouse["lake"])
    assert set(lake_df.columns) >= {"flight_year", "flight_month", "flight_day"}
    assert lake_df.count() == 3


def test_fact_joins_resolved(warehouse, spark):
    fct = spark.table("fct_flights")
    rows = {r["aircraft_dim_id"]: r for r in fct.collect()}
    # every fact row resolved its aircraft dim key (FK integrity)
    assert None not in rows
    assert all(r["flight_date_dim_id"] == 20180101 for r in rows.values())
    # departure airport resolved for the two departures, null for arrival-only
    airports = spark.table("dim_airports")
    eddf_id = airports.filter(F.col("icao_code") == "EDDF").head()["airport_dim_id"]
    depart_ids = [r["depart_airport_dim_id"] for r in rows.values()]
    assert depart_ids.count(eddf_id) == 2 and depart_ids.count(None) == 1


def test_dim_dates_loaded(warehouse, spark):
    # scope to the pipeline's range: other tests may append other years
    dd = spark.table("dim_dates").filter("year = 2018 AND month = 1")
    assert dd.count() == 31
    jan1 = dd.filter(F.col("date_dim_id") == 20180101).head()
    assert jan1["day_of_week"] == 2  # Monday in Spark DAYOFWEEK
