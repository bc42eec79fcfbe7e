"""Deterministic OpenSky-shaped fixtures (FIXTURES.md §1) for plan tests.

Small hand-written frames exercising every semantic corner the reference's
transforms depend on: sentinel nulls, invalid code lengths, all-null rows,
the manufacturers skip-row, duplicate aircraft-type rows, airlines with
missing codes, duplicate day-2 flight rows for idempotency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_opensky_spark import schemas


def src_flights(spark: SparkSession) -> DataFrame:
    # day 2018-01-01; epoch 1514764800 = 2018-01-01T00:00:00Z
    base = 1514764800
    rows = [
        # icao24, firstSeen, depAirport, lastSeen, arrAirport, callsign, 4 dists, 2 counts, y, m, d
        ("abc001", base + 3600, "EDDF", base + 7200, "EGLL", "DLH1  ", 100, 10, 200, 20, 1, 1, 2018, 1, 1),
        ("abc002", base + 4000, "EDDF", base + 9000, None, "DLH2", None, None, None, None, 0, 0, 2018, 1, 1),
        ("abc003", base + 5000, None, base + 9500, "EDDF", "BAW9", 50, 5, 60, 6, 2, 2, 2018, 1, 1),
        # second day
        ("abc001", base + 90000, "EGLL", base + 95000, "EDDF", "DLH1", 1, 1, 1, 1, 1, 1, 2018, 1, 2),
    ]
    return spark.createDataFrame(rows, schemas.SRC_FLIGHTS)


def src_airports(spark: SparkSession) -> DataFrame:
    rows = [
        ("Frankfurt Main", "FRA", "EDDF", "Germany", 50.03, 8.57, 364),
        ("London Heathrow", "LHR", "EGLL", "United Kingdom", 51.47, -0.45, 83),
        ("Unreferenced Field", None, "ZZZZ", "Nowhere", 0.0, 0.0, None),
    ]
    return spark.createDataFrame(rows, schemas.SRC_AIRPORTS)


def src_airlines(spark: SparkSession) -> DataFrame:
    rows = [
        ("Lufthansa", "LH", "DLH"),
        ("British Airways", "BA", "BAW"),
        ("IataOnly Air", "IO", None),
        ("NoCodes Air", None, None),
    ]
    return spark.createDataFrame(rows, schemas.SRC_AIRLINES)


def src_aircrafts(spark: SparkSession) -> DataFrame:
    rows = [
        # icao24, registration, mfr_code, mfr_name, model, designator, serial, line,
        # icao_type, op_name, op_callsign, op_icao, op_iata, owner, note
        ("abc001", "D-AIMA", "AIRB", "Airbus Industrie", "A380-841", "A388", "038", "\tN/A",
         "L4J", "Lufthansa Fallback", "LUFTHANSA", "DLH", "LH", "LH Group", "x"),
        ("abc002", "-UNKNOWN-", "AIRB", "Airbus", "A320", "A320", "100", "-",
         "L2J", "Op NoAirline", None, None, "IO", None, None),
        ("abc003", "G-XWBA", "BOEI", "Boeing", "777", "B77W", "55", "n/a",
         None, "British Airways Fallback", None, None, None, None, None),
        # dropped by the length-filter wheres: designator >4 chars, icao_type != 3 chars
        ("zzz999", "BAD", "AIRB", "Airbus", "Bad", "TOOLONG5", "1", None,
         "XXXX", None, None, None, None, None, None),
        (None, None, None, None, None, None, None, None, None, None, None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, schemas.SRC_AIRCRAFTS)


def src_aircraft_types(spark: SparkSession) -> DataFrame:
    rows = [
        ("LandPlane", "L4J", "A388", 4, "Jet", "AIRB", "A-380-800", "H"),
        ("LandPlane", "L2J", "A320", 2, "Jet", "AIRB", "A-320", "M"),
        ("LandPlane", "L2J", "A320", 2, "Jet", "AIRB", "A-320", "M"),  # exact dup
    ]
    return spark.createDataFrame(rows, schemas.SRC_AIRCRAFT_TYPES)


def src_manufacturers(spark: SparkSession) -> DataFrame:
    rows = [
        ("Code", "Name"),  # pseudo-header row: skipped by offset(1)
        ("AIRB", "AIRBUS"),
        ("BOEI", "BOEING"),
    ]
    return spark.createDataFrame(rows, schemas.SRC_MANUFACTURERS)
