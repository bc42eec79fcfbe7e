"""Schema registry: every source/warehouse schema, declared (never inferred).

Re-expresses the reference's ``SparkSchema`` registry
(reference: src/config/config_services.py:56-135) and warehouse DDL
(reference: src/dags/hql/create_hive_tbls.hql:1-48).  Hive CHAR/VARCHAR
become StringType (Spark reads them as string anyway).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- data-lake source schemas -------------------------------------------------

#: OpenSky /flights API rows + derived partition columns
#: (reference: src/config/config_services.py:60-79)
SRC_FLIGHTS = T.StructType(
    [
        T.StructField("icao24", T.StringType()),
        T.StructField("firstSeen", T.LongType()),
        T.StructField("estDepartureAirport", T.StringType()),
        T.StructField("lastSeen", T.LongType()),
        T.StructField("estArrivalAirport", T.StringType()),
        T.StructField("callsign", T.StringType()),
        T.StructField("estDepartureAirportHorizDistance", T.IntegerType()),
        T.StructField("estDepartureAirportVertDistance", T.IntegerType()),
        T.StructField("estArrivalAirportHorizDistance", T.IntegerType()),
        T.StructField("estArrivalAirportVertDistance", T.IntegerType()),
        T.StructField("departureAirportCandidatesCount", T.ShortType()),
        T.StructField("arrivalAirportCandidatesCount", T.ShortType()),
        T.StructField("flight_year", T.ShortType()),
        T.StructField("flight_month", T.ByteType()),
        T.StructField("flight_day", T.ByteType()),
    ]
)

#: FlightRadar24 airports (reference: src/config/config_services.py:81-91)
SRC_AIRPORTS = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("iata", T.StringType()),
        T.StructField("icao", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("lat", T.FloatType()),
        T.StructField("lon", T.FloatType()),
        T.StructField("alt", T.ShortType()),
    ]
)

#: FlightRadar24 airlines (reference: src/config/config_services.py:92-98)
SRC_AIRLINES = T.StructType(
    [
        T.StructField("Name", T.StringType()),
        T.StructField("Code", T.StringType()),
        T.StructField("ICAO", T.StringType()),
    ]
)

#: OpenSky aircraft DB CSV (reference: src/config/config_services.py:99-117)
SRC_AIRCRAFTS = T.StructType(
    [
        T.StructField("icao24_addr", T.StringType()),
        T.StructField("registration", T.StringType()),
        T.StructField("manufacturer_code", T.StringType()),
        T.StructField("manufacturer_name", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("icao_designator", T.StringType()),
        T.StructField("serial_num", T.StringType()),
        T.StructField("line_num", T.StringType()),
        T.StructField("icao_type", T.StringType()),
        T.StructField("operator_name", T.StringType()),
        T.StructField("operator_callsign", T.StringType()),
        T.StructField("operator_icao", T.StringType()),
        T.StructField("operator_iata", T.StringType()),
        T.StructField("owner", T.StringType()),
        T.StructField("note", T.StringType()),
    ]
)

#: ICAO doc8643 aircraft types CSV (reference: src/config/config_services.py:118-129)
SRC_AIRCRAFT_TYPES = T.StructType(
    [
        T.StructField("AircraftDescription", T.StringType()),
        T.StructField("Description", T.StringType()),
        T.StructField("Designator", T.StringType()),
        T.StructField("EngineCount", T.ByteType()),
        T.StructField("EngineType", T.StringType()),
        T.StructField("ManufacturerCode", T.StringType()),
        T.StructField("ModelFullName", T.StringType()),
        T.StructField("WTC", T.StringType()),
    ]
)

#: ICAO doc8643 manufacturers CSV (reference: src/config/config_services.py:130-135)
SRC_MANUFACTURERS = T.StructType(
    [
        T.StructField("Code", T.StringType()),
        T.StructField("Name", T.StringType()),
    ]
)

# --- warehouse schemas (reference: src/dags/hql/create_hive_tbls.hql) ---------

DIM_AIRPORTS = T.StructType(
    [
        T.StructField("airport_dim_id", T.LongType(), False),
        T.StructField("icao_code", T.StringType(), False),
        T.StructField("iata_code", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("lat", T.FloatType()),
        T.StructField("lon", T.FloatType()),
        T.StructField("alt", T.ShortType()),
    ]
)

DIM_DATES = T.StructType(
    [
        T.StructField("date_dim_id", T.IntegerType(), False),
        T.StructField("date_date", T.DateType()),
        T.StructField("year", T.ShortType()),
        T.StructField("month", T.ByteType()),
        T.StructField("day", T.ByteType()),
        T.StructField("week_of_year", T.ByteType()),
        T.StructField("day_of_week", T.ByteType()),
    ]
)

DIM_AIRCRAFTS = T.StructType(
    [
        T.StructField("aircraft_dim_id", T.LongType(), False),
        T.StructField("icao24_addr", T.StringType(), False),
        T.StructField("registration", T.StringType()),
        T.StructField("operating_airline", T.StringType()),
        T.StructField("manufacturer", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("serial_num", T.StringType()),
        T.StructField("line_num", T.StringType()),
        T.StructField("icao_designator", T.StringType()),
        T.StructField("icao_type", T.StringType()),
        T.StructField("aircraft_type", T.StringType()),
        T.StructField("engine_cnt", T.ByteType()),
        T.StructField("engine_type", T.StringType()),
    ]
)

FCT_FLIGHTS = T.StructType(
    [
        T.StructField("aircraft_dim_id", T.LongType()),
        T.StructField("depart_ts", T.TimestampType()),
        T.StructField("depart_airport_dim_id", T.LongType()),
        T.StructField("arrival_ts", T.TimestampType()),
        T.StructField("arrival_airport_dim_id", T.LongType()),
        T.StructField("flight_date_dim_id", T.IntegerType()),
    ]
)

#: registry by name, mirroring the reference's class-attribute registry
SCHEMAS: dict[str, T.StructType] = {
    "src_flights": SRC_FLIGHTS,
    "src_airports": SRC_AIRPORTS,
    "src_airlines": SRC_AIRLINES,
    "src_aircrafts": SRC_AIRCRAFTS,
    "src_aircraft_types": SRC_AIRCRAFT_TYPES,
    "src_manufacturers": SRC_MANUFACTURERS,
    "dim_airports": DIM_AIRPORTS,
    "dim_dates": DIM_DATES,
    "dim_aircrafts": DIM_AIRCRAFTS,
    "fct_flights": FCT_FLIGHTS,
}
