"""dim_airports — airports dimension (reference: src/jobs/load_dim_airports.py).

The reference's change detection compares DataFrame OBJECTS with ``==``
(src/jobs/load_dim_airports.py:54) which is always False -> observable
semantics are "always overwrite"; the engine keeps full-refresh as the
default and offers real content-hash change detection (``frames_differ``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_opensky_spark.operators.keys import surrogate_key
from etl_opensky_spark.operators.projections import rename_columns

DIM_AIRPORTS_COLUMNS = [
    "airport_dim_id",
    "icao_code",
    "iata_code",
    "name",
    "country",
    "lat",
    "lon",
    "alt",
]


def build_dim_airports(src_airports: DataFrame, key_mode: str = "row_number") -> DataFrame:
    """Rename to warehouse names and mint the surrogate key
    (reference: src/jobs/load_dim_airports.py:47-50; key = row_number over
    orderBy(name) — key_mode="hash" gives the scalable variant)."""
    df = rename_columns(src_airports, {"icao": "icao_code", "iata": "iata_code"})
    df = surrogate_key(df, ["name"], "airport_dim_id", mode=key_mode)
    return df.select(*DIM_AIRPORTS_COLUMNS)


def frames_differ(left: DataFrame, right: DataFrame) -> bool:
    """Real change detection: symmetric EXCEPT-ALL emptiness (fixes the
    reference's object-identity ``==`` bug, SURVEY §2.12).  Shuffles both
    frames once each — for very large frames compare partition-level
    content hashes instead."""
    if left.schema != right.schema:
        return True
    return (not left.exceptAll(right).isEmpty()) or (
        not right.exceptAll(left).isEmpty()
    )
