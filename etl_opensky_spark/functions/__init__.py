"""Scalar/column function library (SURVEY §2.11) + training-data ops."""

from etl_opensky_spark.functions.datetime import (  # noqa: F401
    calendar_attrs,
    epoch_to_timestamp,
    ymd_columns,
)
