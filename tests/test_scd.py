"""SCD2 merge tests: change, no-change, new key, idempotent re-merge."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.operators.scd import scd2_merge

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 6, 1)

SCHEMA = (
    "icao24 string, registration string, valid_from timestamp, "
    "valid_to timestamp, is_current boolean"
)


@pytest.fixture()
def current(spark):
    rows = [
        ("aaa", "D-OLD", T0, None, True),    # will change
        ("bbb", "G-SAME", T0, None, True),   # unchanged
        ("ccc", "F-GONE", T0, T1, False),    # already-closed history row
        ("ccc", "F-NEW", T1, None, True),    # its current successor
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def updates(spark):
    rows = [
        ("aaa", "D-CHANGED", T1),  # attribute change
        ("bbb", "G-SAME", T1),     # identical -> no churn
        ("ddd", "N-BRAND", T1),    # brand-new key
    ]
    return spark.createDataFrame(
        rows, "icao24 string, registration string, valid_from timestamp"
    )


def merged(current, updates):
    return scd2_merge(
        current, updates, keys=["icao24"], compare_cols=["registration"]
    )


def test_scd2_change_closes_and_inserts(spark, current, updates):
    out = merged(current, updates)
    aaa = sorted(
        (r["registration"], r["is_current"], r["valid_to"])
        for r in out.filter(F.col("icao24") == "aaa").collect()
    )
    assert aaa == [("D-CHANGED", True, None), ("D-OLD", False, T1)]


def test_scd2_no_churn_for_identical(spark, current, updates):
    out = merged(current, updates)
    bbb = out.filter(F.col("icao24") == "bbb").collect()
    assert len(bbb) == 1
    assert bbb[0]["valid_from"] == T0 and bbb[0]["is_current"]


def test_scd2_new_key_inserted_current(spark, current, updates):
    out = merged(current, updates)
    ddd = out.filter(F.col("icao24") == "ddd").collect()
    assert len(ddd) == 1 and ddd[0]["is_current"]


def test_scd2_history_untouched(spark, current, updates):
    out = merged(current, updates)
    ccc = sorted(
        (r["registration"], r["is_current"])
        for r in out.filter(F.col("icao24") == "ccc").collect()
    )
    assert ccc == [("F-GONE", False), ("F-NEW", True)]


def test_scd2_idempotent_remerge(spark, current, updates):
    once = merged(current, updates)
    twice = merged(once, updates)
    # re-applying the same updates changes nothing (no new rows, no flips)
    assert twice.count() == once.count()
    assert twice.exceptAll(once).isEmpty() and once.exceptAll(twice).isEmpty()
