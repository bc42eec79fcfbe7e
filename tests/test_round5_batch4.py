"""Round-5 batch 4: Gini skew diagnostic, Hamilton largest-remainder
quota allocation, and exact dyadic time-decay scoring (q256-q258)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.functions.sampling import proportional_allocation
from etl_opensky_spark.operators.aggregates import gini_coefficient
from etl_opensky_spark.operators.behavior import time_decay_score


# --- gini_coefficient (q256) ----------------------------------------------


def _gini_py(xs):
    xs = sorted(xs)
    n = len(xs)
    t = sum(xs)
    s1 = sum(2 * (i + 1) * x for i, x in enumerate(xs))
    return s1 - (n + 1) * t, n * t


def test_gini_matches_reference_formula(spark):
    xs = [1, 1, 2, 3, 5, 8, 13, 21, 34, 55]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    row = gini_coefficient(df, "x").head()
    num, den = _gini_py(xs)
    assert (row["gini_num"], row["gini_den"]) == (num, den)
    assert row["gini"] == pytest.approx(num / den)
    assert row["n"] == 10 and row["total"] == sum(xs)


def test_gini_extremes(spark):
    # perfectly even -> 0
    even = spark.createDataFrame([(7,)] * 20, "x long")
    assert gini_coefficient(even, "x").head()["gini"] == 0.0
    # one key owns everything -> (n-1)/n
    mono = spark.createDataFrame([(0,)] * 9 + [(100,)], "x long")
    row = gini_coefficient(mono, "x").head()
    assert row["gini"] == pytest.approx(9 / 10)


def test_gini_tie_groups_partitioning_invariant(spark):
    xs = [3] * 50 + [9] * 30 + [1] * 20
    df = spark.createDataFrame([(x,) for x in xs], "x long").repartition(7)
    row = gini_coefficient(df, "x", num_buckets=5).head()
    num, den = _gini_py(xs)
    assert (row["gini_num"], row["gini_den"]) == (num, den)


# --- proportional_allocation (q257) ----------------------------------------


def _alloc_py(counts, budget):
    n_tot = sum(counts.values())
    base = {k: budget * v // n_tot for k, v in counts.items()}
    rem = {k: budget * v % n_tot for k, v in counts.items()}
    leftover = budget - sum(base.values())
    order = sorted(counts, key=lambda k: (-rem[k], k))
    return {
        k: base[k] + (1 if i < leftover else 0)
        for i, k in enumerate(order)
    }


def test_allocation_sums_to_budget_and_matches_reference(spark):
    counts = {"a": 17, "b": 5, "c": 29, "d": 3, "e": 46}
    rows = [(k,) for k, v in counts.items() for _ in range(v)]
    df = spark.createDataFrame(rows, "s string")
    out = {
        r["s"]: r["alloc"]
        for r in proportional_allocation(df, ["s"], 10).collect()
    }
    assert sum(out.values()) == 10
    assert out == _alloc_py(counts, 10)


def test_allocation_quota_error_below_one_seat(spark):
    counts = {"x": 1000, "y": 333, "z": 667}
    rows = [(k,) for k, v in counts.items() for _ in range(v)]
    df = spark.createDataFrame(rows, "s string")
    budget, n_tot = 97, sum(counts.values())
    for r in proportional_allocation(df, ["s"], budget).collect():
        exact = budget * counts[r["s"]] / n_tot
        assert abs(r["alloc"] - exact) < 1.0


def test_allocation_deterministic_tiebreak(spark):
    # four equal strata, budget 2: remainders all tie -> first two keys
    rows = [(k,) for k in "abcd" for _ in range(5)]
    df = spark.createDataFrame(rows, "s string")
    out = {
        r["s"]: r["alloc"]
        for r in proportional_allocation(df, ["s"], 2).collect()
    }
    assert out == {"a": 1, "b": 1, "c": 0, "d": 0}


# --- time_decay_score (q258) ------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )


def test_decay_halves_per_step_exactly(spark):
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (1, t0, 10.0),                          # k=0 -> 1000c * 2^40
        (1, t0 - dt.timedelta(days=7), 10.0),   # k=1 -> 1000c * 2^39
        (1, t0 - dt.timedelta(days=14), 10.0),  # k=2 -> 1000c * 2^38
    ]
    out = time_decay_score(
        _ev(spark, rows), "user_id", "ts", "value", half_life_days=7
    ).head()
    expected = 1000 * (2**40 + 2**39 + 2**38)
    assert out["score_scaled"] == Decimal(expected)
    assert out["n_events"] == 3


def test_decay_staircase_is_flat_within_a_step(spark):
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (1, t0 - dt.timedelta(days=1), 4.0),
        (2, t0 - dt.timedelta(days=6), 4.0),
        (3, t0, 1.0),  # anchor row pins max(ts)
    ]
    out = {
        r["user"]: r["score_scaled"]
        for r in time_decay_score(
            _ev(spark, rows), "user_id", "ts", "value", half_life_days=7
        ).collect()
    }
    # both ages land in step k=0: identical weight despite 5 days apart
    assert out[1] == out[2] == Decimal(400 * 2**40)


def test_decay_older_than_cap_contributes_zero(spark):
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (1, t0, 5.0),
        (1, t0 - dt.timedelta(days=7 * 41), 5.0),  # k=41 > cap 40
    ]
    out = time_decay_score(
        _ev(spark, rows), "user_id", "ts", "value", half_life_days=7
    ).head()
    assert out["score_scaled"] == Decimal(500 * 2**40)


def test_decay_scores_are_mergeable(spark):
    t0 = dt.datetime(2024, 3, 1)
    rows_a = [(1, t0, 3.0), (1, t0 - dt.timedelta(days=8), 2.0)]
    rows_b = [(1, t0 - dt.timedelta(days=20), 7.0)]
    # anchor must agree across shards for mergeability: pin it by
    # including a max-ts row in both
    both = time_decay_score(
        _ev(spark, rows_a + rows_b), "user_id", "ts", "value", 7
    ).head()["score_scaled"]
    a = time_decay_score(
        _ev(spark, rows_a), "user_id", "ts", "value", 7
    ).head()["score_scaled"]
    b = time_decay_score(
        _ev(spark, rows_b + [(1, t0, 0.0)]), "user_id", "ts", "value", 7
    ).head()["score_scaled"]
    assert both == a + b
