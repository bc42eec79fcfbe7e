"""Batch-25: expectations-as-data, late-dim park/drain, linear
attribution, business-day arithmetic."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


def test_load_expectations_rejects_bad_specs(spark):
    from etl_opensky_spark.operators.quality import load_expectations

    with pytest.raises(ValueError, match="unknown keys"):
        load_expectations([{"name": "x", "column": "c", "op": "gt",
                            "value": 0, "typo": 1}])
    with pytest.raises(ValueError, match="op in"):
        load_expectations([{"name": "x", "column": "c", "op": "nope"}])
    with pytest.raises(ValueError, match="duplicate"):
        load_expectations([
            {"name": "x", "column": "c", "op": "not_null"},
            {"name": "x", "column": "d", "op": "not_null"},
        ])
    with pytest.raises(ValueError, match="empty"):
        load_expectations([])


def test_load_expectations_compiles_and_validates(spark):
    from etl_opensky_spark.operators.quality import (
        load_expectations,
        validate_rules,
    )

    rules = load_expectations([
        {"name": "pos", "column": "v", "op": "gt", "value": 0},
        {"name": "short", "column": "s", "op": "max_length", "value": 3},
    ])
    df = spark.createDataFrame(
        [(1, "ab"), (-1, "ab"), (2, "toolong"), (None, None)], ["v", "s"]
    )
    valid, quar = validate_rules(df, rules)
    assert valid.count() == 1
    failed = {
        tuple(r["failed_rules"]) for r in quar.collect()
    }
    assert ("pos",) in failed and ("short",) in failed
    assert ("pos", "short") in failed  # NULL row fails both


def test_split_by_fk_partitions_the_fact(spark):
    from etl_opensky_spark.operators.quality import split_by_fk

    fact = spark.createDataFrame([(i, i % 5) for i in range(20)], ["id", "fk"])
    dim = spark.createDataFrame([(0,), (1,), (2,)], ["pk"])
    loadable, parked = split_by_fk(fact, dim, "fk", "pk")
    assert loadable.count() + parked.count() == 20
    assert parked.select("fk").distinct().count() == 2  # fks 3, 4


def test_linear_attribution_exact_credits(spark):
    from etl_opensky_spark.operators.behavior import linear_attribution

    t = datetime.datetime
    ev = spark.createDataFrame(
        [
            # user 1: three touches then purchase -> 333334/333333/333333
            (1, t(2020, 1, 1), 1, "view"),
            (1, t(2020, 1, 2), 2, "click"),
            (1, t(2020, 1, 3), 3, "view"),
            (1, t(2020, 1, 4), 4, "purchase"),
            (1, t(2020, 1, 5), 5, "view"),       # post-conversion: ignored
            # user 2: no purchase -> excluded entirely
            (2, t(2020, 1, 1), 6, "click"),
            # user 3: purchase with no prior touches -> nothing credited
            (3, t(2020, 1, 1), 7, "purchase"),
        ],
        ["user_id", "ts", "event_id", "event_type"],
    )
    out = {
        r["channel"]: (r["n_touches"], r["credit_micros"])
        for r in linear_attribution(
            ev, "user_id", "ts", "event_type", "event_id", "purchase"
        ).collect()
    }
    assert out["view"] == (2, 333334 + 333333)  # earliest touch gets remainder
    assert out["click"] == (1, 333333)
    assert sum(c for _, c in out.values()) == 1_000_000


def test_business_days_between_matches_python_model(spark):
    from etl_opensky_spark.functions.datetime import business_days_between

    d = datetime.date
    cases = []
    start = d(2019, 12, 25)
    for i in range(40):
        for j in range(0, 15, 3):
            a = start + datetime.timedelta(days=i)
            cases.append((a, a + datetime.timedelta(days=j)))
    df = spark.createDataFrame(cases, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["bd"]
        for r in df.select(
            "a", "b", business_days_between(F.col("a"), F.col("b")).alias("bd")
        ).collect()
    }

    def model(a, b):
        n, cur = 0, a
        while cur < b:
            cur += datetime.timedelta(days=1)
            if cur.weekday() < 5:  # Mon-Fri
                n += 1
        return n

    for (a, b), v in got.items():
        assert v == model(a, b), (a, b, v, model(a, b))


def test_business_days_between_pre_epoch(spark):
    """Negative epoch-day counts: Spark's truncated % would make every
    CASE branch miss (ADVICE r4 medium) — pmod/floor-div must hold."""
    from etl_opensky_spark.functions.datetime import business_days_between

    d = datetime.date
    cases = [
        (d(1969, 12, 1), d(1969, 12, 31)),   # fully pre-epoch (correct: 22)
        (d(1969, 12, 25), d(1970, 1, 8)),    # straddles the epoch (correct: 10)
        (d(1969, 12, 31), d(1970, 1, 1)),    # single day across the boundary
        (d(1900, 1, 1), d(1900, 2, 1)),      # deep pre-epoch month
        (d(1969, 1, 1), d(1971, 1, 1)),      # two years across
    ]
    df = spark.createDataFrame(cases, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["bd"]
        for r in df.select(
            "a", "b", business_days_between(F.col("a"), F.col("b")).alias("bd")
        ).collect()
    }

    def model(a, b):
        n, cur = 0, a
        while cur < b:
            cur += datetime.timedelta(days=1)
            if cur.weekday() < 5:
                n += 1
        return n

    for (a, b), v in got.items():
        assert v == model(a, b), (a, b, v, model(a, b))
    assert got[(d(1969, 12, 1), d(1969, 12, 31))] == 22
    assert got[(d(1969, 12, 25), d(1970, 1, 8))] == 10


def test_detect_renames_pairs_by_content_not_name(spark):
    from etl_opensky_spark.operators.quality import detect_renames

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "name", "price"]
    )
    new = old.withColumnsRenamed({"price": "amount"})
    out = detect_renames(
        old, new, ["id", "name", "price"], ["id", "name", "amount"]
    ).collect()
    assert [(r["old_col"], r["new_col"]) for r in out] == [("price", "amount")]


def test_detect_renames_no_false_pairs_on_distinct_content(spark):
    from etl_opensky_spark.operators.quality import detect_renames

    old = spark.createDataFrame([(1, 2)], ["a", "b"])
    new = spark.createDataFrame([(3, 4)], ["c", "d"])
    assert detect_renames(old, new, ["a", "b"], ["c", "d"]).count() == 0


def test_grouped_linear_trend_matches_numpy(spark):
    import numpy as np

    from etl_opensky_spark.operators.aggregates import grouped_linear_trend

    xs = list(range(30))
    ys = [3 * x + 7 + (x % 5) for x in xs]  # near-linear with noise
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], ["g", "x", "y"]
    )
    [r] = grouped_linear_trend(df, ["g"], F.col("x"), F.col("y")).collect()
    slope, intercept = np.polyfit(xs, ys, 1)
    assert abs(r["slope_micros"] / 1e6 - slope) < 1e-5
    assert abs(r["intercept_micros"] / 1e6 - intercept) < 1e-5
    assert r["n"] == 30


def test_grouped_linear_trend_degenerate_x_is_null(spark):
    from etl_opensky_spark.operators.aggregates import grouped_linear_trend

    df = spark.createDataFrame([("g", 5, 1), ("g", 5, 9)], ["g", "x", "y"])
    [r] = grouped_linear_trend(df, ["g"], F.col("x"), F.col("y")).collect()
    assert r["slope_micros"] is None and r["intercept_micros"] is None


def test_interpolate_linear_exact_and_no_extrapolation(spark):
    from etl_opensky_spark.operators.reshape import interpolate_linear

    df = spark.createDataFrame(
        [
            ("a", 0, None),   # before first known: stays NULL
            ("a", 1, 10),
            ("a", 2, None),   # 10 + (40-10)*1/3 = 20
            ("a", 3, None),   # 10 + (40-10)*2/3 = 30
            ("a", 4, 40),
            ("a", 6, None),   # after last known: stays NULL
            ("b", 1, 5),
            ("b", 3, None),   # 5 + (6-5)*2/4 = 5 (floor of 0.5)
            ("b", 5, 6),
        ],
        "k string, t int, v long",
    )
    got = {
        (r["k"], r["t"]): r["v_interp"]
        for r in interpolate_linear(df, ["k"], "t", "v").collect()
    }
    assert got[("a", 0)] is None and got[("a", 6)] is None
    assert got[("a", 2)] == 20 and got[("a", 3)] == 30
    assert got[("a", 1)] == 10 and got[("a", 4)] == 40  # knowns untouched
    assert got[("b", 3)] == 5  # floor semantics
