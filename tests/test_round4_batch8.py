"""Round-4 batch-8 operators: Count-Min sketch, from-scratch HLL
registers, exact pow-2 EWMA, deterministic negative sampling."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


# --- count-min ---------------------------------------------------------------


def test_countmin_never_underestimates_and_is_tight_when_wide(spark):
    from etl_opensky_spark.functions.heavyhitters import countmin_estimates

    data = [(f"k{i % 50}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(data, ["k"])
    got = countmin_estimates(df, "k", depth=4, width=1024, top_k=10).collect()
    assert all(r.over_ok for r in got)
    assert got[0].item == "hot" and got[0].true_cnt == 500
    # with width >> keys, collisions are rare: the hot key is exact
    assert got[0].est_cnt == 500


def test_countmin_overestimates_under_collision_pressure(spark):
    from etl_opensky_spark.functions.heavyhitters import countmin_estimates

    df = spark.createDataFrame([(f"k{i % 400}",) for i in range(4000)], ["k"])
    got = countmin_estimates(df, "k", depth=2, width=16, top_k=400).collect()
    # 400 keys into 16 buckets: the bound holds on every row, and the
    # pressure must show up as real overestimates
    assert all(r.est_cnt >= r.true_cnt for r in got)
    assert any(r.est_cnt > r.true_cnt for r in got)


def test_countmin_partitioning_invariant(spark):
    from etl_opensky_spark.functions.heavyhitters import countmin_estimates

    df = spark.createDataFrame([(i % 97,) for i in range(1000)], ["k"])
    a = rows(countmin_estimates(df, "k", top_k=97))
    b = rows(countmin_estimates(df.repartition(11), "k", top_k=97))
    assert a == b


# --- hll ---------------------------------------------------------------------


def test_hll_estimate_within_expected_error(spark):
    from etl_opensky_spark.functions.cardinality import (
        hll_estimate,
        hll_registers,
    )

    n = 5000
    df = spark.range(n).select(F.col("id").alias("k"))
    regs = hll_registers(df, "k", b=8)
    est = hll_estimate(regs, b=8).collect()[0]
    # standard error ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est.estimate - n) / n < 0.2
    assert est.m == 256


def test_hll_registers_merge_by_elementwise_max(spark):
    from etl_opensky_spark.functions.cardinality import hll_registers

    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(2000, 6000).select(F.col("id").alias("k"))
    union_regs = rows(hll_registers(a.union(b), "k"))
    merged = rows(
        hll_registers(a, "k")
        .union(hll_registers(b, "k"))
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    assert union_regs == merged


def test_floor_log2_unrolled_is_exact(spark):
    from etl_opensky_spark.functions.cardinality import floor_log2

    vals = [1, 2, 3, 4, 7, 8, 1023, 1024, (1 << 51) - 1, 1 << 51]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = [
        r.f for r in df.select(floor_log2(F.col("v")).alias("f")).collect()
    ]
    assert got == [v.bit_length() - 1 for v in vals]


# --- ewma --------------------------------------------------------------------


def test_ewma_pow2_matches_reference_weights(spark):
    from etl_opensky_spark.operators.reshape import ewma_pow2

    day = dt.date(2024, 1, 1)
    daily = spark.createDataFrame(
        [
            ("a", day, 100),
            ("a", day + dt.timedelta(days=1), 200),
            # gap on day 2
            ("a", day + dt.timedelta(days=3), 400),
        ],
        ["k", "day", "v"],
    )
    got = {
        r.day: (r.ewma_num, r.weight_den)
        for r in ewma_pow2(daily, "k", "day", "v", horizon=4).collect()
    }
    # horizon 4 -> weights 8,4,2,1 for lags 0..3
    assert got[day] == (100 * 8, 8)
    assert got[day + dt.timedelta(days=1)] == (200 * 8 + 100 * 4, 12)
    # anchor day 3: lag0=400(w8), lag1 missing, lag2=200(w2), lag3=100(w1)
    assert got[day + dt.timedelta(days=3)] == (
        400 * 8 + 200 * 2 + 100 * 1,
        11,
    )


def test_ewma_plan_is_equi_join_not_nested_loop(spark):
    from etl_opensky_spark.operators.reshape import ewma_pow2

    day = dt.date(2024, 1, 1)
    daily = spark.createDataFrame(
        [(f"k{i % 5}", day + dt.timedelta(days=i % 30), i) for i in range(200)],
        ["k", "day", "v"],
    ).groupBy("k", "day").agg(F.sum("v").alias("v"))
    out = ewma_pow2(daily, "k", "day", "v", horizon=8)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# --- negative sampling -------------------------------------------------------


def test_negative_samples_deterministic_valid_and_non_self(spark):
    from etl_opensky_spark.functions.sampling import negative_samples

    df = spark.range(100).select(F.col("id").alias("doc_id"))
    a = rows(negative_samples(df, "doc_id", k=4))
    b = rows(negative_samples(df.repartition(7), "doc_id", k=4))
    assert a == b  # pure function of (id, slot)
    ids = set(range(100))
    for doc_id, slot, neg in a:
        assert neg in ids and neg != doc_id and 0 <= slot < 4
    # nearly all rows keep k negatives (self-collision is ~k/n)
    assert len(a) >= 100 * 4 - 8


def test_negative_samples_sparse_id_space_only_real_ids(spark):
    from etl_opensky_spark.functions.sampling import negative_samples

    # ids 0..199 with only even present: semi join must drop odd draws
    df = spark.range(100).select((F.col("id") * 2).alias("doc_id"))
    out = negative_samples(df, "doc_id", k=8, universe_size=200)
    ids = {r.doc_id for r in df.collect()}
    got = negative_samples(df, "doc_id", k=8, universe_size=200).collect()
    assert all(r.neg_id in ids for r in got)
    assert len(got) < 100 * 8  # odd candidates were really dropped


# --- label spreading ---------------------------------------------------------


def test_label_spread_min_seed_within_k_hops(spark):
    from etl_opensky_spark.functions.graph import label_spread

    # path graph 1-2-3-4-5-6, seeds: 1 -> 10, 5 -> 50
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1, 10), (5, 50)], ["node", "label"])
    got = dict(
        rows(label_spread(edges, seeds, n_rounds=2).select("node", "label"))
    )
    # 2 hops from node 1: {1,2,3}; from node 5: {3,4,5,6}; node 3 sees both
    assert got == {1: 10, 2: 10, 3: 10, 4: 50, 5: 50, 6: 50}


def test_label_spread_partitioning_invariant_and_unreached_absent(spark):
    from etl_opensky_spark.functions.graph import label_spread

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)], ["src", "dst"]
    )  # 20 disjoint 2-node components
    seeds = spark.createDataFrame([(0, 7), (10, 3)], ["node", "label"])
    a = rows(label_spread(edges, seeds, n_rounds=3))
    b = rows(label_spread(edges.repartition(9), seeds, n_rounds=3))
    assert a == b
    assert len(a) == 4  # only the two seeded components are reached
