"""Round-5 batch 6: temperature mixture allocation, ORC roundtrip,
k-core peeling (q262-q264)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_opensky_spark.functions.graph import k_core
from etl_opensky_spark.functions.sampling import (
    proportional_allocation,
    temperature_allocation,
)
from etl_opensky_spark.sources.files import read_orc, write_orc


# --- temperature_allocation (q262) -----------------------------------------


def _strata_df(spark, counts):
    rows = [(k,) for k, v in counts.items() for _ in range(v)]
    return spark.createDataFrame(rows, "s string")


def test_temperature_flattens_toward_rare_strata(spark):
    counts = {"big": 10_000, "small": 100}
    df = _strata_df(spark, counts)
    prop = {
        r["s"]: r["alloc"]
        for r in proportional_allocation(df, ["s"], 1000).collect()
    }
    temp = {
        r["s"]: r["alloc"]
        for r in temperature_allocation(
            df, ["s"], 1000, alpha_halves=1
        ).collect()
    }
    assert sum(temp.values()) == 1000
    # sqrt weights: 100 vs 10 -> small gets ~10x its proportional share
    assert temp["small"] > prop["small"] * 5
    assert temp["big"] < prop["big"]


def test_temperature_alpha_2_equals_proportional(spark):
    counts = {"a": 37, "b": 11, "c": 52}
    df = _strata_df(spark, counts)
    prop = {
        r["s"]: r["alloc"]
        for r in proportional_allocation(df, ["s"], 25).collect()
    }
    temp = {
        r["s"]: r["alloc"]
        for r in temperature_allocation(
            df, ["s"], 25, alpha_halves=2
        ).collect()
    }
    # alpha = 1: n^1 micro-quantized is still proportional to n
    assert temp == prop


def test_temperature_weight_micros_exact(spark):
    df = _strata_df(spark, {"x": 9})
    row = temperature_allocation(df, ["s"], 5, alpha_halves=3).head()
    # n^(3/2) = 9 * sqrt(9) = 27 exactly
    assert row["weight_micros"] == 27_000_000
    assert row["alloc"] == 5


def test_temperature_rejects_bad_alpha(spark):
    with pytest.raises(ValueError):
        temperature_allocation(_strata_df(spark, {"x": 1}), ["s"], 1, 0)


# --- ORC roundtrip (q263) ---------------------------------------------------


def test_orc_roundtrip_lossless(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5, None), (2, None, -0.125, 7), (3, "c", 2.0**-40, 0)],
        "k long, s string, d double, i int",
    )
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
    assert back.schema == df.schema


def test_orc_enforced_schema_projects_and_casts(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.5), (2, 3.5)], "k long, d double")
    path = str(tmp_path / "orc2")
    write_orc(df, path)
    schema = T.StructType([T.StructField("k", T.LongType())])
    back = read_orc(spark, path, schema=schema)
    assert back.columns == ["k"]
    assert sorted(r["k"] for r in back.collect()) == [1, 2]


def test_orc_predicate_pushdown_in_plan(spark, tmp_path):
    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    path = str(tmp_path / "orc3")
    write_orc(df, path)
    plan = (
        read_orc(spark, path)
        .filter(F.col("k") > 900)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,900)]" in plan


# --- k_core (q264) ----------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_k_core_peels_pendant_chain(spark):
    # triangle 1-2-3 plus a pendant path 3-4-5: 2-core = the triangle
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    out = {r["node"]: r["deg"] for r in k_core(e, k=2, rounds=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_k_core_needs_enough_rounds_for_deep_peel(spark):
    # path 1-2-3-4-5-6 with k=2: each round only removes the current
    # endpoints; after 2 rounds a stub remains, fixpoint is empty
    path = [(i, i + 1) for i in range(1, 6)]
    e = _edges(spark, path)
    two = k_core(e, k=2, rounds=2).count()
    many = k_core(e, k=2, rounds=5).count()
    assert two > 0 and many == 0


def test_k_core_whole_graph_when_k_low(spark):
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    out = k_core(e, k=1, rounds=2)
    assert out.count() == 3


def test_k_core_dedups_and_ignores_self_loops(spark):
    e = _edges(spark, [(1, 2), (2, 1), (1, 1), (2, 3), (1, 3)])
    out = {r["node"]: r["deg"] for r in k_core(e, k=2, rounds=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


# --- dedup_exact keep_by (q266) ---------------------------------------------


def _dup_docs(spark):
    rows = [
        (1, "hello world", "srcB"),
        (2, "Hello   WORLD", "srcA"),   # same canonical text, better source
        (3, "unique text", "srcC"),
        (4, "hello world", "srcB"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_keep_by_prefers_policy_over_min_id(spark):
    from etl_opensky_spark.functions.dedup import dedup_exact

    df = _dup_docs(spark)
    kept = sorted(
        r["doc_id"]
        for r in dedup_exact(
            df, "text", "doc_id", keep_by=F.col("source")
        ).collect()
    )
    # srcA's copy (id 2) beats min-id 1
    assert kept == [2, 3]
    # default rule unchanged: min id wins
    kept_default = sorted(
        r["doc_id"] for r in dedup_exact(df, "text", "doc_id").collect()
    )
    assert kept_default == [1, 3]


def test_keep_by_hot_path_agrees_with_window_path(spark):
    from etl_opensky_spark.functions.dedup import dedup_exact

    rows = [(i, "boilerplate page", f"src{9 - i % 3}") for i in range(50)]
    rows += [(100, "rare text", "srcZ")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    cold = sorted(
        map(tuple, dedup_exact(
            df, "text", "doc_id", keep_by=F.col("source")
        ).collect())
    )
    hot = sorted(
        map(tuple, dedup_exact(
            df, "text", "doc_id", hot_threshold=10, keep_by=F.col("source")
        ).collect())
    )
    assert cold == hot
    # min (source, id): src7 first appears at doc_id 2
    assert [r[0] for r in cold] == [2, 100]


# --- top_eigenvalue (q270) --------------------------------------------------


def test_top_eigenvalue_matches_numpy_on_known_data(spark):
    import numpy as np

    from etl_opensky_spark.functions.linalg import top_eigenvalue

    rng = [(i, [float(i % 5), float((i * 3) % 7), 0.5]) for i in range(60)]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    r = top_eigenvalue(df)
    mat = np.array([v for _, v in rng])
    q = np.floor(mat.astype(np.float64) * 1e6)
    n = len(rng)
    a = n * (q.T @ q) - np.outer(q.sum(0), q.sum(0))
    ref = np.linalg.eigvalsh(a).max()
    assert r["dim"] == 3 and r["n"] == n
    assert r["eig_num"] == pytest.approx(ref, rel=1e-9)
    assert r["maxdiag_num"] <= r["eig_num"] <= r["trace_num"]
    # constant third component: its diagonal contributes 0 variance
    assert a[2, 2] == 0
