"""Property-based tests (hypothesis) for the engine's core invariants
(SURVEY §5.4).  Strategies are kept small — each example spins Spark jobs.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_opensky_spark.operators.filters import nullify_values
from etl_opensky_spark.operators.joins import fk_orphans
from etl_opensky_spark.operators.reshape import date_spine
from etl_opensky_spark.operators.sets import append_missing

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.sampled_from(["a", "b", "-", "n/a", "ok", None, "", "\tN/A"])


@SETTINGS
@given(st.lists(words, min_size=0, max_size=12))
def test_nullify_never_touches_non_sentinels(spark, values):
    sentinels = ["-", "n/a", "\tN/A"]
    df = spark.createDataFrame([(v,) for v in values], "c string")
    out = [r["c"] for r in nullify_values(df, {"c": sentinels}).collect()]
    assert len(out) == len(values)
    # every sentinel became NULL, every non-sentinel survived unchanged
    expected_nulls = sum(1 for v in values if v is None or v in sentinels)
    assert out.count(None) == expected_nulls
    assert sorted(v for v in out if v is not None) == sorted(
        v for v in values if v is not None and v not in sentinels
    )


@SETTINGS
@given(
    st.lists(st.tuples(st.integers(0, 5), st.sampled_from(["x", "y", None])),
             min_size=0, max_size=10),
    st.lists(st.tuples(st.integers(0, 5), st.sampled_from(["x", "y", None])),
             min_size=0, max_size=10),
)
def test_append_missing_twice_is_once(spark, new, existing):
    df_new = spark.createDataFrame(new, "k int, v string") if new else spark.createDataFrame([], "k int, v string")
    df_old = spark.createDataFrame(existing, "k int, v string") if existing else spark.createDataFrame([], "k int, v string")
    once = append_missing(df_new, df_old)
    # appending the result to existing and re-running yields nothing new
    merged = df_old.unionByName(once)
    twice = append_missing(df_new, merged)
    assert twice.count() == 0


@SETTINGS
@given(st.integers(0, 500), st.integers(0, 60))
def test_date_spine_length(spark, start_offset, span):
    start = dt.date(2020, 1, 1) + dt.timedelta(days=start_offset)
    end = start + dt.timedelta(days=span)
    out = date_spine(spark, start.isoformat(), end.isoformat())
    assert out.count() == span + 1


@SETTINGS
@given(
    st.lists(st.one_of(st.integers(0, 8), st.none()), min_size=0, max_size=10),
    st.sets(st.integers(0, 8), max_size=9),
)
def test_fk_orphans_matches_set_semantics(spark, fact_keys, dim_keys):
    fact = (
        spark.createDataFrame([(k,) for k in fact_keys], "k int")
        if fact_keys
        else spark.createDataFrame([], "k int")
    )
    dim = (
        spark.createDataFrame([(k,) for k in dim_keys], "pk int")
        if dim_keys
        else spark.createDataFrame([], "pk int")
    )
    got = sorted(r["k"] for r in fk_orphans(fact, "k", dim, "pk").collect())
    expected = sorted(k for k in fact_keys if k is not None and k not in dim_keys)
    assert got == expected
