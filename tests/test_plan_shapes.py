"""Plan-shape tests (SURVEY §5.5): guard the physical-plan claims that make
the engine scale — partition pruning, filter pushdown, broadcast joins,
shuffle-free narrow ops.  These catch regressions Catalyst won't warn about.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.functions.dedup import minhash_signature, simhash
from etl_opensky_spark.operators.joins import lookup_dim
from etl_opensky_spark.sources.sinks import write_parquet_partitioned


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lake") / "flights")
    df = spark.createDataFrame(
        [(2018, 1, d, f"v{d}") for d in range(1, 10)],
        "flight_year int, flight_month int, flight_day int, v string",
    )
    write_parquet_partitioned(df, path, ["flight_year", "flight_month", "flight_day"])
    return path


def test_partition_pruning_in_plan(spark, lake):
    df = spark.read.parquet(lake).filter(
        (F.col("flight_year") == 2018)
        & (F.col("flight_month") == 1)
        & (F.col("flight_day") == 3)
    )
    plan = physical_plan(df)
    # equality predicates on partition columns must appear as PartitionFilters
    assert "PartitionFilters" in plan
    assert "flight_day" in plan.split("PartitionFilters")[1][:300]


def test_filter_pushdown_to_parquet(spark, lake):
    df = spark.read.parquet(lake).filter(F.col("v") == "v3").select("v")
    plan = physical_plan(df)
    assert "PushedFilters: [IsNotNull(v), EqualTo(v,v3)" in plan.replace("'", "")


def test_column_pruning_read_schema(spark, lake):
    df = spark.read.parquet(lake).select("v")
    plan = physical_plan(df)
    # ReadSchema must contain only the projected column
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "v:string" in read_schema.replace(" ", "")


def test_lookup_dim_broadcasts(spark):
    fact = spark.range(1000).withColumnRenamed("id", "k")
    dim = spark.createDataFrame([(i, f"n{i}") for i in range(10)], "dk long, name string")
    out = lookup_dim(fact, dim, "k", "dk", attach={"name": "dim_name"})
    assert "BroadcastHashJoin" in physical_plan(out)


def test_minhash_signature_no_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = physical_plan(minhash_signature(docs, "doc_id", "text"))
    assert "Exchange" not in plan


def test_simhash_no_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = physical_plan(simhash(docs, "doc_id", "text"))
    assert "Exchange" not in plan


def test_whole_stage_codegen_active(spark):
    df = (
        spark.range(100)
        .withColumn("x", F.col("id") * 2)
        .filter(F.col("x") > 10)
        .groupBy((F.col("id") % 10).alias("g"))
        .count()
    )
    df.collect()  # AQE finalizes the plan (and codegen spans) on execution
    # whole-stage-codegen'd operators are starred "*(n)" in the plan string
    assert "*(1)" in physical_plan(df)
