"""Batch-17: XML source/sink, hash-shard writer with manifest."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_xml_roundtrip_escapes_markup(spark, tmp_path):
    from etl_opensky_spark.sources.files import read_xml, write_xml

    df = spark.createDataFrame(
        [(1, "a <b> & 'c' \"d\""), (2, None), (3, "plain")], ["id", "v"]
    )
    write_xml(df, str(tmp_path / "x"), row_tag="r")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    back = read_xml(spark, str(tmp_path / "x"), schema, row_tag="r")
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [
        (1, "a <b> & 'c' \"d\""),
        (2, None),
        (3, "plain"),
    ]


def test_hash_shards_roundtrip_and_manifest(spark, tmp_path):
    from etl_opensky_spark.sources.sinks import write_hash_shards

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], ["id", "txt"]
    )
    target = str(tmp_path / "shards")
    manifest = write_hash_shards(df, target, "id", 4, hash_cols=["id", "txt"])
    rows = manifest.collect()
    assert sum(r["n_rows"] for r in rows) == 200
    assert {r["shard"] for r in rows} <= set(range(4))

    # shard assignment is a pure md5 function of the key — recompute it
    back = spark.read.parquet(target).collect()
    for r in back:
        expect = int(hashlib.md5(str(r["id"]).encode()).hexdigest()[:8], 16) % 4
        assert r["shard"] == expect
    assert sorted((r["id"], r["txt"]) for r in back) == [
        (i, f"text {i}") for i in range(200)
    ]


def test_hash_shards_rerun_is_idempotent(spark, tmp_path):
    from etl_opensky_spark.sources.sinks import write_hash_shards

    df = spark.createDataFrame([(i, f"t{i}") for i in range(50)], ["id", "txt"])
    target = str(tmp_path / "shards")
    m1 = sorted(tuple(r) for r in write_hash_shards(df, target, "id", 3).collect())
    m2 = sorted(tuple(r) for r in write_hash_shards(df, target, "id", 3).collect())
    assert m1 == m2
    assert spark.read.parquet(target).count() == 50


def test_try_arithmetic_null_channels(spark):
    """try_divide/try_cast/try_add return NULL (never raise) on zero
    divisor, malformed cast, and bigint overflow."""
    df = spark.range(1).select(
        F.try_divide(F.lit(1.0), F.lit(0)).alias("d"),
        F.lit("nope").try_cast("int").alias("c"),
        F.try_add(F.lit(1).cast("long"), F.lit(9223372036854775807)).alias("o"),
    )
    [r] = df.collect()
    assert (r["d"], r["c"], r["o"]) == (None, None, None)


def test_bottom_k_sample_is_mergeable_and_deterministic(spark):
    from etl_opensky_spark.functions.sampling import bottom_k_sample

    df = spark.createDataFrame([(i, f"v{i}") for i in range(500)], ["id", "v"])
    s1 = sorted(r["id"] for r in bottom_k_sample(df, "id", 20).collect())
    s2 = sorted(
        r["id"]
        for r in bottom_k_sample(df.repartition(7), "id", 20).collect()
    )
    assert s1 == s2  # partitioning-invariant

    # mergeability: bottom-k of union == bottom-k of merged bottom-k's
    a = df.filter(F.col("id") < 250)
    b = df.filter(F.col("id") >= 250)
    merged = bottom_k_sample(
        bottom_k_sample(a, "id", 20).unionByName(
            bottom_k_sample(b, "id", 20)
        ),
        "id",
        20,
    )
    assert sorted(r["id"] for r in merged.collect()) == s1


def test_bottom_k_sample_plans_as_take_ordered(spark):
    from etl_opensky_spark.functions.sampling import bottom_k_sample

    df = spark.createDataFrame([(i,) for i in range(1000)], ["id"]).repartition(8)
    out = bottom_k_sample(df, "id", 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan  # partial per-partition top-k, no global sort
