"""Manifest-only aggregation (versioned.metadata_aggregate)."""

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    compact_versioned,
    merge_versioned,
    metadata_aggregate,
    purge_versioned_mor,
    rename_column,
    write_version,
)


@pytest.fixture()
def lake(spark, tmp_path):
    base = str(tmp_path / "lake")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id").cast("double") / 4)
        .alias("v"),
        (F.col("id") % 4).alias("p"),
    ).repartitionByRange(4, "k")
    write_version(df, base, stats_cols=["k", "v"])
    return base


def test_exact_from_manifest(spark, lake):
    got = metadata_aggregate(lake, ["k", "v"])
    assert got["rows"] == 1000
    assert got["k"] == {"count": 1000, "min": 0, "max": 999}
    assert got["v"]["count"] == 900  # 100 nulls
    assert got["v"]["min"] == 0.25 and got["v"]["max"] == 999.0 / 4


def test_survives_merge_and_rename(spark, lake):
    merge_versioned(
        spark,
        lake,
        spark.createDataFrame([(2000, 999.0, 0)], "k long, v double, p long"),
        ["k"],
        stats_cols=["k", "v"],
    )
    rename_column(spark, lake, {"k": "key"})
    got = metadata_aggregate(lake, ["key", "v"])
    assert got["rows"] == 1001
    assert got["key"]["max"] == 2000
    # and time travel still answers the OLD snapshot
    assert metadata_aggregate(lake, ["k"], as_of=1)["rows"] == 1000


def test_tombstones_refuse_then_compaction_heals(spark, lake):
    purge_versioned_mor(
        spark, lake, spark.createDataFrame([(1,), (2,)], "k long"), ["k"]
    )
    with pytest.raises(ValueError, match="tombstones"):
        metadata_aggregate(lake, ["k"])
    compact_versioned(spark, lake, stats_cols=["k", "v"])
    assert metadata_aggregate(lake, ["k"])["rows"] == 998


def test_unprovable_cases_refuse(spark, lake, tmp_path):
    with pytest.raises(ValueError, match="no stats for column"):
        metadata_aggregate(lake, ["p"])  # never harvested
    base2 = str(tmp_path / "nostats")
    write_version(spark.range(3), base2)
    with pytest.raises(ValueError, match="no harvested stats"):
        metadata_aggregate(base2, [])
