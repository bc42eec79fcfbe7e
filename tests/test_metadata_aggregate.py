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


# --- round 9: where-box pruned metadata aggregation ------------------------


class TestWhereBox:
    def _clustered(self, spark, tmp_path):
        """Two value clusters, range-clustered so each file owns one:
        file-aligned boxes are provable, cutting boxes refuse."""
        base = str(tmp_path / "clustered")
        df = spark.range(0, 100).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).cast("double").alias("v"),
        ).union(
            spark.range(1000, 1100).select(
                F.col("id").alias("k"),
                (F.col("id") * 2).cast("double").alias("v"),
            )
        )
        write_version(
            df.repartitionByRange(2, "k"), base, stats_cols=["k", "v"]
        )
        return base

    def test_file_aligned_box_counts_exactly(self, spark, tmp_path):
        base = self._clustered(spark, tmp_path)
        agg = metadata_aggregate(base, ["k"], where={"k": (0, 500)})
        assert agg["rows"] == 100
        assert agg["k"] == {"count": 100, "min": 0, "max": 99}
        hi = metadata_aggregate(base, ["k"], where={"k": (500, None)})
        assert hi["rows"] == 100
        assert (hi["k"]["min"], hi["k"]["max"]) == (1000, 1099)

    def test_cutting_box_refuses(self, spark, tmp_path):
        base = self._clustered(spark, tmp_path)
        with pytest.raises(ValueError, match="cuts file"):
            metadata_aggregate(base, ["k"], where={"k": (0, 50)})

    def test_disjoint_box_counts_zero(self, spark, tmp_path):
        base = self._clustered(spark, tmp_path)
        agg = metadata_aggregate(base, ["k"], where={"k": (5000, 9000)})
        assert agg["rows"] == 0

    def test_partition_value_box(self, spark, tmp_path):
        """Partition columns carry no footer stats but resolve exactly
        from the directory path — the Delta metadata-only partition
        count."""
        base = str(tmp_path / "parts")
        df = spark.range(0, 120).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("int").alias("p"),
        )
        write_version(
            df, base, partition_by=["p"], stats_cols=["k"]
        )
        agg = metadata_aggregate(base, ["k"], where={"p": (0, 0)})
        assert agg["rows"] == 40
        assert agg["k"]["count"] == 40
        two = metadata_aggregate(base, ["k"], where={"p": (1, 2)})
        assert two["rows"] == 80

    def test_null_bearing_column_refuses(self, spark, tmp_path):
        """Nulls in a bounded column drop rows the stats can't count —
        refuse rather than approximate."""
        base = str(tmp_path / "nulls")
        df = spark.range(0, 50).select(
            F.when(F.col("id") % 10 == 0, None)
            .otherwise(F.col("id")).alias("k"),
            F.col("id").alias("w"),
        )
        write_version(df.coalesce(1), base, stats_cols=["k", "w"])
        with pytest.raises(ValueError, match="cuts file"):
            metadata_aggregate(base, ["w"], where={"k": (None, None)})
