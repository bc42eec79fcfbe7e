"""GENERATED IDENTITY columns (operators/keys.assign_identity + lake).

Contract: uniqueness + a PROVABLE dense range [start, start+n) — which
row gets which id depends on partitioning (Delta makes no ordering
promise either).  The lake persists the high-water mark in the commit
log so appends/merges continue where the last write stopped.
"""

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.operators.keys import assign_identity
from etl_opensky_spark.sources.versioned import (
    _current,
    compact_versioned,
    copy_into,
    merge_versioned,
    read_version,
    rename_column,
    write_version,
)


def _ids(spark, base):
    col = _current(base)["identity"]["col"]
    return sorted(r[col] for r in read_version(spark, base).collect())


def test_assign_identity_dense_any_partitioning(spark):
    df = spark.range(0, 997).repartition(13).select(F.col("id").alias("x"))
    out = assign_identity(df, 42, "rid")
    got = [r["rid"] for r in out.collect()]
    assert sorted(got) == list(range(42, 42 + 997))


def test_write_then_copy_into_continues_range(spark, tmp_path):
    base = str(tmp_path / "lake")
    landing = str(tmp_path / "landing")
    df = spark.createDataFrame(
        [(f"a{i}",) for i in range(10)], "name string"
    )
    write_version(df, base, identity_col="id")
    assert _current(base)["identity"] == {"col": "id", "next": 11}
    spark.createDataFrame(
        [(f"b{i}",) for i in range(5)], "name string"
    ).coalesce(1).write.parquet(landing)
    copy_into(spark, base, landing)
    assert _ids(spark, base) == list(range(1, 16))
    assert _current(base)["identity"]["next"] == 16
    # idempotent re-run mints nothing
    copy_into(spark, base, landing)
    assert _current(base)["identity"]["next"] == 16


def test_merge_keeps_matched_ids_and_mints_new(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame(
            [("k1", 10), ("k2", 20)], "k string, v int"
        ),
        base,
        identity_col="id",
    )
    before = {
        r["k"]: r["id"] for r in read_version(spark, base).collect()
    }
    merge_versioned(
        spark,
        base,
        spark.createDataFrame(
            [("k2", 99), ("k3", 30)], "k string, v int"
        ),
        ["k"],
    )
    after = {
        r["k"]: (r["id"], r["v"])
        for r in read_version(spark, base).collect()
    }
    assert after["k2"] == (before["k2"], 99)  # updated row keeps its id
    assert after["k3"][0] == 3               # fresh id from the mark
    assert _current(base)["identity"]["next"] == 4


def test_generated_always_rejects_supplied_values(spark, tmp_path):
    base = str(tmp_path / "lake")
    df = spark.createDataFrame([("a", 1)], "name string, id int")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_version(df, base, identity_col="id")
    write_version(df.drop("id"), base, identity_col="id")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        merge_versioned(
            spark,
            base,
            spark.createDataFrame([("a", 7)], "name string, id int"),
            ["name"],
        )


def test_rider_survives_compact_and_rename(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([(f"x{i}",) for i in range(4)],
                              "name string"),
        base,
        identity_col="id",
    )
    compact_versioned(spark, base)
    assert _current(base)["identity"]["next"] == 5
    rename_column(spark, base, {"id": "row_id"})
    assert _current(base)["identity"] == {"col": "row_id", "next": 5}
    merge_versioned(
        spark,
        base,
        spark.createDataFrame([("x9",)], "name string"),
        ["name"],
    )
    got = read_version(spark, base)
    assert "row_id" in got.columns
    assert sorted(r["row_id"] for r in got.collect()) == [1, 2, 3, 4, 5]
