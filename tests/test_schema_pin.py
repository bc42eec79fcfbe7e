"""Round-11 optimization P4: every root commit pins `schema_json` so
reads plan from the manifest instead of a parquet footer-inference
job.  The pin makes the commit schema the READ schema, so writers must
enforce it: updates/landing batches whose common columns silently
drifted in TYPE (decimal arithmetic widens: DECIMAL(18,2) * 2 stages
DECIMAL(20,2)) are cast back to the table's logical types before
staging — Delta write semantics.  Without the cast, staged
FIXED_LEN_BYTE_ARRAY decimals are unreadable under the pinned narrow
type (the q305 failure this fixes)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    _read_log,
    copy_into,
    merge_versioned,
    read_version,
    write_version,
)

from .conftest import rows


def _seed(spark, base, **kw):
    df = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1), (3, "c", 0), (4, "d", 1)],
        "k int, v string, bucket int",
    ).select(
        "k",
        F.col("k").cast("decimal(18,2)").alias("price"),
        "bucket",
    ).coalesce(1)
    write_version(df, base, **kw)


class TestSchemaPin:
    def test_root_commits_pin_schema(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, base)
        entry = _read_log(base)[-1]
        doc = json.loads(entry["schema_json"])
        assert [f["name"] for f in doc["fields"]] == [
            "k", "price", "bucket"
        ]
        # canonical form: all-nullable, no metadata (so the semantic
        # drift TEXT comparison never sees phantom nullability drift)
        assert all(f["nullable"] for f in doc["fields"])
        assert all(f["metadata"] == {} for f in doc["fields"])

    def test_merge_casts_widened_updates_to_table_type(
        self, spark, tmp_path
    ):
        base = str(tmp_path / "lake")
        _seed(spark, base, partition_by=("bucket",))
        tip0 = read_version(spark, base)
        # price * 2 silently widens to a larger decimal precision —
        # the staged files must come back down to the pinned (18,2)
        upd = tip0.filter("bucket = 0").withColumn(
            "price", F.col("price") * 2
        )
        assert dict(upd.dtypes)["price"] != "decimal(18,2)"
        merge_versioned(
            spark, base, upd, ["k"], partition_by=("bucket",),
            keys_are_partition_stable=True,
        )
        tip = read_version(spark, base)
        assert dict(tip.dtypes)["price"] == "decimal(18,2)"
        got = {r[0]: float(r[1]) for r in rows(tip.select("k", "price"))}
        assert got == {1: 2.0, 2: 2.0, 3: 6.0, 4: 4.0}

    def test_merge_unpartitioned_casts_too(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, base)
        upd = read_version(spark, base).filter("k = 1").withColumn(
            "price", F.col("price") + 1000
        )
        merge_versioned(spark, base, upd, ["k"])
        tip = read_version(spark, base)
        assert dict(tip.dtypes)["price"] == "decimal(18,2)"
        got = {r[0]: float(r[1]) for r in rows(tip.select("k", "price"))}
        assert got == {1: 1001.0, 2: 2.0, 3: 3.0, 4: 4.0}

    def test_copy_into_casts_drifted_landing_files(
        self, spark, tmp_path
    ):
        base = str(tmp_path / "lake")
        _seed(spark, base)
        land = str(tmp_path / "land")
        spark.createDataFrame([(9, "z", 0)], "k int, v string, bucket int").select(
            "k",
            (F.col("k").cast("decimal(18,2)") * 5).alias("price"),
            "bucket",
        ).coalesce(1).write.parquet(land)
        v, n = copy_into(spark, base, land)
        assert n == 1
        tip = read_version(spark, base)
        assert dict(tip.dtypes)["price"] == "decimal(18,2)"
        got = {r[0]: float(r[1]) for r in rows(tip.select("k", "price"))}
        assert got[9] == 45.0
        assert len(got) == 5
