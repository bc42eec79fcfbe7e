"""ALTER COLUMN TYPE widening (round 11): metadata-only, Delta
type-widening semantics — files untouched, the commit logs a schema
with the WIDER logical types and Spark's vectorized parquet reader
(and the DS reader's arrow cast) widens each narrow physical value at
scan time.  Old versions keep the narrow types; files appended after
the widen store the wide type physically and the manifest mixes both
eras indefinitely.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    LogicalConflictError,
    _read_log,
    compact_versioned,
    copy_into,
    merge_versioned,
    metadata_aggregate,
    prune_files,
    read_version,
    read_version_eq,
    table_changes,
    widen_column_type,
    write_version,
)

from .conftest import rows


def _seed(spark, base, **kw):
    df = spark.createDataFrame(
        [(1, "a", 1.5, 0), (2, "b", 2.5, 1), (3, "c", 3.5, 0)],
        "id int, v string, score float, p int",
    ).coalesce(1)
    write_version(df, base, **kw)


class TestWiden:
    def test_widen_and_time_travel(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, base)
        v = widen_column_type(
            spark, base, {"id": "bigint", "score": "double"}
        )
        assert v == 2
        assert _read_log(base)[-1]["op"] == "widen"
        tip = read_version(spark, base)
        assert dict(tip.dtypes) == {
            "id": "bigint", "v": "string", "score": "double", "p": "int"
        }
        # values read widened, bit-exactly (float32 1.5/2.5/3.5 are
        # dyadic: their double promotion is the same literal)
        assert sorted(rows(tip.select("id", "score"))) == [
            (1, 1.5), (2, 2.5), (3, 3.5)
        ]
        old = read_version(spark, base, as_of=1)
        assert dict(old.dtypes)["id"] == "int"
        assert dict(old.dtypes)["score"] == "float"

    def test_stats_survive_widen(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, base, stats_cols=("id", "score"))
        widen_column_type(spark, base, {"id": "bigint"})
        agg = metadata_aggregate(base, ["id", "score"])
        assert agg["rows"] == 3
        assert agg["id"] == {"count": 3, "min": 1, "max": 3}
        kept, total = prune_files(base, {"id": (5, None)})
        assert kept == [] and total >= 1

    def test_date_to_timestamp_stats_normalized(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        df = spark.createDataFrame(
            [("2020-01-01",), ("2020-01-05",)], "ds string"
        ).select(F.col("ds").cast("date").alias("d"))
        write_version(df, base, stats_cols=("d",))
        widen_column_type(spark, base, {"d": "timestamp_ntz"})
        agg = metadata_aggregate(base, ["d"])
        assert agg["d"]["min"] == "2020-01-01T00:00:00"
        assert agg["d"]["max"] == "2020-01-05T00:00:00"
        # the midnight edge that motivates the normalization: a lower
        # bound at EXACTLY max-midnight must keep the file ("2020-01-05"
        # < "2020-01-05T00:00:00" lexicographically would wrongly
        # prove it disjoint)
        kept, _ = prune_files(base, {"d": ("2020-01-05T00:00:00", None)})
        assert kept  # the file holds a row equal to the bound
        out = rows(read_version(spark, base).orderBy("d"))
        assert str(out[0][0]) == "2020-01-01 00:00:00"

    def test_append_after_widen_mixes_eras(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, base, stats_cols=("id",))
        widen_column_type(spark, base, {"id": "bigint"})
        # a post-widen append carries values OUTSIDE the narrow range
        land = str(tmp_path / "land")
        spark.createDataFrame(
            [(2**40, "w", 9.5, 2)],
            "id long, v string, score float, p int",
        ).write.parquet(land)
        copy_into(spark, base, land, stats_cols=("id",))
        tip = read_version(spark, base)
        assert dict(tip.dtypes)["id"] == "bigint"
        assert tip.count() == 4
        assert tip.agg(F.max("id")).first()[0] == 2**40
        agg = metadata_aggregate(base, ["id"])
        assert agg["id"]["max"] == 2**40 and agg["rows"] == 4

    def test_compact_materializes_wide_type(self, spark, tmp_path):
        import glob

        import pyarrow.parquet as pq

        base = str(tmp_path / "lake")
        _seed(spark, base)
        widen_column_type(spark, base, {"id": "bigint"})
        compact_versioned(spark, base)
        # every physical file of the compacted snapshot stores int64
        files = [
            p
            for p in glob.glob(base + "/data-*/**/*.parquet", recursive=True)
        ]
        entry = _read_log(base)[-1]
        live = [p for p in files if "/" + entry["dir"] + "/" in p]
        assert live
        for p in live:
            sch = pq.read_schema(p)
            assert str(sch.field("id").type) == "int64"
        assert read_version(spark, base).agg(F.sum("id")).first()[0] == 6

    def test_merge_after_widen(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, base)
        widen_column_type(spark, base, {"id": "bigint", "score": "double"})
        merge_versioned(
            spark, base,
            spark.createDataFrame(
                [(2, "B", 9.25, 1)], "id long, v string, score double, p int"
            ),
            ["id"],
        )
        got = {r[0]: (r[1], r[2]) for r in rows(
            read_version(spark, base).select("id", "v", "score")
        )}
        assert got[2] == ("B", 9.25)
        assert got[1] == ("a", 1.5)

    def test_ds_reader_reads_widened(self, spark, tmp_path):
        from etl_opensky_spark.sources.lakesource import (
            register_versioned_source,
        )

        base = str(tmp_path / "lake")
        df = spark.createDataFrame(
            [(1, "2020-01-01", 1.5, 0), (2, "2020-03-04", 2.5, 1)],
            "id int, ds string, score float, p int",
        ).select(
            "id", F.col("ds").cast("date").alias("d"), "score", "p"
        )
        write_version(df, base, partition_by=("p",))
        widen_column_type(
            spark, base,
            {"id": "bigint", "score": "double", "d": "timestamp_ntz"},
        )
        register_versioned_source(spark)
        out = spark.read.format("versioned").load(base)
        assert dict(out.dtypes) == {
            "id": "bigint", "d": "timestamp_ntz", "score": "double",
            "p": "int",
        }
        got = sorted((r["id"], str(r["d"]), r["score"]) for r in out.collect())
        assert got == [
            (1, "2020-01-01 00:00:00", 1.5),
            (2, "2020-03-04 00:00:00", 2.5),
        ]

    def test_cdf_shows_no_row_changes(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, base)
        widen_column_type(spark, base, {"id": "bigint"})
        ch = table_changes(
            spark, base, ["id"], from_version=1, to_version=2
        )
        assert ch.count() == 0

    def test_bloom_lookup_survives_widen(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        df = spark.range(100).selectExpr(
            "cast(id as int) k", "cast(id as string) v"
        )
        write_version(df, base, bloom_cols=("k",))
        widen_column_type(spark, base, {"k": "bigint"})
        hit = read_version_eq(spark, base, "k", 42)
        assert rows(hit.filter(F.col("k") == 42).select("v")) == [("42",)]

    def test_refusals(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, base, partition_by=("p",))
        with pytest.raises(ValueError, match="partition column"):
            widen_column_type(spark, base, {"p": "bigint"})
        with pytest.raises(ValueError, match="not in columns"):
            widen_column_type(spark, base, {"nope": "bigint"})
        with pytest.raises(ValueError, match="not a supported widening"):
            widen_column_type(spark, base, {"id": "int"})  # same type
        with pytest.raises(ValueError, match="not a supported widening"):
            widen_column_type(spark, base, {"v": "bigint"})
        with pytest.raises(ValueError, match="not a supported widening"):
            widen_column_type(spark, base, {"score": "float"})
        with pytest.raises(ValueError, match="not a supported widening"):
            # long needs 20 integer digits; decimal(10,0) has 10
            widen_column_type(spark, base, {"id": "decimal(9,0)"})

    def test_identity_col_integral_only(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        df = spark.createDataFrame([("a",), ("b",)], "v string")
        write_version(df, base, identity_col="rid")
        # the minted type is bigint, so decimal(38,0) passes the
        # widening matrix and must then hit the identity guard
        with pytest.raises(ValueError, match="GENERATED IDENTITY"):
            widen_column_type(spark, base, {"rid": "decimal(38,0)"})

    def test_tombstone_key_guard(self, spark, tmp_path):
        from etl_opensky_spark.sources.versioned import purge_versioned_mor

        base = str(tmp_path / "lake")
        _seed(spark, base)
        purge_versioned_mor(
            spark, base, spark.createDataFrame([(1,)], "id int"), ["id"]
        )
        with pytest.raises(ValueError, match="tombstone"):
            widen_column_type(spark, base, {"id": "bigint"})

    def test_concurrent_merge_conflicts_on_widen(self, spark, tmp_path):
        """A merge staged against the narrow schema must NOT rebase
        over a widen winner — semantic drift defeats rebasing."""
        from etl_opensky_spark.sources import versioned as V

        base = str(tmp_path / "lake")
        _seed(spark, base, partition_by=("p",))

        def interpose():
            # commit the widen between the merge's read and its PUT
            V._test_hooks.pop("before_commit", None)
            widen_column_type(spark, base, {"id": "bigint"})

        V._test_hooks["before_commit"] = interpose
        try:
            with pytest.raises(LogicalConflictError, match="schema"):
                merge_versioned(
                    spark, base,
                    spark.createDataFrame(
                        [(9, "z", 9.5, 0)],
                        "id int, v string, score float, p int",
                    ),
                    ["id"], partition_by=("p",),
                    keys_are_partition_stable=True,
                )
        finally:
            V._test_hooks.pop("before_commit", None)
