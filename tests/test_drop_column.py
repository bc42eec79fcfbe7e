"""DROP COLUMN (round 10): metadata-only, Delta column-mapping
semantics — files untouched, the commit logs a schema without the
column; RE-ADDING the name later is safe because schema evolution
freezes a version-unique physical name for every new column, so stale
bytes in adopted files can never resurface as the new column.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    _read_log,
    add_constraint,
    bloom_coverage,
    drop_column,
    merge_versioned,
    metadata_aggregate,
    read_version,
    write_version,
)

from .conftest import rows


def _seed(spark, base, **kw):
    df = spark.createDataFrame(
        [(1, "a", 10.0, 0), (2, "b", 20.0, 1), (3, "c", 30.0, 0)],
        "id long, v string, score double, p int",
    )
    write_version(df, base, **kw)


class TestDrop:
    def test_drop_and_time_travel(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, base)
        v = drop_column(spark, base, "score")
        assert v == 2
        assert _read_log(base)[-1]["op"] == "drop_column"
        tip = read_version(spark, base)
        assert set(tip.columns) == {"id", "v", "p"}
        # the old version still carries the column
        old = read_version(spark, base, as_of=1)
        assert set(old.columns) == {"id", "v", "score", "p"}
        assert rows(old.select("id", "score"))[0] == (1, 10.0)

    def test_metadata_aggregate_refuses_dropped(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, base, stats_cols=("score", "id"))
        drop_column(spark, base, "score")
        with pytest.raises(ValueError, match="no stats for column"):
            metadata_aggregate(base, ["score"])
        # remaining stats still work
        assert metadata_aggregate(base, ["id"])["rows"] == 3

    def test_guards(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        df = spark.createDataFrame(
            [(1, "a", 0)], "id long, v string, p int"
        )
        write_version(df, base, partition_by=("p",))
        with pytest.raises(ValueError, match="partition column"):
            drop_column(spark, base, "p")
        with pytest.raises(ValueError, match="not in columns"):
            drop_column(spark, base, "nope")
        add_constraint(spark, base, "v_set", "v IS NOT NULL")
        with pytest.raises(ValueError, match="CHECK"):
            drop_column(spark, base, "v")

    def test_tombstone_key_guard(self, spark, tmp_path):
        from etl_opensky_spark.sources.versioned import (
            purge_versioned_mor,
        )

        base = str(tmp_path / "lake")
        _seed(spark, base)
        purge_versioned_mor(
            spark, base, spark.createDataFrame([(1,)], "id long"),
            ["id"],
        )
        with pytest.raises(ValueError, match="keyed tombstone"):
            drop_column(spark, base, "id")
        # non-key columns drop fine over MOR state
        v = drop_column(spark, base, "score")
        got = rows(read_version(spark, base).select("id", "v"))
        assert got == [(2, "b"), (3, "c")] and v == 3

    def test_bloom_sidecar_dropped_with_indexed_col(
        self, spark, tmp_path
    ):
        base = str(tmp_path / "lake")
        df = spark.createDataFrame(
            [(i, f"v{i}", float(i)) for i in range(50)],
            "id long, v string, score double",
        )
        write_version(df, base, bloom_cols=("id",))
        assert bloom_coverage(base) is not None
        drop_column(spark, base, "id")
        assert bloom_coverage(base) is None


class TestReAdd:
    def test_readd_partitioned_reads_null_not_stale(
        self, spark, tmp_path
    ):
        """THE hazard this design exists for: drop, then re-add the
        same name via partitioned merge_schema (adopted files still
        physically hold the old bytes) — old rows must read NULL, not
        the dropped values; the evolved column gets a version-unique
        physical name."""
        base = str(tmp_path / "lake")
        _seed(spark, base, partition_by=("p",))
        drop_column(spark, base, "score")
        merge_versioned(
            spark, base,
            spark.createDataFrame(
                [(1, "a", 999.0, 0)],
                "id long, v string, score double, p int",
            ),
            ["id"], partition_by=("p",), merge_schema=True,
            keys_are_partition_stable=True,
        )
        got = {
            r["id"]: r["score"]
            for r in read_version(spark, base).collect()
        }
        assert got == {1: 999.0, 2: None, 3: None}  # no stale 20/30!
        entry = _read_log(base)[-1]
        assert entry["column_mapping"]["score"].startswith("score__v")

    def test_readd_unpartitioned_full_rewrite(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _seed(spark, base)
        drop_column(spark, base, "score")
        merge_versioned(
            spark, base,
            spark.createDataFrame(
                [(2, "b", 777.0, 1)],
                "id long, v string, score double, p int",
            ),
            ["id"], merge_schema=True,
        )
        got = {
            r["id"]: r["score"]
            for r in read_version(spark, base).collect()
        }
        assert got == {1: None, 2: 777.0, 3: None}

    def test_ds_read_after_readd(self, spark, tmp_path):
        from etl_opensky_spark.sources.lakesource import (
            register_versioned_source,
        )

        base = str(tmp_path / "lake")
        _seed(spark, base, partition_by=("p",))
        drop_column(spark, base, "score")
        merge_versioned(
            spark, base,
            spark.createDataFrame(
                [(3, "c", 5.5, 0)],
                "id long, v string, score double, p int",
            ),
            ["id"], partition_by=("p",), merge_schema=True,
            keys_are_partition_stable=True,
        )
        register_versioned_source(spark)
        got = {
            r["id"]: r["score"]
            for r in spark.read.format("versioned").load(base).collect()
        }
        assert got == {1: None, 2: None, 3: 5.5}


class TestPhysicalRetirement:
    def test_compact_purges_dropped_bytes(self, spark, tmp_path):
        """The docstring's GDPR story: DROP is metadata-only, the
        bytes persist until a full rewrite — and compact_versioned
        actually retires them (the new snapshot's files physically
        lack the column)."""
        import os

        import pyarrow.parquet as pq

        from etl_opensky_spark.sources.versioned import (
            _current,
            _live_files,
            compact_versioned,
        )

        base = str(tmp_path / "lake")
        _seed(spark, base)
        drop_column(spark, base, "score")
        # pre-compact: the bytes are still in the files
        cur = _current(base)
        assert any(
            "score" in pq.read_schema(p).names
            for p in _live_files(base, cur).values()
        )
        compact_versioned(spark, base)
        cur = _current(base)
        phys_cols = {
            n
            for p in _live_files(base, cur).values()
            for n in pq.read_schema(p).names
        }
        assert "score" not in phys_cols  # bytes gone
        got = rows(read_version(spark, base).select("id", "v"))
        assert got == [(1, "a"), (2, "b"), (3, "c")]
