"""Subset-column appends through the DS writer (round 10, Delta
parity): an appended frame may carry any SUBSET of the table's logical
columns — the staged files simply lack the missing columns, the commit
logs the full logical schema (so later reads cannot derive a narrow
schema from a narrow file), and the missing columns read back null
everywhere (engine read, DS read, metadata aggregates).  Unknown
columns still refuse by name — silent evolution stays in
``merge_versioned(merge_schema=True)``.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.lakesource import (
    HAS_DATASOURCE_API,
    register_versioned_source,
)
from etl_opensky_spark.sources.versioned import (
    _read_log,
    metadata_aggregate,
    read_version,
    write_version,
)

pytestmark = pytest.mark.skipif(
    not HAS_DATASOURCE_API, reason="pyspark-4 DS API required"
)


def _table(spark, base, stats_cols=()):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)],
        "id long, v string, score double",
    )
    write_version(df, base, stats_cols=stats_cols)


class TestSubsetAppend:
    def test_missing_column_reads_null(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _table(spark, base)
        register_versioned_source(spark)
        spark.createDataFrame(
            [(3, "c")], "id long, v string"
        ).write.format("versioned").mode("append").save(base)
        # the commit logged the FULL logical schema
        assert set(
            f["name"]
            for f in json.loads(_read_log(base)[-1]["schema_json"])[
                "fields"
            ]
        ) == {"id", "v", "score"}
        got = {
            r["id"]: (r["v"], r["score"])
            for r in read_version(spark, base).collect()
        }
        assert got[3] == ("c", None)
        assert got[1] == ("a", 10.0)
        # DS read agrees (reader null-fills the narrow file)
        ds = {
            r["id"]: r["score"]
            for r in spark.read.format("versioned").load(base).collect()
        }
        assert ds == {1: 10.0, 2: 20.0, 3: None}

    def test_unknown_column_refuses_by_name(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _table(spark, base)
        register_versioned_source(spark)
        with pytest.raises(Exception, match="do not exist"):
            spark.createDataFrame(
                [(3, "c", "x")], "id long, v string, wrong string"
            ).write.format("versioned").mode("append").save(base)

    def test_metadata_aggregate_stays_exact(self, spark, tmp_path):
        """The appended file's absent column is recorded as all-null
        stats, so COUNT(score) stays provable from the manifest."""
        base = str(tmp_path / "lake")
        _table(spark, base, stats_cols=("score",))
        register_versioned_source(spark)
        spark.createDataFrame(
            [(3, "c"), (4, "d")], "id long, v string"
        ).write.format("versioned").mode("append").save(base)
        out = metadata_aggregate(base, ["score"])
        assert out["rows"] == 4
        assert out["score"]["count"] == 2  # appended rows: null score
        assert out["score"]["min"] == 10.0
        assert out["score"]["max"] == 20.0

    def test_stream_sink_survives_table_evolution(self, spark, tmp_path):
        """Mid-stream table evolution no longer kills the stream: the
        next batch's fresh writer sees its schema as a SUBSET of the
        evolved tip and appends with the new column null."""
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructType,
        )

        from etl_opensky_spark.sources.lakesource import (
            VersionedLakeStreamWriter,
        )
        from etl_opensky_spark.sources.versioned import merge_versioned

        import pyarrow as pa

        base = str(tmp_path / "lake")
        write_version(
            spark.createDataFrame([(1, "a")], "id long, v string"), base
        )
        sch = StructType().add("id", LongType()).add("v", StringType())

        def writer():
            return VersionedLakeStreamWriter(
                {"path": base, "appId": "ev"}, sch, False
            )

        def stage(rows):
            batch = pa.RecordBatch.from_pydict(
                {
                    "id": pa.array([r[0] for r in rows], pa.int64()),
                    "v": pa.array([r[1] for r in rows], pa.string()),
                }
            )
            return writer().write(iter([batch]))

        writer().commit([stage([(2, "b")])], 0)
        merge_versioned(
            spark, base,
            spark.createDataFrame(
                [(1, "a", "x")], "id long, v string, extra string"
            ),
            ["id"], merge_schema=True,
        )
        writer().commit([stage([(3, "c")])], 1)  # continues, no refusal
        got = {
            r["id"]: (r["v"], r["extra"])
            for r in read_version(spark, base).collect()
        }
        assert got[1] == ("a", "x")
        assert got[3] == ("c", None)
