"""Partitioned COPY INTO (round 11): hive-partitioned tables append
partition-shaped — the batch stages under the table's own layout and
each staged part links into its partition directory, so the snapshot
stays one partition-prunable scan.  The append-only event-ingest
pattern at 100 TB: day-partitioned tables grow by blind file appends,
never by merge rewrites.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    LogicalConflictError,
    _read_log,
    _test_hooks,
    bloom_coverage,
    copy_into,
    merge_versioned,
    metadata_aggregate,
    prune_files,
    read_version,
    read_version_eq,
    table_changes,
    write_version,
)

from .conftest import rows


@pytest.fixture(autouse=True)
def _clean_hooks():
    yield
    _test_hooks.pop("before_commit", None)


def _land(spark, tmp_path, name, lo, hi):
    d = str(tmp_path / name)
    spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("int").alias("day"),
        (F.col("id") * 2).alias("v"),
    ).repartition(1).write.mode("overwrite").parquet(d)
    return d


class TestPartitionedCopyInto:
    def test_first_commit_and_append(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        v, n = copy_into(
            spark, base, _land(spark, tmp_path, "l1", 0, 20),
            partition_by=("day",),
        )
        assert (v, n) == (1, 1)
        # files live under hive partition dirs
        frels = list(_read_log(base)[-1]["files"])
        assert all(r.split("/")[0].startswith("day=") for r in frels)
        v, n = copy_into(spark, base, _land(spark, tmp_path, "l2", 20, 30))
        assert (v, n) == (2, 1)
        tip = read_version(spark, base)
        assert tip.count() == 30
        assert tip.agg(F.sum("v")).first()[0] == 30 * 29
        assert tip.filter(F.col("day") == 1).count() == 10

    def test_partition_pruning_and_metadata(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        copy_into(
            spark, base, _land(spark, tmp_path, "l1", 0, 30),
            stats_cols=("k",), partition_by=("day",),
        )
        # the scan prunes partition DIRECTORIES
        plan = (
            read_version(spark, base)
            .filter(F.col("day") == 2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PartitionFilters" in plan
        # partition-box metadata aggregates are exact (path-resolved)
        agg = metadata_aggregate(base, ["k"], where={"day": (1, 1)})
        assert agg["rows"] == 10
        # manifest stats skip by partition value too
        kept, total = prune_files(base, {"day": (2, 2)})
        assert kept and all(r.startswith("day=2/") for r in kept)

    def test_idempotent_rerun(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        land = _land(spark, tmp_path, "l1", 0, 10)
        copy_into(spark, base, land, partition_by=("day",))
        v, n = copy_into(spark, base, land)
        assert n == 0
        assert read_version(spark, base).count() == 10

    def test_merge_interop(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        copy_into(
            spark, base, _land(spark, tmp_path, "l1", 0, 10),
            partition_by=("day",),
        )
        merge_versioned(
            spark, base,
            spark.createDataFrame([(5, 2, 999)], "k long, day int, v long"),
            ["k"], partition_by=("day",), keys_are_partition_stable=True,
        )
        got = {r["k"]: r["v"] for r in read_version(spark, base).collect()}
        assert got[5] == 999 and got[4] == 8
        # append AFTER a merge keeps working
        copy_into(spark, base, _land(spark, tmp_path, "l2", 10, 13))
        assert read_version(spark, base).count() == 13

    def test_cdf_sees_appends_as_inserts(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        copy_into(
            spark, base, _land(spark, tmp_path, "l1", 0, 6),
            partition_by=("day",),
        )
        copy_into(spark, base, _land(spark, tmp_path, "l2", 6, 9))
        ch = table_changes(spark, base, ["k"], from_version=1)
        assert sorted(
            (r["k"], r["_change_type"]) for r in ch.collect()
        ) == [(6, "insert"), (7, "insert"), (8, "insert")]

    def test_bloom_extends_partitioned_appends(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        seed = spark.range(10).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("int").alias("day"),
            (F.col("id") * 2).alias("v"),
        )
        write_version(
            seed, base, partition_by=("day",), bloom_cols=("k",)
        )
        copy_into(spark, base, _land(spark, tmp_path, "l1", 100, 105))
        cov = bloom_coverage(base)
        assert cov is not None and cov["covered"] == cov["total"]
        hit = read_version_eq(spark, base, "k", 103)
        assert rows(hit.filter(F.col("k") == 103).select("v")) == [(206,)]

    def test_identity_minting(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        seed = spark.range(3).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("int").alias("day"),
            (F.col("id") * 2).alias("v"),
        )
        write_version(base=base, df=seed, partition_by=("day",),
                      identity_col="rid")
        copy_into(spark, base, _land(spark, tmp_path, "l1", 10, 14))
        out = read_version(spark, base)
        rids = sorted(r["rid"] for r in out.collect())
        assert rids == list(range(1, 8))  # dense, no re-mint

    def test_refusals(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        copy_into(
            spark, base, _land(spark, tmp_path, "l1", 0, 6),
            partition_by=("day",),
        )
        with pytest.raises(ValueError, match="authoritative"):
            copy_into(
                spark, base, _land(spark, tmp_path, "l2", 6, 9),
                partition_by=("other",),
            )
        # landing files lacking the partition column
        d = str(tmp_path / "nopart")
        spark.range(3).select(F.col("id").alias("k")).write.parquet(d)
        with pytest.raises(ValueError, match="partition column"):
            copy_into(spark, base, d)
        # null partition values
        dn = str(tmp_path / "nulls")
        spark.createDataFrame(
            [(1, None, 2)], "k long, day int, v long"
        ).write.parquet(dn)
        with pytest.raises(ValueError, match="null partition"):
            copy_into(spark, base, dn)

    def test_concurrent_partitioned_appends_both_commit(
        self, spark, tmp_path
    ):
        base = str(tmp_path / "lake")
        copy_into(
            spark, base, _land(spark, tmp_path, "l0", 0, 6),
            partition_by=("day",),
        )
        land_a = _land(spark, tmp_path, "la", 100, 105)
        land_b = _land(spark, tmp_path, "lb", 200, 205)

        def hook():
            _test_hooks.pop("before_commit", None)
            copy_into(spark, base, land_a)

        _test_hooks["before_commit"] = hook
        v, n = copy_into(spark, base, land_b)
        assert (v, n) == (3, 1)
        ks = sorted(r["k"] for r in read_version(spark, base).collect())
        assert ks == list(range(6)) + list(range(100, 105)) + list(
            range(200, 205)
        )

    def test_layout_change_mid_append_conflicts(self, spark, tmp_path):
        """An append staged under the hive layout cannot rebase onto a
        tip whose layout changed concurrently — mixed layouts in one
        snapshot would break the single-scan read."""
        base = str(tmp_path / "lake")
        copy_into(
            spark, base, _land(spark, tmp_path, "l0", 0, 6),
            partition_by=("day",),
        )
        flat = spark.range(3).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("int").alias("day"),
            (F.col("id") * 2).alias("v"),
        )

        def hook():
            _test_hooks.pop("before_commit", None)
            write_version(flat, base)  # full overwrite, FLAT layout

        _test_hooks["before_commit"] = hook
        with pytest.raises(LogicalConflictError, match="layout"):
            copy_into(spark, base, _land(spark, tmp_path, "l1", 6, 9))
