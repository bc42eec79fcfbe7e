"""Bloom-index repair (round-9 VERDICT #3, closing r8 review finding
#1): pyarrow-only DS appends drop the bloom sidecar; ``maintain_table``
now detects the gap and ``repair_bloom_index`` restores point-lookup
pruning — donor-seeded (carried files reuse their words verbatim), only
uncovered files scanned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_opensky_spark.sources.fs import ObjectStoreFS, set_fs
from etl_opensky_spark.sources.lakesource import (
    HAS_DATASOURCE_API,
    register_versioned_source,
)
from etl_opensky_spark.sources.maintenance import maintain_table
from etl_opensky_spark.sources.versioned import (
    _read_log,
    bloom_coverage,
    compact_versioned,
    prune_files_eq,
    read_version_eq,
    repair_bloom_index,
    write_version,
)

pytestmark = pytest.mark.skipif(
    not HAS_DATASOURCE_API, reason="pyspark-4 DS API required"
)


def _bloom_table(spark, base, hi=200):
    df = spark.range(0, hi).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    write_version(
        df.repartitionByRange(4, "k"), base,
        bloom_cols=("k",), bloom_bits=1 << 14,
    )


def _ds_append(spark, base, lo, hi):
    register_versioned_source(spark)
    spark.range(lo, hi).select(
        F.col("k"), (F.col("k") * 3).alias("v")
    ).write.format("versioned").mode("append").save(base)


def _ds_frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )


class TestRepair:
    def test_ds_append_then_repair_restores_pruning(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _bloom_table(spark, base)
        register_versioned_source(spark)
        _ds_frame(spark, 500, 520).repartition(2).write.format(
            "versioned"
        ).mode("append").save(base)
        assert bloom_coverage(base) is None  # DS append dropped it
        got = repair_bloom_index(spark, base)
        assert got is not None
        version, scanned = got
        assert _read_log(base)[-1]["op"] == "bloom_repair"
        # donor seeding: only the 2 DS-appended files were scanned
        assert scanned == 2
        cov = bloom_coverage(base)
        assert cov["covered"] == cov["total"] == 6
        # pruning engaged for a key living ONLY in the appended files
        kept, total = prune_files_eq(spark, base, "k", 519)
        assert kept and len(kept) < total
        got_rows = (
            read_version_eq(spark, base, "k", 519)
            .filter(F.col("k") == 519).collect()
        )
        assert [(r["k"], r["v"]) for r in got_rows] == [(519, 1557)]
        # old keys still covered through the seeded words
        kept_old, _ = prune_files_eq(spark, base, "k", 7)
        assert kept_old and len(kept_old) < total

    def test_steady_state_noop(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _bloom_table(spark, base)
        assert repair_bloom_index(spark, base) is None
        _ds_frame(spark, 500, 510).repartition(1).write.format(
            "versioned"
        ).mode("append").save(base)
        assert repair_bloom_index(spark, base) is not None
        assert repair_bloom_index(spark, base) is None  # converged

    def test_never_bloomed_table_noops(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        write_version(_ds_frame(spark, 0, 50), base)
        assert repair_bloom_index(spark, base) is None

    def test_repair_after_compaction_rescans_all(self, spark, tmp_path):
        """OPTIMIZE rewrites every file (fresh identities): nothing is
        seedable, the repair re-indexes the whole new layout from the
        donor's recorded bits/hashes."""
        base = str(tmp_path / "lake")
        _bloom_table(spark, base)
        compact_versioned(spark, base, target_rows_per_file=100)
        assert bloom_coverage(base) is None
        version, scanned = repair_bloom_index(spark, base)
        cov = bloom_coverage(base)
        assert cov["covered"] == cov["total"] == scanned
        kept, total = prune_files_eq(spark, base, "k", 7)
        assert kept and len(kept) <= total

    def test_zero_copy_backend(self, spark, tmp_path):
        """Object-store mode: the tip is a zero-copy manifest whose
        carried files live in ancestor dirs — the repair indexes them
        through their origin paths."""
        prev = set_fs(ObjectStoreFS())
        try:
            base = str(tmp_path / "lake")
            _bloom_table(spark, base)
            _ds_frame(spark, 500, 510).repartition(1).write.format(
                "versioned"
            ).mode("append").save(base)
            version, scanned = repair_bloom_index(spark, base)
            assert scanned == 1
            kept, total = prune_files_eq(spark, base, "k", 505)
            assert kept and len(kept) < total
            kept_old, _ = prune_files_eq(spark, base, "k", 7)
            assert kept_old and len(kept_old) < total
        finally:
            set_fs(prev)


class TestMaintainTable:
    def test_maintain_repairs_and_converges(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _bloom_table(spark, base)
        _ds_frame(spark, 500, 510).repartition(1).write.format(
            "versioned"
        ).mode("append").save(base)
        report = maintain_table(
            spark, base, {"max_small_files": None}
        )
        acts = [a for a in report["actions"]
                if a["action"] == "repair_bloom"]
        assert acts and acts[0]["files_scanned"] == 1
        kept, total = prune_files_eq(spark, base, "k", 505)
        assert kept and len(kept) < total
        # second tick: steady state, no repair action
        report2 = maintain_table(
            spark, base, {"max_small_files": None}
        )
        assert not [a for a in report2["actions"]
                    if a["action"] == "repair_bloom"]

    def test_policy_off_skips(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        _bloom_table(spark, base)
        _ds_frame(spark, 500, 510).repartition(1).write.format(
            "versioned"
        ).mode("append").save(base)
        report = maintain_table(
            spark, base,
            {"max_small_files": None, "repair_bloom": False},
        )
        assert not [a for a in report["actions"]
                    if a["action"] == "repair_bloom"]
        assert bloom_coverage(base) is None
