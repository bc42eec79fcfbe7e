"""Native exactly-once streaming lake sink (round-9 VERDICT #2):
``df.writeStream.format("versioned").option("appId", ...)`` commits one
lake version per microbatch through ``DataSourceStreamArrowWriter``,
with the transaction cursor riding ``user_meta.stream_txn`` — the
write-side twin of ``lakefeed``.

Covers: the replay crash window (same batchId re-committed → no-op, no
duplicates), a real ingest → stop → resume on one checkpoint, rebase
over concurrent table maintenance, and the guard rails.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructType

from etl_opensky_spark.sources.lakesource import (
    HAS_DATASOURCE_API,
    register_versioned_source,
)
from etl_opensky_spark.sources.versioned import (
    _read_log,
    read_version,
    write_version,
)

pytestmark = pytest.mark.skipif(
    not HAS_DATASOURCE_API, reason="pyspark-4 DS API required"
)

SCH = StructType().add("id", LongType()).add("v", StringType())


def _writer(base, app="app1"):
    from etl_opensky_spark.sources.lakesource import (
        VersionedLakeStreamWriter,
    )

    return VersionedLakeStreamWriter(
        {"path": base, "appId": app}, SCH, False
    )


def _stage(w, rows):
    """Executor-side write: one staged file from arrow batches, exactly
    as the plan does."""
    import pyarrow as pa

    batch = pa.RecordBatch.from_pydict(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    return w.write(iter([batch]))


def _ids(spark, base):
    return sorted(r["id"] for r in read_version(spark, base).collect())


class TestProtocol:
    def test_batches_commit_and_replay_noops(self, spark, tmp_path):
        """The crash window: Structured Streaming replays a batch whose
        sink commit landed but whose checkpoint write didn't.  The
        runner constructs a FRESH writer and re-enters commit with the
        same batchId — the cursor makes it a no-op and the re-staged
        file is discarded."""
        base = str(tmp_path / "lake")
        m0 = _stage(_writer(base), [(1, "a"), (2, "b")])
        _writer(base).commit([m0], 0)  # fresh instance, like the runner
        assert _ids(spark, base) == [1, 2]

        m1 = _stage(_writer(base), [(3, "c")])
        _writer(base).commit([m1], 1)
        assert _ids(spark, base) == [1, 2, 3]
        log = _read_log(base)
        assert [e["op"] for e in log] == ["stream_append"] * 2

        # crash replay of batch 1: new staged file, same batchId
        m1r = _stage(_writer(base), [(3, "c")])
        _writer(base).commit([m1r], 1)
        assert _ids(spark, base) == [1, 2, 3]  # exactly once
        assert len(_read_log(base)) == 2       # no extra commit
        assert not os.path.exists(m1r.path)    # replay debris cleaned

    def test_cursor_skips_foreign_commits(self, spark, tmp_path):
        """Other writers on the table (manual merges, another stream's
        app) don't move this app's cursor."""
        base = str(tmp_path / "lake")
        _writer(base, "A").commit([_stage(_writer(base), [(1, "a")])], 0)
        _writer(base, "B").commit([_stage(_writer(base), [(9, "z")])], 5)
        # A's replay of batch 0 is still a no-op; its NEXT batch lands
        _writer(base, "A").commit([_stage(_writer(base), [(1, "a")])], 0)
        _writer(base, "A").commit([_stage(_writer(base), [(2, "b")])], 1)
        assert _ids(spark, base) == [1, 2, 9]

    def test_rebase_over_concurrent_maintenance(self, spark, tmp_path):
        """A compaction racing the stream's commit: blind appends
        rebase, the stream never dies on table maintenance."""
        from etl_opensky_spark.sources.versioned import (
            _test_hooks,
            compact_versioned,
        )

        base = str(tmp_path / "lake")
        write_version(
            spark.createDataFrame(
                [(100 + i, "seed") for i in range(8)], SCH
            ).repartition(4),
            base,
        )

        def steal():
            _test_hooks.pop("before_commit", None)
            compact_versioned(spark, base)

        m = _stage(_writer(base), [(1, "a")])
        _test_hooks["before_commit"] = steal
        try:
            _writer(base).commit([m], 0)
        finally:
            _test_hooks.pop("before_commit", None)
        log = _read_log(base)
        assert [e["op"] for e in log] == [
            "write", "compact", "stream_append"
        ]
        assert _ids(spark, base) == [1] + [100 + i for i in range(8)]

    def test_guard_rails(self, tmp_path):
        from etl_opensky_spark.sources.lakesource import (
            VersionedLakeStreamWriter,
        )

        with pytest.raises(ValueError, match="appId"):
            VersionedLakeStreamWriter(
                {"path": str(tmp_path / "x")}, SCH, False
            )
        with pytest.raises(ValueError, match="append output mode"):
            VersionedLakeStreamWriter(
                {"path": str(tmp_path / "x"), "appId": "a"}, SCH, True
            )


class TestEndToEnd:
    def test_ingest_stop_resume_no_duplicates(self, spark, tmp_path):
        """Real Structured Streaming lifecycle on one checkpoint:
        ingest a backlog, stop, land more input, resume — every input
        row exactly once, one lake commit per microbatch, cursor
        monotonic."""
        register_versioned_source(spark)
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        base = str(tmp_path / "lake")
        os.makedirs(src)

        def land(lo, hi, name):
            spark.range(lo, hi).select(
                F.col("id"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, name)
            )

        def run():
            q = (
                spark.readStream.schema(SCH)
                .option("pathGlobFilter", "*.parquet")
                .option("recursiveFileLookup", "true")
                .parquet(src)
                .writeStream.format("versioned")
                .option("appId", "e2e")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start(base)
            )
            q.awaitTermination(120)

        land(0, 5, "a")
        run()
        assert _ids(spark, base) == list(range(5))
        land(100, 103, "b")
        run()
        assert _ids(spark, base) == list(range(5)) + [100, 101, 102]
        # resume with nothing new: no spurious commits
        n_before = len(_read_log(base))
        run()
        assert len(_read_log(base)) == n_before
        ops = {e["op"] for e in _read_log(base)}
        assert ops == {"stream_append"}


class TestRound10Drift:
    """Round-10 VERDICT #5: behavior under schema drift and appId
    collision, previously untested.  Drift is a NAMED refusal on the
    next batch (the commit runner constructs a fresh writer per batch,
    which re-validates against the tip; schema evolution itself lives
    in merge_versioned(merge_schema=True) / foreachBatch).  Two
    different streams sharing one appId are detected via the
    checkpoint recorded in the transaction cursor — without it, each
    stream's batches silently no-op the other's."""

    def _writer_opts(self, base, app, ckpt=None):
        from etl_opensky_spark.sources.lakesource import (
            VersionedLakeStreamWriter,
        )

        opts = {"path": base, "appId": app}
        if ckpt is not None:
            # Spark lowercases option keys on the wire
            opts["checkpointlocation"] = ckpt
        return VersionedLakeStreamWriter(opts, SCH, False)

    def test_table_evolved_mid_stream_continues_with_nulls(
        self, spark, tmp_path
    ):
        """Mid-stream table evolution is survivable (round-10 subset
        appends): the next batch's fresh writer sees its schema as a
        SUBSET of the evolved tip and keeps appending — the new column
        reads null on streamed rows.  (The deeper coverage lives in
        tests/test_subset_append.py.)"""
        from etl_opensky_spark.sources.versioned import (
            merge_versioned,
            read_version,
        )

        base = str(tmp_path / "lake")
        w = self._writer_opts(base, "app1", str(tmp_path / "ck"))
        m0 = _stage(w, [(1, "a")])
        self._writer_opts(base, "app1", str(tmp_path / "ck")).commit(
            [m0], 0
        )
        # the table gains a column concurrently (mergeSchema upsert)
        merge_versioned(
            spark, base,
            spark.createDataFrame(
                [(1, "a", "x")], "id long, v string, extra string"
            ),
            ["id"], merge_schema=True,
        )
        w2 = self._writer_opts(base, "app1", str(tmp_path / "ck"))
        m1 = _stage(w2, [(2, "b")])
        self._writer_opts(base, "app1", str(tmp_path / "ck")).commit(
            [m1], 1
        )
        got = {
            r["id"]: r["extra"]
            for r in read_version(spark, base).collect()
        }
        assert got == {1: "x", 2: None}

    def test_stream_with_extra_column_refuses_at_start(
        self, spark, tmp_path
    ):
        base = str(tmp_path / "lake")
        write_version(
            spark.createDataFrame([(1, "a")], "id long, v string"), base
        )
        wide = (
            StructType()
            .add("id", LongType())
            .add("v", StringType())
            .add("extra", StringType())
        )
        from etl_opensky_spark.sources.lakesource import (
            VersionedLakeStreamWriter,
        )

        with pytest.raises(ValueError, match="frame columns"):
            VersionedLakeStreamWriter(
                {"path": base, "appId": "app1"}, wide, False
            )

    def test_app_id_collision_refuses(self, spark, tmp_path):
        base = str(tmp_path / "lake")
        ck_a = str(tmp_path / "ck_a")
        ck_b = str(tmp_path / "ck_b")
        m0 = _stage(self._writer_opts(base, "shared", ck_a), [(1, "a")])
        self._writer_opts(base, "shared", ck_a).commit([m0], 0)
        # a DIFFERENT stream (other checkpoint) reusing the appId: its
        # batch 0 would silently no-op against stream A's cursor —
        # refuse loudly instead
        m_b = _stage(self._writer_opts(base, "shared", ck_b), [(9, "z")])
        with pytest.raises(ValueError, match="already used by a"):
            self._writer_opts(base, "shared", ck_b).commit([m_b], 0)
        assert _ids(spark, base) == [1]  # nothing leaked through
        # the SAME stream (same checkpoint) replaying stays a no-op
        m_r = _stage(self._writer_opts(base, "shared", ck_a), [(1, "a")])
        self._writer_opts(base, "shared", ck_a).commit([m_r], 0)
        assert _ids(spark, base) == [1]
        assert len(_read_log(base)) == 1

    def test_legacy_cursor_without_ckpt_still_works(
        self, spark, tmp_path
    ):
        """Cursors written before round 10 carry no ckpt — the guard
        must not fire on them (and ckpt-less writers skip it too)."""
        base = str(tmp_path / "lake")
        m0 = _stage(_writer(base), [(1, "a")])
        _writer(base).commit([m0], 0)  # no checkpoint option at all
        m1 = _stage(
            self._writer_opts(base, "app1", str(tmp_path / "ck")),
            [(2, "b")],
        )
        self._writer_opts(base, "app1", str(tmp_path / "ck")).commit(
            [m1], 1
        )
        assert _ids(spark, base) == [1, 2]
