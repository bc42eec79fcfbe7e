"""Round-8 ADVICE regression tests — one test per reported defect —
plus pins for the round-8 VERDICT maintenance-tier tasks.

ADVICE defects:

1. ``LakeFS.replace`` over an existing UNMARKED final directory must
   delete the debris and republish (``os.replace`` raised ENOTEMPTY,
   leaving pre-marker-era feed dirs permanently un-repairable).
2. NULL-key MOR deletes are rejected at the source (the JVM and
   Python-DS read paths can never be asked the question they used to
   answer differently).
3. ``clustering_depth`` must measure over the SNAPSHOT's files, not
   the stats dict's keys — files absent from the manifest count a
   full-domain width and the <2 gate counts snapshot files.
4. ``lakefeed.latestOffset`` must not advance past an in-flight
   (unmarked) commit publish — a racing trigger would permanently
   skip it.
5. ``_write_checkpoint`` must exclude entries whose commit file a
   concurrent vacuum already dropped (resurrection corruption).

VERDICT tasks pinned here:

- #4 ``table_metrics`` reads row counts from the commit manifest when
  the table tracks stats: ZERO parquet-footer opens on the no-debt
  tick, and ``maintain_table`` measures exactly once when idle.
- #5 ``ObjectStoreFS.put_if_absent`` is content-atomic: the key is
  never observable with a partial payload.
"""

from __future__ import annotations

import json
import os
import threading

import pytest

from etl_opensky_spark.sources import maintenance as maint
from etl_opensky_spark.sources import versioned as V
from etl_opensky_spark.sources.fs import (
    PUBLISH_MARKER,
    LakeFS,
    ObjectStoreFS,
    is_published,
)
from etl_opensky_spark.sources.maintenance import (
    clustering_depth,
    maintain_table,
    table_metrics,
)
from etl_opensky_spark.sources.versioned import (
    _commit_path,
    _read_log,
    _write_checkpoint,
    purge_versioned_mor,
    read_version,
    vacuum_versions,
    write_version,
)

# --- 1. POSIX replace over unmarked final dir -----------------------------


def _make_dir(path, fname, body):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, fname), "w") as fh:
        fh.write(body)


def test_posix_replace_repairs_unmarked_final_dir(tmp_path):
    """A legacy / crash-debris final dir (no marker) must be replaced,
    not crash with ENOTEMPTY."""
    fs = LakeFS()
    final = str(tmp_path / "commit=4")
    _make_dir(final, "old.parquet", "legacy, pre-marker era")
    tmp = str(tmp_path / "_tmp-abc")
    _make_dir(tmp, "new.parquet", "repaired")
    fs.replace(tmp, final)  # previously: OSError ENOTEMPTY
    assert is_published(final)
    assert open(os.path.join(final, "new.parquet")).read() == "repaired"
    assert not os.path.exists(os.path.join(final, "old.parquet"))
    assert not os.path.exists(tmp)


def test_posix_replace_published_final_is_idempotent(tmp_path):
    fs = LakeFS()
    final = str(tmp_path / "commit=4")
    _make_dir(final, "data.parquet", "original")
    open(os.path.join(final, PUBLISH_MARKER), "w").close()
    tmp = str(tmp_path / "_tmp-retry")
    _make_dir(tmp, "data.parquet", "retry output")
    fs.replace(tmp, final)
    assert open(os.path.join(final, "data.parquet")).read() == "original"
    assert not os.path.exists(tmp)


# --- 2. NULL-key MOR delete rejected --------------------------------------


def test_purge_mor_rejects_null_keys(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([(1, "a"), (None, "b")], "id int, v string"),
        base,
    )
    with pytest.raises(ValueError, match="NULL key"):
        purge_versioned_mor(
            spark, base,
            spark.createDataFrame([(None,)], "id int"), ["id"],
        )
    # and the table is untouched: no tombstone committed
    assert _read_log(base)[-1]["version"] == 1
    got = {tuple(r) for r in read_version(spark, base).collect()}
    assert got == {(1, "a"), (None, "b")}


# --- 3. clustering_depth under partial stats coverage ---------------------


def _doctor_tip(base, mutate):
    """Rewrite the tip commit file in place (unit-test surgery)."""
    tip = _read_log(base)[-1]
    mutate(tip)
    with open(_commit_path(base, tip["version"]), "w") as fh:
        json.dump(tip, fh)


def test_clustering_depth_counts_manifest_missing_files(spark, tmp_path):
    """Files in the snapshot but absent from the stats dict are
    unprunable and must count full-domain width — dropping them
    understated the depth and disarmed the re-cluster repair."""
    base = str(tmp_path / "lake")
    df = spark.range(0, 4000).selectExpr("id", "id % 7 as k")
    write_version(
        df.repartitionByRange(4, "id"), base, stats_cols=["id"]
    )
    full = clustering_depth(base, "id")
    assert full is not None and full < 1.5  # range-clustered

    def drop_half(tip):
        stats = tip["stats"]
        for rel in sorted(stats)[: len(stats) // 2]:
            del stats[rel]

    _doctor_tip(base, drop_half)
    partial = clustering_depth(base, "id")
    # every dropped file now counts a full-domain width: depth must
    # RISE well above the clustered reading, not sink toward it
    assert partial is not None and partial > full + 0.9


def test_clustering_depth_gates_on_snapshot_files(spark, tmp_path):
    """<2 SNAPSHOT files → None, even when stale stats entries remain."""
    base = str(tmp_path / "lake")
    write_version(
        spark.range(0, 100).coalesce(1), base, stats_cols=["id"]
    )

    def add_stale(tip):
        tip["stats"]["ghost.parquet"] = {
            "id": {"min": 0, "max": 99, "nulls": 0, "rows": 100}
        }

    _doctor_tip(base, add_stale)
    assert clustering_depth(base, "id") is None


# --- 4. lakefeed offset never passes an in-flight publish -----------------


def test_lakefeed_latest_offset_capped_by_unpublished_dir(tmp_path):
    pytest.importorskip("pyspark.sql.datasource")
    from etl_opensky_spark.sources.lakefeed import LakeFeedStreamReader

    feed = str(tmp_path / "feed")
    for v, published in [(1, True), (2, False), (3, True)]:
        d = os.path.join(feed, f"commit={v}")
        _make_dir(d, "part-0.parquet", "x")
        if published:
            open(os.path.join(d, PUBLISH_MARKER), "w").close()
    r = LakeFeedStreamReader({"path": feed})
    # commit=2 is mid-publish: the offset must hold at 1, not jump to 3
    assert r.latestOffset() == {"version": 1}
    open(os.path.join(feed, "commit=2", PUBLISH_MARKER), "w").close()
    assert r.latestOffset() == {"version": 3}


# --- 5. checkpoint vs concurrent vacuum -----------------------------------


def test_checkpoint_excludes_vacuumed_entries(spark, tmp_path, monkeypatch):
    """A checkpoint built from a PRE-vacuum log snapshot must not
    resurrect entries whose commit files (and data dirs) vacuum
    dropped."""
    base = str(tmp_path / "lake")
    for i in range(4):
        write_version(
            spark.createDataFrame([(i,)], "id int"), base
        )
    stale_log = _read_log(base)  # the racing writer's view
    vacuum_versions(base, keep_last=2)
    monkeypatch.setattr(V, "_read_log", lambda b: stale_log)
    _write_checkpoint(base, 4)
    monkeypatch.undo()
    log = _read_log(base)  # served FROM the new checkpoint
    assert [e["version"] for e in log] == [3, 4]
    # every served entry points at a live snapshot dir
    for e in log:
        assert os.path.isdir(os.path.join(base, e["dir"]))


# --- VERDICT #4: manifest-sourced table_metrics ---------------------------


class _CountingParquetFile:
    """Stand-in that counts footer opens, then delegates."""

    opens = 0

    def __init__(self, real):
        self._real = real

    def __call__(self, path, *a, **k):
        type(self).opens += 1
        return self._real(path, *a, **k)


@pytest.fixture()
def count_footer_opens(monkeypatch):
    import pyarrow.parquet as pq

    counter = _CountingParquetFile(pq.ParquetFile)
    _CountingParquetFile.opens = 0
    monkeypatch.setattr(pq, "ParquetFile", counter)
    return counter


def test_table_metrics_zero_footer_opens_with_stats(
    spark, tmp_path, count_footer_opens
):
    base = str(tmp_path / "lake")
    write_version(
        spark.range(0, 1000).repartition(4), base, stats_cols=["id"]
    )
    _CountingParquetFile.opens = 0
    m = table_metrics(base, small_file_rows=10_000)
    assert m["n_files"] == 4 and m["n_small_files"] == 4
    assert _CountingParquetFile.opens == 0


def test_table_metrics_footer_fallback_without_stats(
    spark, tmp_path, count_footer_opens
):
    base = str(tmp_path / "lake")
    write_version(spark.range(0, 1000).repartition(4), base)
    _CountingParquetFile.opens = 0
    m = table_metrics(base, small_file_rows=10_000)
    assert m["n_small_files"] == 4
    assert _CountingParquetFile.opens == 4


def test_maintain_table_measures_once_when_idle(
    spark, tmp_path, monkeypatch
):
    base = str(tmp_path / "lake")
    write_version(spark.range(0, 100).coalesce(1), base,
                  stats_cols=["id"])
    calls = {"n": 0}
    real = maint.table_metrics

    def counting(b, small_file_rows=500_000):
        calls["n"] += 1
        return real(b, small_file_rows=small_file_rows)

    monkeypatch.setattr(maint, "table_metrics", counting)
    report = maintain_table(
        spark, base, policy={"max_small_files": 8}
    )
    assert report["actions"] == []
    assert calls["n"] == 1  # one measurement feeds before/checks/after


# --- VERDICT #2: Arrow-batch DS writer ------------------------------------


def test_ds_writer_is_arrow_batch_path(spark, tmp_path):
    """The DS-API writer receives ``pyarrow.RecordBatch``es (the
    ``DataSourceArrowWriter`` contract) and stages them columnar —
    renamed to physical names, cast to the table's types — with no
    Python row objects; and the end-to-end
    ``df.write.format("versioned")`` path commits through it."""
    pytest.importorskip("pyspark.sql.datasource")
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.datasource import DataSourceArrowWriter

    from etl_opensky_spark.sources.lakesource import (
        VersionedLakeWriter,
        register_versioned_source,
    )
    from etl_opensky_spark.sources.versioned import (
        read_version,
        rename_column,
        write_version,
    )

    assert issubclass(VersionedLakeWriter, DataSourceArrowWriter)
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([(1, 10.0)], "id int, score double"), base
    )
    rename_column(spark, base, {"score": "quality"})  # physical: score
    schema = read_version(spark, base).schema
    w = VersionedLakeWriter({"path": base}, schema, overwrite=False)
    batch = pa.record_batch(
        {
            "id": pa.array([2, 3], pa.int64()),     # needs int32 cast
            "quality": pa.array([20.0, 30.0]),       # logical name
        }
    )
    msg = w.write(iter([batch]))
    assert msg.rows == 2
    staged = pq.read_table(msg.path)
    # frozen PHYSICAL column name + exact table types on disk
    assert staged.column_names == ["id", "score"]
    assert staged.schema.field("id").type == pa.int32()
    w.commit([msg])
    got = {tuple(r) for r in read_version(spark, base).collect()}
    assert got == {(1, 10.0), (2, 20.0), (3, 30.0)}
    # per-row input is a type error by construction, not silently slow
    with pytest.raises(AttributeError):
        VersionedLakeWriter(
            {"path": base}, schema, overwrite=False
        ).write(iter([(4, 40.0)]))

    # end-to-end through the Spark write path
    register_versioned_source(spark)
    spark.createDataFrame([(4, 40.0)], "id int, quality double").write.format(
        "versioned"
    ).mode("append").save(base)
    assert read_version(spark, base).count() == 4


# --- VERDICT #3: REORG prunes without collecting huge key sets ------------


def test_reorg_envelope_pruning_matches_exact(spark, tmp_path, monkeypatch):
    """Above the driver-key cap, REORG must not collect the tombstone
    keys; the distributed envelope must still rewrite ONLY files whose
    range can hold a key, and the purged content must be exact."""
    from etl_opensky_spark.sources.versioned import (
        materialize_tombstones,
    )

    base = str(tmp_path / "lake")
    df = spark.range(0, 4000).selectExpr("id", "id * 2 as v")
    write_version(
        df.repartitionByRange(8, "id"), base, stats_cols=["id"]
    )
    # keys 100..199 live in the first range file only
    purge_versioned_mor(
        spark, base,
        spark.range(100, 200).select("id"), ["id"],
    )
    monkeypatch.setattr(V, "_REORG_DRIVER_KEY_MAX", 0)  # force envelope

    collected = []
    real_collect = V.DataFrame.collect

    def spy(self):
        out = real_collect(self)
        collected.append(len(out))
        return out

    monkeypatch.setattr(V.DataFrame, "collect", spy)
    version, n_rewritten = materialize_tombstones(spark, base)
    monkeypatch.undo()
    assert n_rewritten == 1  # range-clustered: one key-hit file
    tip = _read_log(base)[-1]
    assert tip["version"] == version and not tip.get("tombstones")
    got = {tuple(r) for r in read_version(spark, base).collect()}
    want = {(i, i * 2) for i in range(4000) if not 100 <= i < 200}
    assert got == want
    # nothing key-set-sized ever reached the driver: any collect
    # during the REORG was at most one row (the envelope arrives via
    # first(), which does not even route through DataFrame.collect)
    assert max(collected, default=0) <= 1


# --- VERDICT #5: content-atomic conditional PUT ---------------------------


def test_object_store_put_if_absent_is_content_atomic(tmp_path):
    """Readers hammering the key during a PUT must only ever observe
    the complete payload — never an empty/partial file (the torn
    window ``_read_log`` would crash on)."""
    fs = ObjectStoreFS()
    path = str(tmp_path / "00000001.json")
    payload = (b'{"version": 1, "pad": "' + b"x" * 65536 + b'"}')
    seen_partial = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                with open(path, "rb") as fh:
                    got = fh.read()
            except FileNotFoundError:
                continue
            if got != payload:
                seen_partial.append(len(got))

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    try:
        for _ in range(50):
            try:
                fs.put_if_absent(path, payload)
            except FileExistsError:
                pass
            os.remove(path)
        fs.put_if_absent(path, payload)
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not seen_partial
    # losing the race still raises, and leaves no temp debris
    with pytest.raises(FileExistsError):
        fs.put_if_absent(path, b"other")
    assert open(path, "rb").read() == payload
    assert [n for n in os.listdir(tmp_path) if ".put-" in n] == []
