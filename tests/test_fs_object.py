"""Object-store backend proof (VERDICT r6 #4): the full lake
lifecycle runs through ``fs.ObjectStoreFS`` — no hardlinks, no
renames, conditional-PUT commits, marker-gated directory publishes —
with ``os.link``/``os.replace`` booby-trapped to fail the test if any
driver-side lake path touches them under the table root.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import pytest

from etl_opensky_spark.sources.fs import (
    PUBLISH_MARKER,
    ObjectStoreFS,
    is_published,
    set_fs,
)
from etl_opensky_spark.sources.maintenance import maintain_table
from etl_opensky_spark.sources.versioned import (
    _read_log,
    clone_versioned,
    copy_into,
    materialize_change_feed,
    materialize_tombstones,
    merge_versioned,
    optimize_small_files,
    purge_versioned_mor,
    read_version,
    restore_version,
    vacuum_orphans,
    vacuum_versions,
    write_version,
)

from .conftest import rows


@contextmanager
def object_store(tmp_path):
    """Install ObjectStoreFS AND booby-trap the POSIX primitives an
    object store lacks: any driver-side ``os.link``/``os.replace``
    under the test root is a seam bypass and fails loudly.  (Executor
    python workers are separate processes — their writes go through
    Spark's own committers, not this seam; the lake's COMMIT PROTOCOL
    is entirely driver-side, which is what this trap proves.)"""
    fs = ObjectStoreFS()
    prev = set_fs(fs)
    real_link, real_replace = os.link, os.replace
    root = str(tmp_path)

    def no_link(src, dst, *a, **kw):
        if str(src).startswith(root) or str(dst).startswith(root):
            raise AssertionError(
                f"os.link({src}) under object-store backend"
            )
        return real_link(src, dst, *a, **kw)

    def no_replace(src, dst, *a, **kw):
        if str(src).startswith(root) or str(dst).startswith(root):
            raise AssertionError(
                f"os.replace({src}) under object-store backend"
            )
        return real_replace(src, dst, *a, **kw)

    os.link, os.replace = no_link, no_replace
    try:
        yield fs
    finally:
        os.link, os.replace = real_link, real_replace
        set_fs(prev)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], "id int, v string"
    )


def test_full_lake_lifecycle_on_object_store(spark, tmp_path):
    """Every commit family — write, merge, MOR delete, COPY INTO,
    OPTIMIZE, REORG, maintain, restore, clone, vacuum, time travel —
    lands correctly with copies instead of hardlinks and conditional
    PUTs as the only atomic primitive."""
    base = str(tmp_path / "lake")
    with object_store(tmp_path) as fs:
        write_version(
            _df(spark, [(i, f"v{i}") for i in range(20)]).repartition(4),
            base, stats_cols=("id",),
        )
        merge_versioned(
            spark, base, _df(spark, [(5, "v5b"), (100, "new")]), ["id"]
        )
        purge_versioned_mor(
            spark, base, spark.createDataFrame([(3,)], "id int"), ["id"]
        )
        landing = str(tmp_path / "landing")
        _df(spark, [(200, "l0"), (201, "l1")]).repartition(2).write.parquet(
            landing
        )
        copy_into(spark, base, landing, stats_cols=("id",))
        alive = {i: f"v{i}" for i in range(20) if i != 3}
        alive.update({5: "v5b", 100: "new", 200: "l0", 201: "l1"})
        assert rows(read_version(spark, base)) == sorted(alive.items())
        v_mark = _read_log(base)[-1]["version"]

        materialize_tombstones(spark, base)
        optimize_small_files(spark, base, target_rows_per_file=50)
        assert rows(read_version(spark, base)) == sorted(alive.items())
        assert not _read_log(base)[-1].get("tombstones")
        # time travel + restore still exact
        assert rows(read_version(spark, base, as_of=v_mark)) == sorted(
            alive.items()
        )
        restore_version(base, v_mark)
        assert rows(read_version(spark, base)) == sorted(alive.items())
        # clone + maintain + vacuum
        dst = str(tmp_path / "clone")
        clone_versioned(base, dst)
        assert rows(read_version(spark, dst)) == sorted(alive.items())
        report = maintain_table(
            spark, base,
            {"target_rows_per_file": 50, "max_small_files": 0,
             "max_live_tombstones": 0, "vacuum_keep_last": 1},
        )
        assert rows(read_version(spark, base)) == sorted(alive.items())
        assert report["after"]["n_tombstones"] == 0
        vacuum_orphans(base)
        assert rows(read_version(spark, base)) == sorted(alive.items())
        assert fs.n_cond_puts >= 8  # every commit was a conditional PUT
        assert fs.n_copies > 0  # snapshots cloned by copy, not link


def test_change_feed_publish_is_marker_gated(spark, tmp_path):
    """Directory publishes on the object store appear object-by-object;
    only the final marker PUT makes a commit dir consumable.  A crashed
    (unmarked) publish is invisible to the cursor and the stream, and a
    re-run replaces the debris exactly once."""
    from etl_opensky_spark.sources.lakefeed import (
        _commit_versions,
        register_lakefeed_source,
    )

    src = str(tmp_path / "src")
    feed = str(tmp_path / "feed")
    with object_store(tmp_path) as fs:
        write_version(_df(spark, []), src)
        merge_versioned(
            spark, src, _df(spark, [(1, "a"), (2, "b")]), ["id"]
        )
        merge_versioned(
            spark, src, _df(spark, [(2, "b2"), (3, "c")]), ["id"]
        )
        n_commits, n_rows = materialize_change_feed(
            spark, src, feed, ["id"]
        )
        assert n_commits == 2 and fs.n_marker_puts == 2
        dirs = sorted(
            d for d in os.listdir(feed) if d.startswith("commit=")
        )
        assert all(is_published(os.path.join(feed, d)) for d in dirs)
        assert _commit_versions(feed) == [2, 3]

        # crash injection: strip one marker -> that commit vanishes
        # from every consumer view
        os.remove(os.path.join(feed, "commit=3", PUBLISH_MARKER))
        assert _commit_versions(feed) == [2]
        # re-materialize: debris deleted, re-published ONCE
        n2, _ = materialize_change_feed(spark, src, feed, ["id"])
        assert n2 == 1 and fs.n_debris_deletes == 1
        assert _commit_versions(feed) == [2, 3]

    # and the stream consumes the marker-gated feed exactly-once
    register_lakefeed_source(spark)
    q = (
        spark.readStream.format("lakefeed")
        .load(feed)
        .writeStream.format("memory")
        .queryName("r7_objstore_feed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = rows(
        spark.table("r7_objstore_feed").select(
            "id", "_change_type", "commit"
        )
    )
    assert sorted(got) == sorted(
        [(1, "insert", 2), (2, "insert", 2),
         (2, "update_preimage", 3), (2, "update_postimage", 3),
         (3, "insert", 3)]
    )


def test_ds_writer_commit_on_object_store(spark, tmp_path):
    """The DS-API writer's driver-side commit adopts staged files via
    the seam — copies under the double, one conditional-PUT commit."""
    from etl_opensky_spark.sources.lakesource import VersionedLakeWriter

    base = str(tmp_path / "lake")
    with object_store(tmp_path) as fs:
        write_version(_df(spark, [(1, "a")]), base)
        import pyarrow as pa

        schema = read_version(spark, base).schema
        writer = VersionedLakeWriter(
            {"path": base}, schema, overwrite=False
        )
        msg = writer.write(
            iter([pa.record_batch({"id": pa.array([2], pa.int32()),
                                   "v": pa.array(["b"])})])
        )
        writer.commit([msg])
        assert rows(read_version(spark, base)) == [(1, "a"), (2, "b")]
        assert fs.n_copies > 0


def test_object_store_replace_file_and_idempotency(tmp_path):
    fs = ObjectStoreFS()
    # file replace = single-key PUT
    tmp = tmp_path / "x.tmp"
    tmp.write_bytes(b"payload")
    final = tmp_path / "x.tar"
    fs.replace(str(tmp), str(final))
    assert final.read_bytes() == b"payload" and not tmp.exists()
    # dir publish: marker lands last; republish of a published final
    # is a no-op (idempotent retry)
    d1 = tmp_path / "t1"
    d1.mkdir()
    (d1 / "a.parquet").write_bytes(b"a")
    out = tmp_path / "commit=1"
    fs.replace(str(d1), str(out))
    assert is_published(str(out))
    d2 = tmp_path / "t2"
    d2.mkdir()
    (d2 / "b.parquet").write_bytes(b"b")
    fs.replace(str(d2), str(out))
    assert sorted(os.listdir(out)) == [PUBLISH_MARKER, "a.parquet"]
    assert not d2.exists()


def test_posix_publish_carries_marker(tmp_path):
    """The default backend stamps the marker into the tmp tree before
    its atomic rename, so marker-gated readers work unchanged."""
    from etl_opensky_spark.sources.fs import LakeFS

    fs = LakeFS()
    d = tmp_path / "t"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"a")
    out = tmp_path / "commit=1"
    fs.replace(str(d), str(out))
    assert is_published(str(out))
