"""Zero-copy manifest re-reference (VERDICT r7 missing #1).

Every commit now carries ``files`` ({rel path -> origin data dir}) and
``materialized``.  On the object-store backend "clone the parent" is a
pure metadata re-reference: the new snapshot dir holds only new files
(plus tiny physical sidecar copies) and ``n_copies`` per commit is
O(changed files), never O(table objects).  On POSIX nothing changes
shape: carried files are still hardlinked and reads stay one-directory
scans.  CDF identity moves from hardlink inodes to the manifest, so
``table_changes`` survives the switch; vacuum becomes reference-counted
so origin dirs outlive the versions that created them while any
retained zero-copy snapshot still points at them.
"""

from __future__ import annotations

import json
import os

from etl_opensky_spark.sources.versioned import (
    _commit_path,
    _entry_files,
    _entry_materialized,
    _list_data_files,
    _read_log,
    annotate_version,
    clone_versioned,
    copy_into,
    materialize_tombstones,
    merge_versioned,
    purge_versioned_mor,
    read_version,
    restore_version,
    table_changes,
    vacuum_versions,
    write_version,
)

from .conftest import rows
from .test_fs_object import object_store


def _df(spark, pairs):
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], "id int, v string"
    )


def _tip(base):
    return _read_log(base)[-1]


def _own_files(base, entry):
    return set(_list_data_files(os.path.join(base, entry["dir"])))


# --- the headline pin: per-commit copies are O(changed), not O(table) -----


def test_object_store_commits_copy_only_changed_files(spark, tmp_path):
    base = str(tmp_path / "lake")
    with object_store(tmp_path) as fs:
        write_version(
            _df(spark, [(i, f"v{i}") for i in range(40)]).repartition(8),
            base, stats_cols=("id",),
        )
        v1 = _tip(base)
        assert len(_entry_files(base, v1)) == 8
        assert fs.n_copies == 0  # fresh write: data lands directly

        # append two landing files: ONLY they are copied (staging ->
        # snapshot adoption), the 8 bulk files are re-referenced
        landing = str(tmp_path / "landing")
        _df(spark, [(100, "a"), (101, "b")]).repartition(2).write.parquet(
            landing
        )
        before = fs.n_copies
        copy_into(spark, base, landing, stats_cols=("id",))
        assert fs.n_copies - before == 2
        v2 = _tip(base)
        assert not _entry_materialized(v2)
        files2 = _entry_files(base, v2)
        assert len(files2) == 10
        # carried files still point at v1's dir; new ones at v2's
        origins = set(files2.values())
        assert origins == {v1["dir"], v2["dir"]}
        assert len(_own_files(base, v2)) == 2  # only the new files

        # MOR delete: zero data copies (one fresh sidecar write)
        before = fs.n_copies
        purge_versioned_mor(
            spark, base, spark.createDataFrame([(7,)], "id int"), ["id"]
        )
        assert fs.n_copies - before == 0
        v3 = _tip(base)
        assert _entry_files(base, v3) == files2  # pure re-reference
        assert len(_own_files(base, v3)) == 0   # sidecar is hidden

        # metadata-only commit: zero DATA copies — only the v3 tombstone
        # sidecar dir travels physically (its parquet + scope json +
        # Spark _SUCCESS/.crc bookkeeping), never the 10 data files
        before = fs.n_copies
        annotate_version(base, {"note": "tick"})
        sidecar_files = sum(
            len(names) for _r, _d, names in os.walk(
                os.path.join(base, v3["dir"])
            )
        )
        assert fs.n_copies - before <= sidecar_files

        # and the table reads correctly through every re-reference
        want = {(i, f"v{i}") for i in range(40) if i != 7}
        want |= {(100, "a"), (101, "b")}
        assert set(rows(read_version(spark, base))) == want
        # time travel crosses materialized and zero-copy entries alike
        assert len(rows(read_version(spark, base, as_of=1))) == 40
        # manifest stats carried: pruned read still correct
        pruned = read_version(spark, base, where={"id": (100, 200)})
        assert set(rows(pruned.filter("id >= 100"))) == {
            (100, "a"), (101, "b")
        }


def test_reorg_on_object_store_rewrites_only_hit_files(spark, tmp_path):
    base = str(tmp_path / "lake")
    with object_store(tmp_path) as fs:
        df = spark.range(0, 4000).selectExpr(
            "cast(id as int) id", "concat('v', id) v"
        )
        write_version(
            df.repartitionByRange(8, "id"), base, stats_cols=("id",)
        )
        purge_versioned_mor(
            spark, base,
            spark.range(100, 200).selectExpr("cast(id as int) id"), ["id"],
        )
        before = fs.n_copies
        version, n_rewritten = materialize_tombstones(
            spark, base, target_rows_per_file=1000
        )
        assert n_rewritten == 1  # stats-pruned: one key-hit file
        # copies = the rewritten file's staging adoption only
        assert fs.n_copies - before <= 2
        tip = _tip(base)
        assert not tip.get("tombstones")
        files = _entry_files(base, tip)
        assert len(files) == 8
        assert sum(1 for o in files.values() if o == tip["dir"]) == 1
        got = read_version(spark, base).count()
        assert got == 4000 - 100


# --- CDF identity moves to the manifest ------------------------------------


def test_change_feed_survives_zero_copy_commits(spark, tmp_path):
    base = str(tmp_path / "lake")
    with object_store(tmp_path):
        write_version(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), base)
        landing = str(tmp_path / "landing")
        _df(spark, [(4, "d")]).coalesce(1).write.parquet(landing)
        copy_into(spark, base, landing)                        # v2 insert
        purge_versioned_mor(
            spark, base, spark.createDataFrame([(2,)], "id int"), ["id"]
        )                                                      # v3 delete
        ch = table_changes(spark, base, ["id"], 1)
        got = sorted(
            (r["id"], r["_change_type"], r["_commit_version"])
            for r in ch.collect()
        )
        assert got == [(2, "delete", 3), (4, "insert", 2)]
        # the v1->v2 manifest diff is exactly the appended file: carried
        # entries share (rel, origin) across the two commits
        log = _read_log(base)
        f1, f2 = _entry_files(base, log[0]), _entry_files(base, log[1])
        assert set(f1.items()) <= set(f2.items())
        assert len(f2) - len(f1) == 1


# --- vacuum is reference-counted -------------------------------------------


def test_vacuum_preserves_origins_referenced_by_tip(spark, tmp_path):
    base = str(tmp_path / "lake")
    with object_store(tmp_path):
        write_version(
            _df(spark, [(i, f"v{i}") for i in range(20)]).repartition(4),
            base,
        )
        v1 = _tip(base)
        landing = str(tmp_path / "landing")
        _df(spark, [(50, "x")]).coalesce(1).write.parquet(landing)
        copy_into(spark, base, landing)  # v2: refs v1's 4 files + 1 new
        v2 = _tip(base)
        annotate_version(base, {"tick": 1})  # v3: refs v1 + v2 files
        dropped = vacuum_versions(base, keep_last=1)
        assert dropped == [1, 2]
        # v1's dir survives as an origin container holding exactly the
        # files the tip references; its commit file is gone
        assert not os.path.exists(_commit_path(base, 1))
        assert os.path.isdir(os.path.join(base, v1["dir"]))
        assert len(_own_files(base, v1)) == 4
        # v2's dir keeps only its one new file
        assert len(_own_files(base, v2)) == 1
        want = {(i, f"v{i}") for i in range(20)} | {(50, "x")}
        assert set(rows(read_version(spark, base))) == want


def test_vacuum_removes_unreferenced_origin_files(spark, tmp_path):
    base = str(tmp_path / "lake")
    with object_store(tmp_path):
        df = spark.range(0, 4000).selectExpr(
            "cast(id as int) id", "concat('v', id) v"
        )
        write_version(
            df.repartitionByRange(8, "id"), base, stats_cols=("id",)
        )
        v1 = _tip(base)
        purge_versioned_mor(
            spark, base,
            spark.range(100, 200).selectExpr("cast(id as int) id"), ["id"],
        )
        materialize_tombstones(spark, base, target_rows_per_file=1000)
        # tip references 7 of v1's 8 files (one was rewritten)
        vacuum_versions(base, keep_last=1)
        assert len(_own_files(base, v1)) == 7
        assert read_version(spark, base).count() == 3900


# --- restore / clone compose with zero-copy --------------------------------


def test_restore_and_clone_on_object_store(spark, tmp_path):
    base = str(tmp_path / "lake")
    dst = str(tmp_path / "clone")
    with object_store(tmp_path) as fs:
        write_version(_df(spark, [(1, "a"), (2, "b")]), base)
        merge_versioned(spark, base, _df(spark, [(2, "B"), (3, "c")]),
                        ["id"])
        before = fs.n_copies
        restore_version(base, 1)  # zero-copy re-reference of v1
        assert fs.n_copies - before == 0
        assert rows(read_version(spark, base)) == [(1, "a"), (2, "b")]
        # clone is cross-table: physical copies by design, correct
        clone_versioned(base, dst)
        assert rows(read_version(spark, dst)) == [(1, "a"), (2, "b")]


# --- POSIX behavior: manifest recorded, layout unchanged --------------------


def test_posix_commits_stay_materialized_with_manifest(spark, tmp_path):
    base = str(tmp_path / "lake")
    write_version(
        _df(spark, [(i, f"v{i}") for i in range(10)]).repartition(2), base
    )
    landing = str(tmp_path / "landing")
    _df(spark, [(50, "x")]).coalesce(1).write.parquet(landing)
    copy_into(spark, base, landing)
    tip = _tip(base)
    assert _entry_materialized(tip)
    files = _entry_files(base, tip)
    # every manifest rel is physically present in the tip's OWN dir
    assert set(files) == _own_files(base, tip)
    # identity still tracks origin: carried files point at v1's dir
    v1 = _read_log(base)[0]
    assert sorted(set(files.values())) == sorted({v1["dir"], tip["dir"]})


def test_legacy_commits_without_manifest_still_work(spark, tmp_path):
    """Pre-manifest tables (no ``files`` rider) read, diff, and accept
    new commits — the rider is synthesized from the materialized dir."""
    base = str(tmp_path / "lake")
    write_version(_df(spark, [(1, "a"), (2, "b")]), base)

    def strip(version):
        p = _commit_path(base, version)
        with open(p) as fh:
            doc = json.load(fh)
        doc.pop("files", None)
        doc.pop("materialized", None)
        with open(p, "w") as fh:
            json.dump(doc, fh)

    strip(1)
    assert _read_log(base)[0].get("files") is None
    assert rows(read_version(spark, base)) == [(1, "a"), (2, "b")]
    merge_versioned(spark, base, _df(spark, [(3, "c")]), ["id"])
    assert rows(read_version(spark, base)) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    ch = table_changes(spark, base, ["id"], 1)
    assert sorted(
        (r["id"], r["_change_type"]) for r in ch.collect()
    ) == [(3, "insert")]
