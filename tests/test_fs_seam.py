"""Filesystem seam (``sources.fs``) — the lake's three POSIX atomicity
points behind one injectable interface (VERDICT r5 Missing #2).

Covers: crash injection on either side of the put-if-absent commit
point (existence-is-the-commit contract), interrupted feed publication,
and a static lint that no lake module bypasses the seam.
"""

from __future__ import annotations

import os

import pytest

from etl_opensky_spark.sources.fs import LakeFS, get_fs, set_fs
from etl_opensky_spark.sources.versioned import (
    _read_log,
    materialize_change_feed,
    read_version,
    write_version,
)


class CrashingFS(LakeFS):
    """Injects one crash at a chosen point, then behaves normally."""

    def __init__(self, crash: str):
        self.crash = crash  # 'before_put' | 'after_put' | 'before_replace'
        self.calls: list[str] = []

    def put_if_absent(self, path: str, payload: bytes) -> None:
        self.calls.append("put_if_absent")
        if self.crash == "before_put":
            self.crash = ""
            raise OSError("injected: crashed before the commit create")
        super().put_if_absent(path, payload)
        if self.crash == "after_put":
            self.crash = ""
            raise OSError("injected: crashed after the durable create")

    def replace(self, tmp: str, final: str) -> None:
        self.calls.append("replace")
        if self.crash == "before_replace":
            self.crash = ""
            raise OSError("injected: crashed before publish")
        super().replace(tmp, final)


@pytest.fixture
def fs_restore():
    prev = get_fs()
    yield
    set_fs(prev)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], "id int, v string"
    )


def test_crash_before_commit_leaves_old_tip(spark, tmp_path, fs_restore):
    base = str(tmp_path / "lake")
    write_version(_df(spark, [(1, "a")]), base)
    fs = CrashingFS("before_put")
    set_fs(fs)
    with pytest.raises(OSError, match="injected"):
        write_version(_df(spark, [(2, "b")]), base)
    # old tip fully readable, no torn version; the orphan data dir is
    # debris only (vacuum's job)
    assert [e["version"] for e in _read_log(base)] == [1]
    assert [r["id"] for r in read_version(spark, base).collect()] == [1]
    # retry through the SAME seam succeeds
    write_version(_df(spark, [(2, "b")]), base)
    assert sorted(
        r["id"] for r in read_version(spark, base).collect()
    ) == [2]


def test_crash_after_durable_commit_is_committed(spark, tmp_path, fs_restore):
    """The contract callers rely on: put_if_absent returning (or having
    durably created the file) IS the commit — a crash one instruction
    later must leave a fully readable new version, because the data dir
    is staged completely before the commit point."""
    base = str(tmp_path / "lake")
    write_version(_df(spark, [(1, "a")]), base)
    set_fs(CrashingFS("after_put"))
    with pytest.raises(OSError, match="injected"):
        write_version(_df(spark, [(2, "b")]), base)
    assert [e["version"] for e in _read_log(base)] == [1, 2]
    assert sorted(
        r["id"] for r in read_version(spark, base).collect()
    ) == [2]


def test_interrupted_feed_publish_is_replayable(spark, tmp_path, fs_restore):
    base = str(tmp_path / "lake")
    feed = str(tmp_path / "feed")
    write_version(_df(spark, [(1, "a")]), base)
    write_version(_df(spark, [(1, "a"), (2, "b")]), base)
    set_fs(CrashingFS("before_replace"))
    with pytest.raises(OSError, match="injected"):
        materialize_change_feed(spark, base, feed, ["id"])
    # nothing half-published: only tmp debris, no commit= dir
    assert not [
        d for d in os.listdir(feed) if d.startswith("commit=")
    ]
    # the cursor is the directory set, so the retry re-publishes
    n_commits, _ = materialize_change_feed(spark, base, feed, ["id"])
    assert n_commits == 1
    assert spark.read.parquet(f"{feed}/commit=2").count() > 0


def _race_worker(base: str, wid: int, n_commits: int) -> None:
    """One OS process appending rows through the full copy-on-write +
    put-if-absent protocol (pyarrow data files — the commit point under
    test is the filesystem's, not Spark's)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_opensky_spark.sources import versioned as V

    done = 0
    while done < n_commits:
        cur = V._current(base)
        version = (cur["version"] if cur else 0) + 1
        name, data_dir = V._new_data_dir(base)
        if cur is not None:
            V._link_tree(os.path.join(base, cur["dir"]), data_dir)
        else:
            os.makedirs(data_dir)
        pq.write_table(
            pa.table({"wid": [wid], "seq": [done]}),
            os.path.join(data_dir, f"w{wid}-{done}.parquet"),
        )
        try:
            V._commit(base, version, name, "append")
            done += 1
        except V.ConcurrentCommitError:
            shutil.rmtree(data_dir, ignore_errors=True)  # lost the race


def test_cross_process_commit_race_serializable(spark, tmp_path):
    """Three REAL OS processes race optimistic commits on one table
    (VERDICT r5 #7 — the in-process ``merge_with_retry`` tests share a
    CPython and can't catch a broken cross-process O_EXCL): history
    must come out serializable — a dense version range, no lost update
    (every worker's every append present exactly once at the tip), and
    every intermediate snapshot complete and readable."""
    import multiprocessing as mp

    base = str(tmp_path / "race")
    os.makedirs(base)
    n_workers, n_each = 3, 4
    ctx = mp.get_context("spawn")  # fresh interpreters, no shared state
    procs = [
        ctx.Process(target=_race_worker, args=(base, w, n_each))
        for w in range(n_workers)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    log = _read_log(base)
    total = n_workers * n_each
    assert [e["version"] for e in log] == list(range(1, total + 1))
    tip = read_version(spark, base)
    got = sorted((r["wid"], r["seq"]) for r in tip.collect())
    assert got == [
        (w, s) for w in range(n_workers) for s in range(n_each)
    ]
    # no torn snapshot anywhere in history: version v holds exactly v rows
    for v in (1, total // 2, total):
        assert read_version(spark, base, as_of=v).count() == v


def test_seam_is_the_only_path():
    """Static enforcement: no lake module reaches for the three POSIX
    primitives directly — every future atomicity point must go through
    ``sources.fs`` (where the object-store contract is documented)."""
    root = os.path.join(
        os.path.dirname(__file__), "..", "etl_opensky_spark", "sources"
    )
    banned = ("O_EXCL", "os.replace(", "os.link(")
    for fname in sorted(os.listdir(root)):
        if not fname.endswith(".py") or fname == "fs.py":
            continue
        src = open(os.path.join(root, fname)).read()
        for tok in banned:
            hits = [
                i + 1
                for i, line in enumerate(src.splitlines())
                if tok in line and not line.lstrip().startswith("#")
                and "``" not in line  # docstring mentions of the contract
            ]
            assert not hits, f"{fname}:{hits} bypasses the fs seam ({tok})"


def test_put_if_absent_is_content_atomic(tmp_path):
    """The commit file appears WITH its payload or not at all: the
    hidden temp is linked into place (no empty-file window a racing
    _read_log could crash on) and no temp residue survives either
    outcome."""
    import pytest

    from etl_opensky_spark.sources.fs import LakeFS

    fs = LakeFS()
    p = str(tmp_path / "00000001.json")
    fs.put_if_absent(p, b'{"version": 1}')
    assert open(p, "rb").read() == b'{"version": 1}'
    with pytest.raises(FileExistsError):
        fs.put_if_absent(p, b"loser")
    assert open(p, "rb").read() == b'{"version": 1}'  # loser changed nothing
    import os as _os

    assert [n for n in _os.listdir(tmp_path) if ".put-" in n] == []
