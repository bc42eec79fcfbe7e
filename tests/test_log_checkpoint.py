"""Commit-log checkpointing (VERDICT r6 #2): every
``CHECKPOINT_EVERY`` commits the winner rolls the log into one
checkpoint file; ``_read_log`` then costs 1 checkpoint + O(tail)
metadata reads instead of O(versions).  Checkpoints are accelerators
only — torn/missing ones degrade to the plain per-commit files.
"""

from __future__ import annotations

import builtins
import json
import os

import pytest

import etl_opensky_spark.sources.versioned as V
from etl_opensky_spark.sources.versioned import (
    CHECKPOINT_EVERY,
    _ckpt_path,
    _commit_path,
    _commits_dir,
    _read_log,
    annotate_version,
    merge_versioned,
    optimize_small_files,
    purge_versioned_mor,
    read_version,
    rename_column,
    restore_version,
    vacuum_versions,
    write_version,
)

from .conftest import rows


def _history(spark, tmp_path, n_commits=25):
    """A mixed-op history: writes, merges, MOR deletes, renames,
    annotations, a restore, an optimize — every rider type crosses at
    least one checkpoint boundary."""
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id int, v string"
        ),
        base,
    )
    ops = 1
    while ops < n_commits:
        k = ops % 7
        if k in (0, 1, 4):
            merge_versioned(
                spark, base,
                spark.createDataFrame(
                    [(100 + ops, f"m{ops}")], "id int, v string"
                ),
                ["id"],
            )
        elif k == 2:
            purge_versioned_mor(
                spark, base,
                spark.createDataFrame([(100 + ops - 1,)], "id int"),
                ["id"],
            )
        elif k == 3:
            annotate_version(base, {"tick": ops})
        elif k == 5:
            rename_column(spark, base, {"v": f"v_{ops}"})
            rename_column(spark, base, {f"v_{ops}": "v"})
            ops += 1
            continue
        else:
            restore_version(base, 1)
        ops += 1
    return base


def _raw_log(base):
    """Ground truth: every plain commit file, no checkpoint reads."""
    cdir = _commits_dir(base)
    out = []
    for name in sorted(os.listdir(cdir)):
        if name.endswith(".json") and not name.endswith(
            ".checkpoint.json"
        ):
            with open(os.path.join(cdir, name)) as fh:
                out.append(json.load(fh))
    return out


def test_checkpointed_log_identical_to_full_read(spark, tmp_path):
    base = _history(spark, tmp_path)
    raw = _raw_log(base)
    assert len(raw) >= 2 * CHECKPOINT_EVERY  # >=2 checkpoints exist
    assert os.path.exists(_ckpt_path(base, CHECKPOINT_EVERY))
    assert os.path.exists(_ckpt_path(base, 2 * CHECKPOINT_EVERY))
    assert _read_log(base) == raw
    # and the table still reads correctly through every rider
    assert read_version(spark, base).count() > 0


def test_read_is_checkpoint_plus_tail(spark, tmp_path):
    """Pin the O(tail) claim: a _read_log on a checkpointed table
    opens exactly one checkpoint file plus the commits past it."""
    base = _history(spark, tmp_path)
    tip = _read_log(base)[-1]["version"]
    last_ckpt = (tip // CHECKPOINT_EVERY) * CHECKPOINT_EVERY
    opened = []
    real_open = builtins.open

    def counting_open(path, *a, **kw):
        if str(path).endswith(".json"):
            opened.append(os.path.basename(str(path)))
        return real_open(path, *a, **kw)

    V.open = counting_open  # module-global shadows the builtin
    try:
        log = _read_log(base)
    finally:
        del V.open
    assert log[-1]["version"] == tip
    ckpt_reads = [n for n in opened if n.endswith(".checkpoint.json")]
    commit_reads = [
        n for n in opened if not n.endswith(".checkpoint.json")
    ]
    assert len(ckpt_reads) == 1
    assert len(commit_reads) == tip - last_ckpt


def test_torn_checkpoint_falls_back(spark, tmp_path):
    base = _history(spark, tmp_path)
    raw = _raw_log(base)
    tip = raw[-1]["version"]
    newest = (tip // CHECKPOINT_EVERY) * CHECKPOINT_EVERY
    with open(_ckpt_path(base, newest), "w") as fh:
        fh.write('{"version":')  # torn mid-write
    assert _read_log(base) == raw  # older checkpoint or full fallback
    os.remove(_ckpt_path(base, newest))
    os.remove(_ckpt_path(base, CHECKPOINT_EVERY))
    assert _read_log(base) == raw  # no checkpoints at all: plain read


def test_vacuum_drops_checkpoints_and_log_stays_consistent(
    spark, tmp_path
):
    base = _history(spark, tmp_path)
    before = read_version(spark, base)
    want = rows(before)
    dropped = vacuum_versions(base, keep_last=2)
    assert dropped
    assert not any(
        n.endswith(".checkpoint.json")
        for n in os.listdir(_commits_dir(base))
    )
    log = _read_log(base)
    assert len(log) == 2
    assert rows(read_version(spark, base)) == want
    with pytest.raises(ValueError):
        read_version(spark, base, as_of=dropped[0])
    # and new commits re-checkpoint on the next boundary
    tip = log[-1]["version"]
    nxt = ((tip // CHECKPOINT_EVERY) + 1) * CHECKPOINT_EVERY
    for _ in range(nxt - tip):
        annotate_version(base, {"pad": True})
    assert os.path.exists(_ckpt_path(base, nxt))
    assert _read_log(base)[-1]["version"] == nxt


def test_checkpoint_excludes_racing_future_commits(spark, tmp_path):
    """A checkpoint at V must contain entries <= V only, even if a
    faster writer already landed V+1 before the checkpoint write —
    else the tail read would double-count V+1."""
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame([(1, "a")], "id int, v string"), base
    )
    tip = 1
    while tip < CHECKPOINT_EVERY - 1:
        tip = annotate_version(base, {"pad": True})
    tip_dir = _read_log(base)[-1]["dir"]
    # land BOTH V and V+1 as plain commit files, then checkpoint V
    for v in (CHECKPOINT_EVERY, CHECKPOINT_EVERY + 1):
        with open(_commit_path(base, v), "x") as fh:
            json.dump(
                {"version": v, "dir": tip_dir,
                 "op": "annotate", "parent": v - 1},
                fh,
            )
    V._write_checkpoint(base, CHECKPOINT_EVERY)
    with open(_ckpt_path(base, CHECKPOINT_EVERY)) as fh:
        doc = json.load(fh)
    assert doc["entries"][-1]["version"] == CHECKPOINT_EVERY
    log = _read_log(base)
    assert [e["version"] for e in log] == list(
        range(1, CHECKPOINT_EVERY + 2)
    )


def test_optimize_and_mor_round_trip_across_checkpoint(spark, tmp_path):
    """Lifecycle sanity: MOR deletes + OPTIMIZE on a table whose log
    is read through a checkpoint behave identically."""
    base = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(30)], "id int, v string"
    )
    write_version(df.repartition(6), base)
    tip = 1
    while tip < CHECKPOINT_EVERY:
        tip = annotate_version(base, {"pad": True})
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(0,), (7,)], "id int"), ["id"]
    )
    v, n = optimize_small_files(spark, base, target_rows_per_file=100)
    assert n >= 2
    got = rows(read_version(spark, base))
    assert got == [(i, f"v{i}") for i in range(30) if i not in (0, 7)]
