"""Coalesced merge-on-read tombstones (VERDICT r6 #3): the read plan
carries exactly TWO broadcast joins no matter how many MOR deletes have
accumulated since the last OPTIMIZE — previously two joins PER sidecar.
"""

from __future__ import annotations

import json
import os

from etl_opensky_spark.sources.versioned import (
    _commit_path,
    _read_log,
    compact_versioned,
    merge_versioned,
    purge_versioned_mor,
    read_version,
    write_version,
)

from .conftest import rows


def _plan(df) -> str:
    # after an action, AQE's toString repeats the tree under an
    # "== Initial Plan ==" section — count joins in the final one only
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def _mk(spark, tmp_path, n=12):
    base = str(tmp_path / "lake")
    write_version(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(n)], "id int, v string"
        ),
        base,
    )
    return base


def test_join_count_constant_across_stacked_deletes(spark, tmp_path):
    base = _mk(spark, tmp_path)
    for k in range(5):
        purge_versioned_mor(
            spark, base, spark.createDataFrame([(k,)], "id int"), ["id"]
        )
    assert len(_read_log(base)[-1]["tombstones"]) == 5
    df = read_version(spark, base)
    assert _plan(df).count("BroadcastHashJoin") == 2
    assert rows(df) == [(i, f"v{i}") for i in range(5, 12)]


def test_scoped_semantics_survive_coalescing(spark, tmp_path):
    """Interleaved delete / re-insert / delete: each tombstone must
    keep ITS OWN file scope inside the coalesced frames — key 1's
    re-insert lands outside tombstone A's scope and stays visible,
    while tombstone B (committed after) still kills key 2
    everywhere it existed at B's commit time."""
    base = _mk(spark, tmp_path, n=4)
    purge_versioned_mor(  # tombstone A: kills 1 in the original file
        spark, base, spark.createDataFrame([(1,)], "id int"), ["id"]
    )
    merge_versioned(  # re-insert 1 -> NEW file, outside A's scope
        spark, base,
        spark.createDataFrame([(1, "v1b")], "id int, v string"), ["id"],
    )
    purge_versioned_mor(  # tombstone B: kills 2 (scope includes both files)
        spark, base, spark.createDataFrame([(2,)], "id int"), ["id"]
    )
    df = read_version(spark, base)
    assert rows(df) == [(0, "v0"), (1, "v1b"), (3, "v3")]
    assert _plan(df).count("BroadcastHashJoin") == 2
    # compaction still materializes everything away
    compact_versioned(spark, base)
    tip = read_version(spark, base)
    assert rows(tip) == [(0, "v0"), (1, "v1b"), (3, "v3")]
    assert "BroadcastHashJoin" not in _plan(tip)


def test_legacy_unscoped_sidecar_mixes_with_scoped(spark, tmp_path):
    """A pre-r6 unscoped sidecar (no _scope.json) coalesces into the
    same keys frame with match-any-file semantics: its keys die even
    in files written AFTER the delete."""
    base = _mk(spark, tmp_path, n=6)
    purge_versioned_mor(
        spark, base, spark.createDataFrame([(0,)], "id int"), ["id"]
    )
    # strip the scope from tombstone 0 -> legacy whole-table sidecar
    tip = _read_log(base)[-1]
    tomb = tip["tombstones"][0]
    tomb.pop("scoped")
    os.remove(
        os.path.join(base, tip["dir"], tomb["dir"], "_scope.json")
    )
    with open(_commit_path(base, tip["version"]), "w") as fh:
        json.dump(tip, fh)
    # re-insert 0 via a tombstone-CARRYING append (the DS writer
    # hardlinks the parent; a merge would materialize the sidecars
    # away on this non-partitioned table): the new file is outside
    # every scope, but the unscoped legacy sidecar still kills 0
    from etl_opensky_spark.sources.lakesource import (
        register_versioned_source,
    )

    register_versioned_source(spark)
    spark.createDataFrame(
        [(0, "v0b")], "id int, v string"
    ).write.format("versioned").mode("append").save(base)
    purge_versioned_mor(  # and a scoped one on top
        spark, base, spark.createDataFrame([(5,)], "id int"), ["id"]
    )
    df = read_version(spark, base)
    assert rows(df) == [(i, f"v{i}") for i in range(1, 5)]
    assert _plan(df).count("BroadcastHashJoin") == 2
