"""CDC replication: keep a downstream versioned table in sync with an
upstream one by shipping only the change feed.

The lakehouse replication story (Delta/Fivetran-style table sync): the
replica never rescans the source — each sync reads
:func:`sources.versioned.table_changes` since its cursor, reduces the
window to one FINAL disposition per key (a key updated five times and
then deleted is just deleted), and applies it as one keyed MERGE plus
one merge-on-read DELETE.  Sync cost is O(changes), and the replica is
itself a versioned table: time travel, constraints, its own downstream
feeds and MVs all compose.

Exactly-once without distributed transactions: the cursor (the source
version the replica reflects) rides the LAST commit of each sync cycle
via ``user_meta``.  A crash mid-cycle leaves the cursor un-advanced and
the partially-applied cycle is REPLAYED — safe because the apply is
idempotent (MERGE of the same post-images converges, a MOR delete of
already-deleted keys matches nothing and commits nothing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_opensky_spark.sources.versioned import (
    _current,
    _read_log,
    annotate_version,
    merge_versioned,
    purge_versioned_mor,
    read_version,
    table_changes,
    write_version,
)

_META_KEY = "replicate"


def _cursor(dst_base: str) -> dict | None:
    """Latest sync cursor: newest dst commit carrying replicate meta.
    Foreign commits on the replica (a manual merge, a compaction) are
    fine — they simply don't move the cursor."""
    for entry in reversed(_read_log(dst_base)):
        meta = (entry.get("user_meta") or {}).get(_META_KEY)
        if meta:
            return meta
    return None


def replicate_versioned(
    spark: SparkSession,
    src_base: str,
    dst_base: str,
    keys: Sequence[str],
    partition_by: Sequence[str] = (),
) -> tuple[int, int]:
    """One sync cycle.  First call seeds the replica with a full copy
    of the source tip; later calls apply only the feed.  Returns
    ``(dst_version, source_version_reflected)``.  ``partition_by`` is
    fixed at seed time and must be repeated on every call (it shapes
    the keyed MERGE's copy-on-write).  Requires the feed window to be
    un-vacuumed on the source — retention must outlast sync lag."""
    keys = list(keys)
    src_tip = _current(src_base)
    if src_tip is None:
        raise ValueError(f"no committed versions at {src_base}")
    cur = _cursor(dst_base)
    if cur is None:
        snap = read_version(spark, src_base)
        meta = {_META_KEY: {
            "source_version": src_tip["version"],
            "keys": keys,
            "partition_by": list(partition_by),
        }}
        v = write_version(
            snap, dst_base, partition_by=partition_by, user_meta=meta
        )
        return v, src_tip["version"]

    last = cur["source_version"]
    if src_tip["version"] == last:
        return _current(dst_base)["version"], last
    ch = table_changes(spark, src_base, keys, last, src_tip["version"])

    # final disposition per key: the newest commit wins; within it, the
    # post-image outranks the pre-image.  localCheckpoint because both
    # the upsert and delete branches consume it.
    w = Window.partitionBy(*keys).orderBy(
        F.col("_commit_version").desc(),
        F.when(F.col("_change_type") == "update_preimage", 1)
        .otherwise(0)
        .asc(),
    )
    final = (
        ch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint()
    )
    upserts = final.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type", "_commit_version")
    # a key inserted AND deleted inside the window never reached the
    # replica: restrict deletes to keys it actually holds, or the MOR
    # purge matches nothing, commits nothing, and the cursor stalls
    deletes = (
        final.filter(F.col("_change_type") == "delete")
        .select(*keys)
        .join(
            read_version(spark, dst_base).select(*keys),
            on=keys,
            how="left_semi",
        )
    )
    new_meta = {_META_KEY: {**cur, "source_version": src_tip["version"]}}
    n_up = upserts.count()
    n_del = deletes.count()
    if n_up:
        v = merge_versioned(
            spark,
            dst_base,
            upserts,
            keys=keys,
            partition_by=cur.get("partition_by") or (),
            merge_schema=True,  # source column ADDS propagate; a source
            # RENAME breaks the column match and raises — re-seed then
            user_meta=None if n_del else new_meta,
        )
    if n_del:
        v, _n = purge_versioned_mor(
            spark, dst_base, deletes, keys, user_meta=new_meta
        )
    if not n_up and not n_del:
        # nothing to move (row-preserving commits, or churn that
        # self-cancelled) — advance the cursor with a metadata commit
        # so the window is never re-diffed
        v = annotate_version(dst_base, new_meta)
    return v, src_tip["version"]


def replica_in_sync(spark: SparkSession, src_base: str, dst_base: str,
                    keys: Sequence[str]) -> bool:
    """Full-outer anti comparison — a TEST utility (O(both tables)),
    not part of the sync path."""
    a = read_version(spark, src_base)
    b = read_version(spark, dst_base)
    cols = a.columns
    return (
        a.exceptAll(b.select(*cols)).isEmpty()
        and b.select(*cols).exceptAll(a).isEmpty()
    )
