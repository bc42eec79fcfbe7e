"""Sinks (SURVEY §2.2: K1-K4).

The reference's idempotency is check-then-append (non-atomic, SURVEY §7.3);
the engine's default for partitioned re-loads is dynamic partition
OVERWRITE (session.py sets ``partitionOverwriteMode=dynamic``): rewriting a
day's partition is atomic-per-partition and needs no reconciliation scan of
the existing data — the scalable choice at 100 TB.  ``mode="append"`` +
``append_missing`` reproduces the reference's observable semantics where
bit-compat matters.

ACID note (VERDICT r4 #2): ``merge_parquet_keyed`` / ``purge_parquet_keyed``
/ ``compact_parquet`` here operate IN PLACE on a plain-parquet path —
readable by any engine with no manifest resolution, but their commit is a
sequence of per-partition directory renames with a crash window between the
first and last rename, serialized by a lock sentinel.  The ATOMIC path is
``sources.versioned``: immutable snapshot directories + a single
manifest-file commit (one ``put_if_absent``), optimistic writer concurrency,
snapshot-isolated readers, time travel — ``merge_versioned`` /
``purge_versioned`` / ``compact_versioned`` have the same call shapes and
are what the q102/q110/q111/q170/q205 gates exercise.  Keep the in-place
variants only when external plain-parquet readers preclude a manifest.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_opensky_spark.sources.fs import get_fs


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "append",
) -> None:
    """K1 — write into a hive-partitioned parquet layout
    (reference: src/jobs/extract_flights.py:96-99)."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed (hash-clustered) table write: later equi-joins/aggregations
    on ``bucket_by`` between tables bucketed the same way need NO shuffle —
    the physical layout IS the partitioning.  The decisive lever for
    repeated big-fact⋈big-fact joins at 100 TB: pay the shuffle once at
    write time, never again at read time.  Verified by plan-shape test
    (no Exchange under the SortMergeJoin of two co-bucketed tables).

    ``path`` makes the table external at that location (catalog keeps
    only metadata) — lets gate queries keep data under a temp dir
    instead of the session warehouse.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition + sort the data across files so every parquet
    file/row-group covers a NARROW slice of ``sort_cols`` — min/max
    footer statistics then let predicate pushdown skip whole row groups
    on range scans (the time-range query lever: a 1-day filter over a
    year of range-sorted events touches ~1/365 of the bytes, no
    directory partitioning required, no small-files explosion from
    high-cardinality partition keys).

    ``repartitionByRange`` samples the sort keys to build balanced range
    boundaries (one shuffle), ``sortWithinPartitions`` orders inside each
    file so row-group stats are tight.
    """
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(parts, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """K2-K4 — save as a catalog table (parquet-backed ``saveAsTable``;
    the reference uses ``format("hive")`` against a metastore,
    src/jobs/load_fct_flights.py:112-116 — same observable surface via
    ``spark.table(name)``).

    ``mode="overwrite_partitions"``: rewrite ONLY the partitions present
    in ``df`` (``INSERT OVERWRITE`` under ``partitionOverwriteMode=
    dynamic``) — the scalable idempotent day re-load; plain ``overwrite``
    via ``saveAsTable`` replaces the ENTIRE table, dynamic mode
    notwithstanding (it only governs insertInto/INSERT OVERWRITE).
    insertInto matches columns POSITIONALLY, so the frame is re-selected
    into the table's column order first.  Falls back to table creation
    when the target does not exist yet.
    """
    if mode == "overwrite_partitions":
        spark = df.sparkSession
        if spark.catalog.tableExists(name):
            df.select(*spark.table(name).columns).write.insertInto(
                name, overwrite=True
            )
            return
        mode = "overwrite"
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(name)


def zorder_key(cols: Sequence[F.Column], bits: int = 12) -> F.Column:
    """Morton (z-order) key: interleave the low ``bits`` bits of
    already-bucketed non-negative int columns.  Pure bitwise Column
    expression — JVM-side, codegen'd, ``len(cols) * bits`` terms.
    """
    from functools import reduce

    terms = []
    n = len(cols)
    for bit in range(bits):
        for j, c in enumerate(cols):
            terms.append(
                F.shiftleft(
                    F.shiftright(c.cast("long"), bit).bitwiseAND(F.lit(1)),
                    bit * n + j,
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def write_parquet_zordered(
    df: DataFrame,
    path: str,
    zorder_by: Sequence[str],
    bits: int = 12,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional clustering: sort the data along a Morton
    (z-order) curve over ``zorder_by`` so parquet footer min/max stats
    stay NARROW on EVERY z-ordered dimension at once — a single-column
    sort (``write_range_sorted``) gives perfect skipping on one
    predicate column and none on the others; the z-curve trades a
    little of each for skipping on all (the Delta/Databricks OPTIMIZE
    ZORDER layout idea, built from plain Spark ops).

    Each dimension is linearly scaled into ``2**bits`` buckets from a
    one-pass global min/max aggregate (two scalars per column on the
    driver — never the data), then bucket ids are bit-interleaved and
    the frame is range-partitioned + sorted by the key.  One shuffle,
    identical rows out, layout-only transform.  Numeric and timestamp
    columns supported (timestamps via epoch seconds).
    """
    if not zorder_by:
        raise ValueError("zorder_by must be non-empty")
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism

    def numeric(c: str) -> F.Column:
        dt = dict(df.dtypes)[c]
        col = F.col(c)
        if dt.startswith("timestamp"):
            col = F.unix_timestamp(col)
        return col.cast("double")

    bounds = df.agg(
        *[F.min(numeric(c)).alias(f"_lo_{i}") for i, c in enumerate(zorder_by)],
        *[F.max(numeric(c)).alias(f"_hi_{i}") for i, c in enumerate(zorder_by)],
    ).first()
    scaled = []
    top = (1 << bits) - 1
    for i, c in enumerate(zorder_by):
        lo, hi = bounds[f"_lo_{i}"], bounds[f"_hi_{i}"]
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor((numeric(c) - F.lit(lo)) / F.lit(span) * top),
            ).cast("long")
        )
    zkey = zorder_key(scaled, bits=bits)
    (
        df.withColumn("_zkey", zkey)
        .repartitionByRange(parts, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    partition_by: Sequence[str] = (),
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-file compaction for a parquet lake path (the OPTIMIZE /
    rewrite-small-files maintenance op): rewrite the dataset so each
    partition directory holds ~``target_rows_per_file``-row files
    instead of the per-task dribble incremental appends leave behind.
    At 100 TB the small-files problem is a read-throughput killer —
    every file is a scan task and a footer fetch.

    One data pass: rows are bucketed to ceil(partition_rows / target)
    output files via a hash bucket (per-partition row counts come from a
    footer-backed count aggregate first), written to a STAGING directory,
    then swapped in with a directory rename — the local stand-in for the
    metadata commit a table format (Delta/Iceberg) or an HDFS rename
    does; overwriting a path while reading it is illegal in Spark, and
    double-writing the data is not acceptable at scale.  Rows are
    identical in/out (layout-only).  Returns the number of partition
    directories compacted (1 for an unpartitioned path).
    """
    import os
    import shutil

    df = spark.read.parquet(path)
    cols = list(partition_by)
    staging = path.rstrip("/") + "._compacting"
    shutil.rmtree(staging, ignore_errors=True)
    if not cols:
        total = df.count()
        n_files = max(1, -(-total // target_rows_per_file))
        df.repartition(n_files).write.mode("overwrite").parquet(staging)
        n_parts = 1
    else:
        sizes = df.groupBy(*cols).count().collect()
        files_expr = None
        for row in sizes:
            n = max(1, -(-row["count"] // target_rows_per_file))
            clause = None
            for c in cols:
                eq = F.col(c) == F.lit(row[c])
                clause = eq if clause is None else (clause & eq)
            files_expr = (
                F.when(clause, F.lit(n)) if files_expr is None
                else files_expr.when(clause, F.lit(n))
            )
        n_parts = len(sizes)
        data_cols = [c for c in df.columns if c not in cols]
        bucket = F.abs(
            F.xxhash64(*[F.col(c) for c in data_cols]) % files_expr
        ).cast("int")
        (
            df.withColumn("_fb", bucket)
            .repartition(*[F.col(c) for c in cols], F.col("_fb"))
            .drop("_fb")
            .write.mode("overwrite")
            .partitionBy(*cols)
            .parquet(staging)
        )
    old = path.rstrip("/") + "._pre_compact"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return n_parts


class ConcurrentMergeError(RuntimeError):
    """Another writer holds the merge lock for this lake path."""


def _hive_dir(cols: Sequence[str], values) -> str:
    """Hive partition-directory suffix ``col1=v1/col2=v2`` — shares the
    versioned module's rejection of characters Spark would %-escape in
    directory names (a raw-suffix mismatch there silently corrupts
    copy-on-write partition accounting)."""
    from etl_opensky_spark.sources.versioned import _hive_dir as _vh

    return _vh(cols, values)


def merge_parquet_keyed(
    spark,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    partition_by: Sequence[str] = (),
    keys_are_partition_stable: bool = False,
    lock_timeout_sec: float = 0.0,
) -> None:
    """Keyed MERGE (upsert) into a parquet lake path, copy-on-write.

    Semantics of ``MERGE INTO target USING updates ON keys WHEN MATCHED
    THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`` — the ACID-shaped
    replacement for the reference's non-atomic check-then-append
    idempotency (reference: src/jobs/extract_flights.py:80-92; SURVEY
    §7.1-7, §7.3-6) without a table-format dependency.

    Copy-on-write, partition-scoped: only AFFECTED partitions are
    rewritten — a partition is affected when ``updates`` lands rows in it
    or currently holds a matched key (so a key whose partition value
    changes is deleted from its old partition).  Reconciled rows are
    written ONCE to a staging directory, then committed by per-partition
    directory rename — the local stand-in for a table format's metadata
    commit; data is never double-written and the target is never read
    and overwritten in the same job (illegal in Spark).  With
    ``keys_are_partition_stable=True`` the matched-key partition scan is
    skipped entirely (no row can move partitions) — the flag to set at
    100 TB when the key functionally determines the partition.

    Writer isolation: a ``._merge.lock`` sentinel (O_CREAT|O_EXCL —
    atomic on POSIX and HDFS-create semantics) serializes merges per
    path; a held lock raises :class:`ConcurrentMergeError` after
    ``lock_timeout_sec`` of polling.  Readers are unaffected except for
    the rename instant per partition directory.  A real multi-writer
    lake still wants Delta/Iceberg ``MERGE INTO`` — this op keeps the
    same call shape so a table-format backend can replace the commit
    step without touching callers.

    ``updates`` must be key-unique (multiple source matches per target
    row are ambiguous — same rule as Delta's MERGE, raises ValueError)
    and must carry exactly the target's columns.  Null partition values
    are rejected (no ``__HIVE_DEFAULT_PARTITION__`` handling).
    """
    import os
    import shutil
    import time as _time

    keys = list(keys)
    part_cols = list(partition_by)

    dup = updates.groupBy(*keys).count().filter(F.col("count") > 1)
    if dup.limit(1).count() > 0:
        raise ValueError(
            f"merge_parquet_keyed: updates contain duplicate keys on {keys}"
        )
    if part_cols:
        n_null = updates.filter(
            " OR ".join(f"{c} IS NULL" for c in part_cols)
        ).limit(1).count()
        if n_null:
            raise ValueError(
                "merge_parquet_keyed: null partition values are not supported"
            )

    if not os.path.exists(path):
        write_parquet_partitioned(
            updates, path, part_cols, mode="overwrite"
        ) if part_cols else updates.write.mode("overwrite").parquet(path)
        return

    lock = path.rstrip("/") + "._merge.lock"
    deadline = _time.monotonic() + lock_timeout_sec
    while True:
        try:
            get_fs().put_if_absent(lock, b"")
            break
        except FileExistsError:
            if _time.monotonic() >= deadline:
                raise ConcurrentMergeError(
                    f"merge lock held for {path} (stale? remove {lock})"
                ) from None
            _time.sleep(0.05)

    staging = path.rstrip("/") + "._merging"
    try:
        target = spark.read.parquet(path)
        if set(updates.columns) != set(target.columns):
            raise ValueError(
                f"merge_parquet_keyed: updates columns {sorted(updates.columns)} "
                f"!= target columns {sorted(target.columns)}"
            )
        upd = updates.localCheckpoint()  # one computation; reused 3×

        if not part_cols:
            reconciled = target.join(
                upd.select(*keys), on=keys, how="left_anti"
            ).unionByName(upd)
            shutil.rmtree(staging, ignore_errors=True)
            reconciled.write.mode("overwrite").parquet(staging)
            old = path.rstrip("/") + "._pre_merge"
            shutil.rmtree(old, ignore_errors=True)
            os.rename(path, old)
            os.rename(staging, path)
            shutil.rmtree(old)
            return

        affected = upd.select(*part_cols).distinct()
        if not keys_are_partition_stable:
            # partitions currently holding a matched key: column-pruned
            # scan of (keys + partition cols) only — parquet reads no
            # data columns for this probe
            moved_from = (
                target.select(*part_cols, *keys)
                .join(F.broadcast(upd.select(*keys)), on=keys, how="left_semi")
                .select(*part_cols)
                .distinct()
            )
            affected = affected.union(moved_from).distinct()
        affected_vals = [tuple(r[c] for c in part_cols) for r in affected.collect()]

        # DPP-prunable filter: broadcast semi join against the (small)
        # affected-partition list, so at scale only affected partition
        # directories are scanned for reconciliation
        existing_affected = target.join(
            F.broadcast(affected),
            on=part_cols,
            how="left_semi",
        )
        reconciled = existing_affected.join(
            upd.select(*keys), on=keys, how="left_anti"
        ).unionByName(upd).select(*target.columns)

        shutil.rmtree(staging, ignore_errors=True)
        reconciled.write.mode("overwrite").partitionBy(*part_cols).parquet(staging)

        # commit: per affected partition, drop the old directory and move
        # the staged one in (absent staged dir = partition emptied by a
        # key moving out)
        for vals in affected_vals:
            suffix = _hive_dir(part_cols, vals)
            tgt_dir = os.path.join(path, suffix)
            stg_dir = os.path.join(staging, suffix)
            shutil.rmtree(tgt_dir, ignore_errors=True)
            if os.path.isdir(stg_dir):
                os.makedirs(os.path.dirname(tgt_dir), exist_ok=True)
                os.rename(stg_dir, tgt_dir)
        shutil.rmtree(staging, ignore_errors=True)
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def purge_parquet_keyed(
    spark,
    path: str,
    delete_keys: DataFrame,
    keys: Sequence[str],
    partition_by: Sequence[str] = (),
    lock_timeout_sec: float = 0.0,
) -> int:
    """Keyed DELETE from a parquet lake path, copy-on-write — the
    right-to-be-forgotten / tombstone primitive (``DELETE FROM target
    WHERE (keys) IN delete_keys``) with the same commit protocol as
    :func:`merge_parquet_keyed`: only partitions that actually hold a
    matched key are rewritten (found by a column-pruned keys+partition
    probe — parquet reads no data columns), staged once, committed by
    per-partition directory rename under the shared ``._merge.lock``
    sentinel.  Returns the number of rows deleted (the audit count a
    GDPR workflow must record).

    At 100 TB the cost is proportional to the AFFECTED partitions, not
    the table: the probe is a broadcast semi join of the (small) delete
    set, and untouched partition directories are never read or moved.
    """
    import os
    import shutil
    import time as _time

    keys = list(keys)
    part_cols = list(partition_by)
    if not os.path.exists(path):
        return 0

    lock = path.rstrip("/") + "._merge.lock"
    deadline = _time.monotonic() + lock_timeout_sec
    while True:
        try:
            get_fs().put_if_absent(lock, b"")
            break
        except FileExistsError:
            if _time.monotonic() >= deadline:
                raise ConcurrentMergeError(
                    f"merge lock held for {path} (stale? remove {lock})"
                ) from None
            _time.sleep(0.05)

    staging = path.rstrip("/") + "._purging"
    try:
        target = spark.read.parquet(path)
        dk = delete_keys.select(*keys).distinct().localCheckpoint()
        n_deleted = target.join(
            F.broadcast(dk), on=keys, how="left_semi"
        ).count()
        if n_deleted == 0:
            return 0

        if not part_cols:
            kept = target.join(F.broadcast(dk), on=keys, how="left_anti")
            shutil.rmtree(staging, ignore_errors=True)
            kept.write.mode("overwrite").parquet(staging)
            old = path.rstrip("/") + "._pre_purge"
            shutil.rmtree(old, ignore_errors=True)
            os.rename(path, old)
            os.rename(staging, path)
            shutil.rmtree(old)
            return n_deleted

        affected = (
            target.select(*part_cols, *keys)
            .join(F.broadcast(dk), on=keys, how="left_semi")
            .select(*part_cols)
            .distinct()
        )
        affected_vals = [
            tuple(r[c] for c in part_cols) for r in affected.collect()
        ]
        kept = (
            target.join(F.broadcast(affected), on=part_cols, how="left_semi")
            .join(F.broadcast(dk), on=keys, how="left_anti")
            .select(*target.columns)
        )
        shutil.rmtree(staging, ignore_errors=True)
        kept.write.mode("overwrite").partitionBy(*part_cols).parquet(staging)
        for vals in affected_vals:
            suffix = _hive_dir(part_cols, vals)
            tgt_dir = os.path.join(path, suffix)
            stg_dir = os.path.join(staging, suffix)
            shutil.rmtree(tgt_dir, ignore_errors=True)
            if os.path.isdir(stg_dir):
                os.makedirs(os.path.dirname(tgt_dir), exist_ok=True)
                os.rename(stg_dir, tgt_dir)
        shutil.rmtree(staging, ignore_errors=True)
        return n_deleted
    finally:
        try:
            os.remove(lock)
        except FileNotFoundError:
            pass


def write_hash_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    hash_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Training-shard writer: one pass partitions the corpus into
    ``n_shards`` deterministic shards (md5 of the key — reproducible
    across runs, engines, and partitionings; never ``rand()``) and
    returns a MANIFEST DataFrame ``(shard, n_rows, checksum)`` computed
    from the data as written.

    The manifest is the training-job contract: a loader can verify
    every shard it downloads (row count + order-insensitive 60-bit-sum
    checksum over ``hash_cols``, the q168 anti-entropy scheme) without
    re-reading the whole corpus, and shard membership of any row is
    recomputable from its key alone.

    Scale shape: ONE write pass (``partitionBy(shard)`` → one directory
    per shard, writers stream), and the manifest aggregate is map-side
    combinable over the same scan — no global sort, no driver
    materialization of data.  Shard sizes concentrate at n/n_shards
    (md5 uniformity); hard per-file row caps, if required, compose via
    ``maxRecordsPerFile`` on the same writer.
    """
    shard = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        % n_shards
    ).cast("int")
    sharded = df.withColumn("shard", shard)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)

    back = df.sparkSession.read.parquet(path)
    cols = list(hash_cols) if hash_cols is not None else [key_col]
    rowhash = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols])),
            1,
            15,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    return back.groupBy("shard").agg(
        F.count("*").alias("n_rows"),
        F.sum(rowhash).alias("checksum"),
    )


def write_parquet_observed(
    df: DataFrame, path: str, metrics: dict[str, F.Column], mode: str = "overwrite"
) -> DataFrame:
    """Write with in-flight metrics (``Dataset.observe``): the metric
    expressions are evaluated ON THE WRITE PASS itself — zero extra
    scan, unlike the write-then-recount pattern (q37's re-read or the
    reference's triple lineage re-run, extract_flights.py:82-100 —
    count, show, write each re-executed the plan).  Returns a one-row
    DataFrame of the observed metrics, the audit record a load job
    ships to its manifest/metrics store.

    Only aggregate expressions are allowed (Spark's observe contract);
    at scale observation is a driver-merged accumulator — no shuffle,
    no second job.
    """
    from pyspark.sql import Observation

    obs = Observation()
    names = list(metrics)
    observed = df.observe(obs, *[metrics[n].alias(n) for n in names])
    observed.write.mode(mode).parquet(path)
    got = obs.get
    spark = df.sparkSession
    return spark.createDataFrame([tuple(got[n] for n in names)], names)
