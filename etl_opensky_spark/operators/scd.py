"""Slowly-changing-dimension type 2 merge — MERGE INTO emulated with
anti-join + union + window (no Delta/Iceberg jars in this environment;
swap the final overwrite for a real MERGE when a table format is present).

The reference's dims are full-refresh (change detection is broken there,
SURVEY §2.12); ``scd2_merge`` is the engine's upgrade path: history is
kept, current rows are closed out when attributes change, unchanged rows
pass through untouched.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
    effective_col: str = "valid_from",
    end_col: str = "valid_to",
    current_flag: str = "is_current",
    batch_ts: str | None = None,
) -> DataFrame:
    """Merge ``updates`` (one row per key: the new attribute values, with
    ``effective_col`` set) into an SCD2 ``current`` table.

    Returns the new full table:
    - rows whose key is absent from updates: unchanged;
    - keys whose compare columns changed: old current row closed
      (``end_col`` = update's effective ts, flag false) + new current row;
    - keys with identical compare columns: unchanged (no churn);
    - brand-new keys: inserted as current.

    Shuffle profile: one join on ``keys`` (broadcast if updates are small)
    + one union — no window needed because ``current`` already carries the
    current-flag.  NULL-safe comparison via ``eqNullSafe``.
    """
    keys = list(keys)
    compare_cols = list(compare_cols)

    cur_open = current.filter(F.col(current_flag))
    cur_closed = current.filter(~F.col(current_flag))

    # classify updates against the open rows
    upd = updates.alias("u")
    open_alias = cur_open.alias("c")
    join_cond = F.lit(True)
    for k in keys:
        join_cond = join_cond & (F.col(f"u.{k}") == F.col(f"c.{k}"))
    matched = upd.join(open_alias, join_cond, "left")

    changed_cond = F.lit(False)
    for c in compare_cols:
        changed_cond = changed_cond | ~F.col(f"u.{c}").eqNullSafe(F.col(f"c.{c}"))
    is_new_key = F.col(f"c.{keys[0]}").isNull()

    # new current rows: new keys + changed keys (update attrs win)
    incoming = matched.filter(is_new_key | changed_cond).select(
        *[F.col(f"u.{c}") for c in updates.columns],
    )
    incoming = incoming.withColumns(
        {end_col: F.lit(None).cast("timestamp"), current_flag: F.lit(True)}
    )

    # close out the open rows whose key changed
    changed_keys = matched.filter(changed_cond & ~is_new_key).select(
        *[F.col(f"u.{k}").alias(k) for k in keys],
        F.col(f"u.{effective_col}").alias("_new_from"),
    )
    # no forced broadcast: changed_keys scales with the update batch, so
    # the size check stays with AQE (still a broadcast join for typical
    # dim-sized update batches)
    closing = (
        cur_open.join(changed_keys, on=keys, how="inner")
        .withColumns({end_col: F.col("_new_from"), current_flag: F.lit(False)})
        .drop("_new_from")
    )
    surviving = cur_open.join(
        changed_keys.select(*keys), on=keys, how="left_anti"
    )

    out_cols = current.columns
    return (
        cur_closed.select(*out_cols)
        .unionByName(closing.select(*out_cols))
        .unionByName(surviving.select(*out_cols))
        .unionByName(incoming.select(*out_cols))
    )


def asof_lookup(
    scd: DataFrame,
    probes: DataFrame,
    key_col: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (AS OF) lookup against an SCD2 dimension: for each
    probe row (key, ts, ...), attach the dimension attributes whose
    version interval contains ts (``valid_from <= ts < valid_to``, open
    versions have NULL valid_to).  Probes with no version alive at ts
    keep NULL attributes (left join) — the caller decides whether that
    is an error or an expected pre-history probe.

    Scale shape: the join is an EQUI-join on the key (shuffle- or
    broadcast-hash-joinable); the interval predicate is a residual
    filter over each key's handful of versions — no range-join
    machinery needed because SCD2 versions per key are few by
    construction.  Exactly one version can match (versions are
    non-overlapping per key), so no post-dedup is required.
    """
    s = scd.alias("_dim")
    p = probes.alias("_probe")
    ts = F.col(f"_probe.{ts_col}")
    cond = (
        (F.col(f"_probe.{key_col}") == F.col(f"_dim.{key_col}"))
        & (F.col(f"_dim.{valid_from}") <= ts)
        & (
            F.col(f"_dim.{valid_to}").isNull()
            | (ts < F.col(f"_dim.{valid_to}"))
        )
    )
    dim_cols = [
        F.col(f"_dim.{c}") for c in scd.columns if c != key_col
    ]
    return p.join(s, cond, "left").select("_probe.*", *dim_cols)
