"""Change-data-capture apply: reconcile a changelog into a snapshot.

The lakehouse ingestion pattern the reference's append-only jobs stop
short of: upstream emits a log of ``(key, op ∈ {I,U,D}, seq, data...)``
rows (Debezium/CDC shape); applying it to the current snapshot yields
the next snapshot.  ``apply_changelog`` is the batch apply — the same
reconciliation a Delta/Iceberg ``MERGE`` with a deletes clause runs.

Scale shape: ONE shuffle windows the changelog per key (the changelog is
the small, recent side — days of changes vs years of snapshot); the
snapshot-side work is a single key equi-join (anti form), which AQE will
broadcast when the day's keyset is small, and the union is shuffle-free.
The snapshot is never globally sorted or windowed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changelog(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog to a snapshot; returns the next snapshot.

    ``changes`` carries the target's columns plus ``op_col`` (values
    'I'/'U'/'D') and ``seq_col`` (a monotone version — commit LSN,
    kafka offset…).  Per key, only the HIGHEST-seq change wins (a key
    updated five times then deleted is just deleted).  'I' and 'U' are
    both upserts (CDC streams routinely re-send inserts on snapshot
    re-syncs; distinguishing them adds failure modes, not information).
    Ties on ``seq_col`` within a key are rejected — a changelog with
    ambiguous ordering is corrupt upstream.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    # row_number vs rank over the SAME window (one shuffle): a key whose
    # top seq is tied has a row with rank 1 but row_number 2 — only ties
    # at the WINNING seq are ambiguous, deeper ties are irrelevant
    ranked = changes.select(
        "*",
        F.row_number().over(w).alias("_rn"),
        F.rank().over(w).alias("_rk"),
    )
    ambiguous = ranked.filter((F.col("_rk") == 1) & (F.col("_rn") == 2))
    if ambiguous.limit(1).count() > 0:
        raise ValueError(
            f"apply_changelog: duplicate {seq_col} at a key's winning "
            "change — changelog ordering is ambiguous"
        )
    latest = ranked.filter(F.col("_rn") == 1)
    upserts = latest.filter(F.col(op_col) != "D").select(*target.columns)
    touched = latest.select(*keys)
    kept = target.join(touched, keys, "left_anti")
    return kept.unionByName(upserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """The inverse of ``apply_changelog``: derive the changelog that
    turns snapshot ``old`` into snapshot ``new``.

    Emits one row per changed key with ``op ∈ {'I','U','D'}`` and the
    NEW values (for deletes, the old values — the row being retracted).
    Unchanged keys are omitted, so the output is the minimal delta — the
    thing you'd feed to ``apply_changelog``/``merge_parquet_keyed`` or
    publish as a CDC stream after a batch recompute.

    Scale shape: ONE full-outer key equi-join (both sides shuffle on the
    key, the only data-sized cost); change detection is a null-safe
    column comparison (``<=>`` — NULL==NULL is 'unchanged', the
    ``frames_differ`` lesson from the reference's always-False ``==`` at
    load_dim_airports.py:54), all map-side.
    """
    compare_cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in keys]
    )
    # side-presence markers: a NULL data column cannot distinguish "no row
    # on this side" from "row with NULL value" — explicit flags can.
    o = old.select(
        *keys, *[F.col(c).alias(f"_old_{c}") for c in compare_cols]
    ).withColumn("_in_old", F.lit(True))
    n = new.select(*keys, *compare_cols).withColumn("_in_new", F.lit(True))
    j = o.join(n, list(keys), "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_old_{c}").eqNullSafe(F.col(c))
    op = (
        F.when(F.col("_in_old").isNull(), F.lit("I"))
        .when(F.col("_in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    out_vals = [
        F.when(F.col("_in_new").isNull(), F.col(f"_old_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in compare_cols
    ]
    return (
        j.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(*keys, "op", *out_vals)
    )
