"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, on, by)`` attaches, to every left row, the most
recent right row with ``right.on <= left.on`` within the same ``by`` group
(the standard market-data / point-in-time-lookup join).

Implementation is the UNION + WINDOW composition, all JVM-side:

1. tag both inputs and union them by position on (by, on, tag, payload);
2. one window ``partitionBy(by).orderBy(on, tag)`` carries the last
   non-null right payload forward (``F.last(ignorenulls=True)``);
3. keep the left rows.

The right payload travels as ONE struct column, so every attached value
comes from the SAME right row — matching DuckDB ASOF / pandas merge_asof,
which attach the latest row wholesale, NULL fields included.  (Filling
each value column independently would stitch a NULL field from an older
right row.)

Cost: ONE shuffle on the group key + a per-group sort — same order of
work as a sort-merge join, with bounded state. This beats the naive
range-join (quadratic per group) and needs no pandas.  Skew note: a hot
``by`` group serializes inside one task; salt the group key and re-merge
if a single entity dominates the stream.

(For a pandas formulation, ``merge_asof`` inside ``applyInPandas`` gives
the same semantics; kept JVM-side here deliberately.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right values with ``right.on <= left.on``
    per ``by`` group.  Right rows at the exact same ``on`` instant match
    (<=, like DuckDB ASOF and pandas merge_asof defaults).

    ``value_cols``: right columns to attach (default: all non-key columns),
    each renamed ``<col><suffix>``.  All attached values come from the
    single most recent right row (row-wholesale semantics): a NULL field
    on that row stays NULL, it is never backfilled from an older row.
    """
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in by]
    value_cols = list(value_cols)

    # the whole right payload rides in one struct: the struct itself is
    # non-null on every right row (even when all fields are NULL), so
    # last(ignorenulls) picks the latest right ROW, not per-column values
    payload_type = right.select(*[F.col(c) for c in value_cols]).schema

    # tag=0 sorts right rows before left rows at equal timestamps, so an
    # exact-timestamp right row is visible to the left row (<= semantics)
    right_tagged = right.select(
        *by,
        F.col(on).alias("_on"),
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_rp"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_l_{c}")
            for c in left.columns
            if c not in by
        ],
    )
    left_tagged = left.select(
        *by,
        F.col(on).alias("_on"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(payload_type).alias("_rp"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns if c not in by],
    )
    unioned = right_tagged.unionByName(left_tagged)

    w = (
        Window.partitionBy(*by)
        .orderBy("_on", "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *by,
        "_tag",
        *[F.col(f"_l_{c}") for c in left.columns if c not in by],
        F.last("_rp", ignorenulls=True).over(w).alias("_rp"),
    )
    out = filled.filter(F.col("_tag") == 1).drop("_tag")
    for c in left.columns:
        if c not in by:
            out = out.withColumnRenamed(f"_l_{c}", c)
    return out.select(
        *left.columns,
        *[F.col("_rp").getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )
