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
``by`` group serializes inside one task; pass ``salt_buckets > 1`` to
spread it over coarse time buckets with seam rows carrying each bucket's
incoming state (semantically invisible — see ``asof_join``).

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
    salt_buckets: int = 1,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join: latest right values with ``right.on <= left.on``
    per ``by`` group.  Right rows at the exact same ``on`` instant match
    (<=, like DuckDB ASOF and pandas merge_asof defaults).

    ``direction='forward'`` flips the inequality (EARLIEST right with
    ``right.on >= left.on`` — "next reading after the event"), matching
    pandas ``merge_asof(direction=...)``.  ``tolerance`` bounds the
    match distance in ``on`` units (seconds for timestamps): a carried
    match farther than ``tolerance`` is nulled out, row-wholesale.  The
    tolerance check compares the double cast of ``on`` (exact for
    timestamps and integers below 2^53).  Forward + ``salt_buckets>1``
    raises (the seam injection is backward-shaped; negate the axis
    upstream if a hot forward join needs salting).

    ``value_cols``: right columns to attach (default: all non-key columns),
    each renamed ``<col><suffix>``.  All attached values come from the
    single most recent right row (row-wholesale semantics): a NULL field
    on that row stays NULL, it is never backfilled from an older row.

    ``salt_buckets > 1`` — hot-entity salting (the docs/SCALE.md
    mitigation, semantically invisible): the time axis is cut into
    ``salt_buckets`` coarse ranges and the window partitions on
    ``(by, bucket)``, so one dominant entity spreads over up to
    ``salt_buckets`` tasks instead of serializing in one.  Seam rows
    carry each bucket's incoming state: the latest right payload from
    all EARLIER buckets is injected at ``-inf`` within the bucket (so
    float boundary rounding can never let a seam shadow a real in-bucket
    right row).  Costs one extra scalar agg job (global min/max of
    ``on``) plus a (groups × buckets)-sized seam computation — noise
    next to the main shuffle.  Numeric or timestamp ``on`` only (bucket
    arithmetic is on the double cast; longs beyond 2^53 would bucket
    coarsely — ordering within the window is still exact).
    """
    by = list(by)
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if direction == "forward" and salt_buckets > 1:
        raise ValueError(
            "asof_join: forward direction does not compose with "
            "salt_buckets (backward-shaped seam injection) — negate the "
            "time axis upstream instead"
        )
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in by]
    value_cols = list(value_cols)

    # the whole right payload rides in one struct: the struct itself is
    # non-null on every right row (even when all fields are NULL), so
    # last(ignorenulls) picks the latest right ROW, not per-column values.
    # `_asof_on` rides along for the tolerance check.
    payload_type = right.select(
        *[F.col(c) for c in value_cols],
        *(
            [F.col(on).cast("double").alias("_asof_on")]
            if tolerance is not None
            else []
        ),
    ).schema

    # tag=0 sorts right rows before left rows at equal timestamps, so an
    # exact-timestamp right row is visible to the left row (<= semantics)
    right_tagged = right.select(
        *by,
        F.col(on).alias("_on"),
        F.lit(0).alias("_tag"),
        F.struct(
            *[F.col(c) for c in value_cols],
            *(
                [F.col(on).cast("double").alias("_asof_on")]
                if tolerance is not None
                else []
            ),
        ).alias("_rp"),
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

    if salt_buckets > 1:
        filled = _salted_fill(unioned, by, left, salt_buckets)
    elif direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy("_on", "_tag")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.select(
            *by,
            "_tag",
            "_on",
            *[F.col(f"_l_{c}") for c in left.columns if c not in by],
            F.last("_rp", ignorenulls=True).over(w).alias("_rp"),
        )
    else:  # forward: EARLIEST right at-or-after; left sorts first at ties
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("_on"), F.col("_tag").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        filled = unioned.select(
            *by,
            "_tag",
            "_on",
            *[F.col(f"_l_{c}") for c in left.columns if c not in by],
            F.first("_rp", ignorenulls=True).over(w).alias("_rp"),
        )
    out = filled.filter(F.col("_tag") == 1).drop("_tag")
    if tolerance is not None:
        dist = F.col("_on").cast("double") - F.col("_rp").getField("_asof_on")
        if direction == "forward":
            dist = -dist
        out = out.withColumn(
            "_rp",
            F.when(dist <= F.lit(float(tolerance)), F.col("_rp")),
        )
    out = out.drop("_on")
    for c in left.columns:
        if c not in by:
            out = out.withColumnRenamed(f"_l_{c}", c)
    return out.select(
        *left.columns,
        *[F.col("_rp").getField(c).alias(f"{c}{suffix}") for c in value_cols],
    )


def _salted_fill(
    unioned: DataFrame, by: list, left: DataFrame, salt_buckets: int
) -> DataFrame:
    """Salted variant of the fill window: partition on ``(by, bucket)``
    with per-bucket seam rows carrying the incoming right state."""
    onb = F.col("_on").cast("double")
    stats = unioned.agg(
        F.min(onb).alias("lo"), F.max(onb).alias("hi")
    ).first()
    lo, hi = stats["lo"], stats["hi"]
    width = (hi - lo) / salt_buckets if lo is not None and hi > lo else None
    if width is None:
        bucket = F.lit(0)
    else:
        bucket = F.least(
            F.floor((onb - F.lit(lo)) / F.lit(width)),
            F.lit(salt_buckets - 1),
        ).cast("int")
    bucketed = unioned.withColumn("_onb", onb).withColumn("_bk", bucket)

    # latest right payload per (by, bucket): max_by on (time, tag) — the
    # same total order the window uses
    rights = bucketed.filter(F.col("_tag") == 0)
    per_bucket = rights.groupBy(*by, "_bk").agg(
        F.max_by("_rp", F.struct("_on", "_tag")).alias("_rp_last")
    )
    # every (by, bucket) that has ANY rows needs a seam (a bucket with
    # only left rows still inherits earlier state); running last over
    # strictly-earlier buckets — (groups × buckets)-sized data
    grid = bucketed.select(*by, "_bk").distinct()
    seam_w = (
        Window.partitionBy(*by)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seams = (
        grid.join(per_bucket, [*by, "_bk"], "left")
        .select(
            *by,
            "_bk",
            F.last("_rp_last", ignorenulls=True).over(seam_w).alias("_rp"),
        )
        .filter(F.col("_rp").isNotNull())
    )
    # seam sorts before EVERYTHING in its bucket (-inf), so boundary
    # float rounding can never let it shadow a real in-bucket right row
    seam_rows = seams.select(
        *by,
        F.lit(None).cast(dict(unioned.dtypes)["_on"]).alias("_on"),
        F.lit(-1).alias("_tag"),
        F.col("_rp"),
        *[
            F.lit(None).cast(dict(unioned.dtypes)[f"_l_{c}"]).alias(f"_l_{c}")
            for c in left.columns
            if c not in by
        ],
        F.lit(float("-inf")).alias("_onb"),
        F.col("_bk"),
    )
    salted = bucketed.unionByName(seam_rows)
    # _onb buckets/coarse-orders; _on is the exact tiebreak (double cast
    # is monotonic, so adding it can only refine equal-_onb runs — keeps
    # ordering exact even past double's 2^53 integer range)
    w = (
        Window.partitionBy(*by, "_bk")
        .orderBy("_onb", "_on", "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return salted.select(
        *by,
        "_tag",
        "_on",
        *[F.col(f"_l_{c}") for c in left.columns if c not in by],
        F.last("_rp", ignorenulls=True).over(w).alias("_rp"),
    )
