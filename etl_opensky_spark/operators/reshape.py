"""Reshaping operators (SURVEY §2.10: R1-R2, §2.1: S7).

``melt`` re-expresses the reference's airlines unpivot
(reference: src/jobs/load_dim_aircrafts.py:209-224); ``date_spine`` the
SQL ``EXPLODE(SEQUENCE(...))`` calendar generator
(reference: src/jobs/load_dim_dates.py:61-69).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """R1 — wide -> long unpivot.  One output row per (id row × value col).

    Built on ``DataFrame.unpivot`` (SQL ``stack``) — a generator, no
    shuffle, width change only.
    """
    return df.unpivot(list(ids), list(values), var_name, value_name)


def date_spine(
    spark: SparkSession, start: str, end: str, out_col: str = "date_date"
) -> DataFrame:
    """S7/R2 — one row per day in [start, end] inclusive.

    ``explode(sequence(...))`` materializes the whole range on one task —
    fine for calendar spans (10 years = 3653 rows).  For huge spines use
    ``spark.range(days).select(date_add(start, id))`` which distributes.
    """
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)),
                F.to_date(F.lit(end)),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias(out_col)
    )


def fill_time_gaps(
    df,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
):
    """Per-key daily gap filling with last-observation-carried-forward.

    Classic time-series densification: for every key, a daily spine from
    its first to its last observed day; days with no observation get the
    most recent prior day's closing value (``filled = true``).  The
    closing value of an observed day is its LAST event by (ts, id) —
    deterministic under any partitioning.

    Scale shape: the spine is ``sequence()+explode`` per key (no driver
    loop, no global spine cross-join — each key generates only ITS OWN
    days); daily closing values are one ``max_by``-style aggregate; the
    carry-forward is ``last(ignorenulls)`` over a per-key window ordered
    by day — one shuffle on the key, state bounded by the key's span.
    """
    from pyspark.sql import Window as _W

    day = F.to_date(F.col(ts_col))
    daily = (
        df.withColumn("_day", day)
        .groupBy(key_col, "_day")
        .agg(
            F.max(
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(id_col).alias("i"),
                    F.col(value_col).alias("v"),
                )
            )["v"].alias("_close")
        )
    )
    span = df.groupBy(key_col).agg(
        F.min(day).alias("_d0"), F.max(day).alias("_d1")
    )
    spine = span.select(
        key_col,
        F.explode(
            F.sequence(F.col("_d0"), F.col("_d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("_day"),
    )
    joined = spine.join(daily, [key_col, "_day"], "left")
    w = (
        _W.partitionBy(key_col)
        .orderBy("_day")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    return joined.select(
        F.col(key_col),
        F.col("_day").alias("day"),
        F.last("_close", ignorenulls=True).over(w).alias("value"),
        F.col("_close").isNull().alias("filled"),
    )


def ewma_pow2(
    daily,
    key_col: str,
    day_col: str,
    value_col: str,
    horizon: int = 16,
):
    """Exact exponentially-weighted moving average (half-life 1 step)
    over a possibly-gappy daily series, truncated at ``horizon`` days —
    engine-exact because the weights are powers of two: the smoothed
    value is returned as an exact integer fraction
    ``(ewma_num, weight_den)`` with
    ``num = sum_{lag<H} v[t-lag] * 2^(H-1-lag)`` and ``den`` the sum of
    the weights of the days actually PRESENT (gap-aware
    renormalization).  ``num/den`` is the EWMA; callers divide once.

    Scale shape: the classic recursive EWMA is a sequential scan
    (unbounded window — one task per key at 100x); the truncated form
    is an EQUI-join: each anchor day explodes into ``horizon`` bounded
    probe rows ``(key, day - lag)`` that hash-join back to the series
    on the exact (key, day) key — key-partitioned shuffle, no range
    join, no nested loop, explosion bounded by the constant horizon.
    Truncation error is 2^-H of the oldest weight — below double
    precision at H=16 against any downstream float use.

    ``value_col`` must already be integral (micro-quantize floats
    first: ``functions.linalg.quantize_micros`` semantics).
    """
    # the daily table is consumed twice (anchors and series); checkpoint
    # so an upstream aggregation isn't re-run per consumer (plan-sweep
    # finding; (key, day)-sized, bounded)
    daily = daily.localCheckpoint()
    lags = F.explode(
        F.array(*[F.lit(i) for i in range(horizon)])
    ).alias("lag")
    probes = daily.select(
        F.col(key_col).alias("_k"),
        F.col(day_col).alias("_anchor"),
        lags,
    ).select(
        "_k",
        "_anchor",
        "lag",
        F.date_sub(F.col("_anchor"), F.col("lag")).alias("_src_day"),
    )
    series = daily.select(
        F.col(key_col).alias("_k"),
        F.col(day_col).alias("_src_day"),
        F.col(value_col).cast("bigint").alias("_v"),
    )
    # pyspark's F.shiftleft only takes a literal int shift; the SQL
    # function accepts a column expression
    weight = F.expr(f"shiftleft(cast(1 as bigint), {horizon - 1} - lag)")
    return (
        probes.join(series, ["_k", "_src_day"])
        .groupBy(
            F.col("_k").alias(key_col), F.col("_anchor").alias(day_col)
        )
        .agg(
            F.sum(F.col("_v") * weight).alias("ewma_num"),
            F.sum(weight).alias("weight_den"),
        )
    )


def interpolate_linear(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Linear interpolation of NULL gaps in a keyed ordered series —
    the smooth counterpart to ``fill_time_gaps``'s LOCF: a missing
    point between two known neighbors gets
    ``prev + floor((next − prev)·(t − t_prev) / (t_next − t_prev))``
    (integer inputs → the one floor, on a double formed from exact
    ints, is the only rounding — engine-portable).  Points before the
    first / after the last known value stay NULL (no extrapolation).

    ``order_col`` and ``value_col`` must be integer expressions (epoch
    days, micros).  Shape: two frame-bounded windows per key partition
    (carry-forward and carry-backward of the last/next known (t, v)
    struct) — bounded per-key state, no self-join, no explode.
    """
    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known = F.when(
        F.col(value_col).isNotNull(),
        F.struct(F.col(order_col).alias("t"), F.col(value_col).alias("v")),
    )
    out = (
        df.withColumn("_prev", F.last(known, ignorenulls=True).over(w_back))
        .withColumn("_next", F.first(known, ignorenulls=True).over(w_fwd))
    )
    pv, pt = F.col("_prev.v"), F.col("_prev.t")
    nv, nt = F.col("_next.v"), F.col("_next.t")
    interp = F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(
        F.when(
            F.col("_prev").isNotNull() & F.col("_next").isNotNull(),
            pv
            + F.floor(
                ((nv - pv) * (F.col(order_col) - pt)).cast("double")
                / (nt - pt)
            ).cast("long"),
        )
    )
    return out.withColumn(f"{value_col}_interp", interp).drop(
        "_prev", "_next"
    )
