"""User-behavior sequence analytics: ordered funnels and transition
matrices over an (entity, timestamp, event-type) stream.

The reference's warehouse rollups (``hql/agg_flights_daily.hql``) stop at
per-day counts; these operators cover the ordered-sequence questions a
product-analytics user asks of the same event stream: "how many users
completed step A then B then C, in order?" and "which event follows
which?".

Scale contract: every stage keys on the entity column, so the funnel's
per-step joins and the transition window reuse one hash partitioning on
``user_col``; step frames are user-cardinality (one row per surviving
user), never event-cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches step ``i`` if an event of
    type ``steps[i]`` occurs strictly after their earliest completion of
    step ``i-1``.  Returns one row per step: (step_idx, step, users).

    Each step is an aggregate to user grain joined to the filtered event
    slice for the next step — the classic cascading-minimum formulation.
    All joins key on ``user_col`` (co-partitioned, AQE may broadcast the
    shrinking step frame); no window over the raw event stream, so hot
    users cost one combine, not a sort.
    """
    if not steps:
        raise ValueError("need at least one funnel step")
    ev = df.select(user_col, ts_col, type_col)
    cur = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    out = []
    for i, s in enumerate(steps, start=1):
        if i > 1:
            cur = (
                ev.filter(F.col(type_col) == s)
                .join(cur, on=user_col)
                .filter(F.col(ts_col) > F.col("_t"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("_t"))
            )
        out.append(
            cur.agg(F.count("*").alias("users")).select(
                F.lit(i).alias("step_idx"), F.lit(s).alias("step"), "users"
            )
        )
    return reduce(lambda a, b: a.unionByName(b), out)


def event_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """First-order transition matrix: counts of consecutive
    (previous event type -> next event type) pairs within each user's
    timeline.  Pass ``order_cols`` to break timestamp ties
    deterministically (e.g. an event id).

    One shuffle for the per-user window; the output aggregate is
    type-cardinality squared (tiny), map-side combined.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    return (
        df.withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .agg(F.count("*").alias("n_transitions"))
    )


def last_touch_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    conversion_type: str,
    window_seconds: int,
    id_col: str,
) -> DataFrame:
    """Last-touch conversion attribution: each conversion event is
    credited to the user's most recent PRIOR non-conversion event, but
    only if it happened within ``window_seconds``; conversions with no
    qualifying touch are 'direct'.

    One shuffle (per-user window ordered by (ts, id)); the carry is
    ``last(ignorenulls)`` over a struct of (epoch, type) — a single
    window pass, no self-join of conversions against touches (which
    would re-shuffle the fact twice and explode on power users).
    Returns the conversion rows with ``attributed`` ∈ {touch types,
    'direct'}.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col) != conversion_type
    touch = F.when(
        is_touch,
        F.struct(
            F.col(ts_col).cast("long").alias("t"),
            F.col(type_col).alias("y"),
        ),
    )
    carried = events.withColumn(
        "_touch", F.last(touch, ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col(type_col) == conversion_type)
        .withColumn(
            "attributed",
            F.when(
                F.col("_touch").isNotNull()
                & (
                    F.col(ts_col).cast("long") - F.col("_touch")["t"]
                    <= window_seconds
                ),
                F.col("_touch")["y"],
            ).otherwise(F.lit("direct")),
        )
        .drop("_touch")
    )


def linear_attribution(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    channel_col: str,
    id_col: str,
    conversion_value: str,
) -> DataFrame:
    """Multi-touch LINEAR attribution — every pre-conversion touch
    shares the credit equally (vs ``last_touch_attribution``'s
    winner-takes-all): for a user with n touches before their FIRST
    conversion, each touch gets ``1_000_000 // n`` micro-credits and
    the remainder goes to the EARLIEST touch — integer arithmetic, so
    per-channel sums are exact in any engine.

    Shape: one window per user for the conversion cut (bounded by the
    user key), one count + rank window over the touch set, then a
    map-side-combinable per-channel sum.  Touches tie-break on
    (ts, id) — fully deterministic."""
    w_user = Window.partitionBy(user_col)
    conv = (
        events.filter(F.col(channel_col) == conversion_value)
        .groupBy(user_col)
        .agg(
            F.min(F.struct(F.col(ts_col), F.col(id_col))).alias("_conv")
        )
    )
    touches = (
        events.filter(F.col(channel_col) != conversion_value)
        .join(conv, user_col)
        .filter(
            F.struct(F.col(ts_col), F.col(id_col)) < F.col("_conv")
        )
    )
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    credited = (
        touches.withColumn("_pos", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(w_user))
        .withColumn(
            "credit_micros",
            # JVM integer `div`, not `/`-then-cast: float division can
            # land a hair above/below the integer and truncate
            # differently than the oracle's `//` (both args positive,
            # so div==floor-div — the graph.py div-semantics note)
            F.expr("1000000 div _n").cast("long")
            + F.when(
                F.col("_pos") == 1, F.lit(1_000_000) % F.col("_n")
            ).otherwise(0),
        )
    )
    return credited.groupBy(F.col(channel_col).alias("channel")).agg(
        F.count("*").alias("n_touches"),
        F.count_distinct(F.col(user_col)).alias("n_users"),
        F.sum("credit_micros").alias("credit_micros"),
    )


def time_decay_score(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    half_life_days: int = 7,
    max_halvings: int = 40,
) -> DataFrame:
    """Recency-weighted engagement score per user: each event
    contributes ``value · 2^(−k)`` where ``k = age_days div
    half_life_days`` — a STAIRCASE half-life decay, deliberately
    quantized to whole half-life steps so every weight is a dyadic
    rational and the aggregate is EXACT (continuous ``exp(−λ·age)``
    weights force float sums whose value depends on reduction order —
    not reproducible across engines or partitionings).

    The anchor is the stream's max timestamp (one scalar aggregate,
    broadcast); ages are non-negative.  Each term is scaled by
    ``2^max_halvings`` so it is an integer —
    ``cents · 2^(max_halvings−k)`` — and summed in DECIMAL(38,0)
    (int64 would overflow at ~1000 events/user · 2^40 · 10^4 cents);
    events older than ``max_halvings`` half-lives contribute exactly 0
    (their true weight is < 2^−40 ≈ 10^−12 of a fresh event).  The
    caller divides by ``2^max_halvings`` if a float score is wanted;
    the scaled DECIMAL is the exact, mergeable representation (two
    runs' scores add).

    Returns ``(user, n_events, score_scaled)`` with ``score_scaled =
    Σ cents·2^(max_halvings−k)`` exact.
    """
    anchor = events.agg(
        F.max(F.col(ts_col)).alias("_anchor")
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = events.crossJoin(F.broadcast(anchor)).withColumn(
        "_k",
        F.expr(
            f"((unix_timestamp(_anchor) - unix_timestamp({ts_col})) "
            f"div 86400) div {int(half_life_days)}"
        ),
    )
    pow2 = F.expr(
        f"shiftleft(cast(1 as bigint), cast({int(max_halvings)} - _k as int))"
    )
    term = (
        F.when(
            F.col("_k") > F.lit(int(max_halvings)),
            F.lit(0).cast("decimal(38,0)"),
        )
        .otherwise(
            (
                cents.cast("decimal(20,0)") * pow2.cast("decimal(20,0)")
            ).cast("decimal(38,0)")
        )
    )
    return (
        base.groupBy(F.col(user_col).alias("user"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(term).cast("decimal(38,0)").alias("score_scaled"),
        )
    )
