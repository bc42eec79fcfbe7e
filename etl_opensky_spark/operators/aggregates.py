"""Aggregation helpers beyond plain ``groupBy().agg()`` (SURVEY §2.6).

The reference only ever aggregates with ``count()`` for control flow; the
warehouse exists so users can run analytic aggregations.  Spark's hash
aggregate with partial (map-side) combine is automatic — these helpers
cover the common patterns that need more than one call.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Column | Sequence[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group by ``order_cols`` (descending callers pass
    ``F.col(c).desc()``).

    ``row_number`` over a PARTITIONED window: each group sorts locally
    after one shuffle on the group key — scales with group count, no
    global sort.  Ties: include a tie-break column in ``order_cols`` for
    determinism.
    """
    if isinstance(order_cols, Column):
        order_cols = [order_cols]
    window = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(window)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def time_rollup(
    df: DataFrame,
    ts_col: str,
    every: str,
    group_cols: Sequence[str],
    aggs: dict[str, Column],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Time-bucketed pre-aggregation (the continuous-aggregate /
    hypertable-rollup pattern): truncate ``ts_col`` to ``every``
    ('hour', 'day', 'week', ...) and aggregate per (bucket, groups).

    The point at scale: materialize a fine rollup ONCE (e.g. hourly),
    then answer coarser queries by RE-aggregating the rollup
    (``reaggregate_rollup``) — count/sum/min/max re-aggregate losslessly,
    so a daily query reads ~24 rows per key instead of the raw corpus.
    One shuffle on (bucket, groups) with map-side partial aggregation.
    """
    bucket = F.date_trunc(every, F.col(ts_col)).alias(bucket_col)
    return df.groupBy(bucket, *group_cols).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )


#: how each rollup measure re-aggregates to a coarser grain
_REAGG = {
    "sum": F.sum,
    "count": F.sum,  # counts ADD across finer buckets
    "min": F.min,
    "max": F.max,
}


def reaggregate_rollup(
    rollup: DataFrame,
    every: str,
    group_cols: Sequence[str],
    measures: dict[str, str],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Re-aggregate a fine ``time_rollup`` output to a coarser grain.
    ``measures`` maps column -> its rollup kind ('sum' | 'count' | 'min'
    | 'max' — the losslessly re-aggregable measures; averages must be
    carried as sum+count pairs).  Input is rollup-sized, not raw-sized.
    """
    unknown = {k for k in measures.values() if k not in _REAGG}
    if unknown:
        raise ValueError(f"not re-aggregable: {sorted(unknown)}")
    coarse = F.date_trunc(every, F.col(bucket_col)).alias(bucket_col)
    return rollup.groupBy(coarse, *group_cols).agg(
        *[_REAGG[kind](F.col(name)).alias(name) for name, kind in measures.items()]
    )


def merge_rollup(
    rollup: DataFrame,
    delta: DataFrame,
    ts_col: str,
    every: str,
    group_cols: Sequence[str],
    aggs: dict[str, Column],
    measures: dict[str, str],
    bucket_col: str = "bucket",
    mode: str = "combine",
) -> DataFrame:
    """Incremental maintenance of a materialized ``time_rollup``: fold a
    raw ``delta`` batch into an existing ``rollup`` touching ONLY the
    (bucket, groups) keys the delta lands in — every other rollup row
    passes through verbatim, so refresh cost scales with the delta, not
    the rollup's history.

    ``aggs`` must be the same aggregation dict the rollup was built
    with; ``measures`` maps each measure to its merge kind ('sum' |
    'count' | 'min' | 'max', as in ``reaggregate_rollup``).

    ``mode='combine'`` (append-only deltas): existing rows for affected
    keys are combined with the delta's partial aggregates — counts/sums
    add, min/max fold.  ``mode='replace'`` (updates/deletes): ``delta``
    must be the FULL raw data for its buckets; affected rollup rows are
    discarded and replaced by the fresh aggregates (a key whose raw rows
    all vanished needs its rollup row deleted separately — a rollup-side
    anti join on the surviving keys).

    Scale shape: the delta aggregates with one map-side-combining
    shuffle; the affected-key list is delta-grain-sized (typically a few
    recent buckets), so AQE broadcasts the semi/anti joins against the
    large rollup — no forced hint, a backfill delta with millions of
    keys falls back to a shuffle join instead of OOMing the driver.
    """
    if mode not in ("combine", "replace"):
        raise ValueError(f"unknown mode: {mode!r}")
    delta_rollup = time_rollup(delta, ts_col, every, group_cols, aggs, bucket_col)
    keys = [bucket_col, *group_cols]
    affected = delta_rollup.select(*keys).distinct()
    untouched = rollup.join(affected, keys, "left_anti")
    if mode == "replace":
        return untouched.unionByName(delta_rollup)
    unknown = {k for k in measures.values() if k not in _REAGG}
    if unknown:
        raise ValueError(f"not re-aggregable: {sorted(unknown)}")
    touched = rollup.join(affected, keys, "left_semi")
    merged = (
        touched.unionByName(delta_rollup)
        .groupBy(*keys)
        .agg(
            *[_REAGG[kind](F.col(name)).alias(name) for name, kind in measures.items()]
        )
    )
    return untouched.unionByName(merged)


def equi_width_histogram(
    df: DataFrame,
    col: str,
    bin_width: float,
    origin: float = 0.0,
    bucket_col: str = "bucket",
    count_col: str = "n",
) -> DataFrame:
    """Equi-width histogram: one map-side-combining groupBy on the bucket
    index ``floor((x - origin) / bin_width)`` — a single pass, no
    data-dependent pre-scan.  Empty buckets are absent (dense ranges can
    be rebuilt by joining a bucket spine).  NULLs are dropped."""
    bucket = F.floor(
        (F.col(col).cast("double") - F.lit(float(origin)))
        / F.lit(float(bin_width))
    ).alias(bucket_col)
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bucket)
        .agg(F.count("*").alias(count_col))
    )


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Data-profiling summary: one row per column with row count, null
    count, distinct count, and min/max (as strings, so heterogeneous
    column types stack into one frame).

    ONE aggregation pass computes every metric for every column
    simultaneously (a per-column loop would scan the table N times);
    the wide 1-row result is reshaped driver-side — it is metrics-sized,
    not data-sized.  ``count_distinct`` is exact (shuffles distinct
    values per column); swap ``approx_count_distinct`` in at corpus
    scale where 2% error is acceptable.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.isnull(F.col(c)).cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs).collect()[0]
    rows = [
        (
            c,
            wide[f"{c}__rows"],
            wide[f"{c}__nulls"],
            wide[f"{c}__distinct"],
            wide[f"{c}__min"],
            wide[f"{c}__max"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        rows,
        "column string, n_rows long, n_nulls long, n_distinct long, "
        "min_value string, max_value string",
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lower_q, upper_q] exact
    quantiles (winsorization — the standard outlier treatment before
    aggregating noisy metrics or training on numeric features).

    The per-group quantile table is one aggregate (``group_cols``
    cardinality rows) joined back on the group key, then a narrow
    ``least/greatest`` clip.  No broadcast hint: group cardinality is
    unbounded (per-user groups at corpus scale can be 1e8+ rows), so the
    join is left to AQE — it picks broadcast when the stats table fits
    and a key-shuffle hash join when it doesn't.  Swap
    ``percentile_approx`` into the agg at 100 TB if the exact per-group
    sort is too hot — the clip plumbing is unchanged.
    """
    if not 0.0 <= lower_q <= upper_q <= 1.0:
        raise ValueError("need 0 <= lower_q <= upper_q <= 1")
    out_col = out_col or f"{value_col}_winsorized"
    v = F.col(value_col).cast("double")
    bounds = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, {lower_q})").alias("_lo"),
        F.expr(f"percentile({value_col}, {upper_q})").alias("_hi"),
    )
    return (
        df.join(bounds, on=list(group_cols), how="left")
        .withColumn(out_col, F.least(F.greatest(v, F.col("_lo")), F.col("_hi")))
        .drop("_lo", "_hi")
    )


def normalize_features(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
) -> DataFrame:
    """Per-group feature scaling: appends ``{value_col}_zscore``
    (standard score), ``{value_col}_minmax`` ([0,1] rescale), and
    ``{value_col}_robust`` (median/MAD score, the outlier-insensitive
    variant) — the standard numeric-feature treatments before training.

    Two aggregate passes (moments+median, then MAD — the median of
    absolute deviations needs the median first).  The two stats tables
    are group-cardinality, so they join EACH OTHER first (stats-sized
    join) and the combined table comes back onto the data in a single
    join — the full data passes through exactly one join, not two.

    No broadcast hints — group cardinality is unbounded.  Instead the
    combined stats table is ``localCheckpoint``-ed (group-cardinality
    rows, trivially small to materialize): the planner then sees its
    TRUE size and picks broadcast when it fits, shuffle-hash/merge when
    it genuinely doesn't — the adaptive choice AQE cannot make here on
    its own, because the MAD aggregate runs mid-stage (above a
    broadcast, no shuffle boundary) so its size estimate never updates
    from the data-proportional static guess.  The checkpoint also stops
    the moments aggregate being computed twice (it feeds both the MAD
    pass and the final join).  Degenerate groups (zero spread) yield
    NULL scores rather than infinities.
    """
    v = F.col(value_col).cast("double")
    stats = df.groupBy(*group_cols).agg(
        F.avg(v).alias("_mean"),
        F.stddev_samp(v).alias("_std"),
        F.min(v).alias("_min"),
        F.max(v).alias("_max"),
        F.expr(f"percentile({value_col}, 0.5)").alias("_med"),
    ).localCheckpoint()
    mad = (
        df.join(stats.select(*group_cols, "_med"), on=list(group_cols))
        .withColumn("_absdev", F.abs(v - F.col("_med")))
        .groupBy(*group_cols)
        .agg(F.expr("percentile(_absdev, 0.5)").alias("_mad"))
    )
    all_stats = stats.join(mad, on=list(group_cols), how="left").localCheckpoint()
    scored = (
        df.join(all_stats, on=list(group_cols), how="left")
        .withColumn(
            f"{value_col}_zscore",
            F.when(F.col("_std") > 0, (v - F.col("_mean")) / F.col("_std")),
        )
        .withColumn(
            f"{value_col}_minmax",
            F.when(
                F.col("_max") > F.col("_min"),
                (v - F.col("_min")) / (F.col("_max") - F.col("_min")),
            ),
        )
        .withColumn(
            f"{value_col}_robust",
            F.when(
                F.col("_mad") > 0,
                (v - F.col("_med")) / (F.lit(1.4826) * F.col("_mad")),
            ),
        )
    )
    return scored.drop("_mean", "_std", "_min", "_max", "_med", "_mad")


def equal_frequency_bins(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int,
    num_buckets: int = 64,
) -> DataFrame:
    """Per-group EXACT equal-frequency (quantile) binning — the feature
    discretizer: every row gets ``bin = floor(rank·k / n)`` where rank
    is the row's 0-based position in its group's (value, id) total
    order and n the group size.  Deterministic integer semantics — no
    float quantile edges, so no cross-engine ULP hazards at bin
    boundaries.

    The naive formulation is a rank window PER GROUP — one task per
    group no matter how large (the q76 exact-percentile trap).  Here
    the global rank comes from the distributed prefix-sum pattern
    (``sampling.take_until_budget``): ``repartitionByRange`` over
    (group, value, id) makes each partition an ordered slice, local
    ranks come from windows over BOUNDED (partition, group) slices, and
    the cross-partition offsets are a driver-side prefix sum over the
    (partition × group) count table (bounded: buckets × groups rows).
    The range layout is pinned with ``localCheckpoint`` so the counts
    pass and the rank pass see the same partitioning.
    """
    from pyspark.sql import Window as _W

    ranged = (
        df.repartitionByRange(
            num_buckets,
            F.col(group_col),
            F.col(value_col),
            F.col(id_col),
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = (
        ranged.groupBy("_pid", group_col)
        .agg(F.count("*").alias("_c"))
        .collect()
    )
    sizes: dict = {}
    for row in counts:
        sizes[row[group_col]] = sizes.get(row[group_col], 0) + row["_c"]
    offsets = []
    running: dict = {}
    for row in sorted(counts, key=lambda r: (str(r[group_col]), r["_pid"])):
        g = row[group_col]
        offsets.append((row["_pid"], g, running.get(g, 0), sizes[g]))
        running[g] = running.get(g, 0) + row["_c"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offsets, ["_pid", group_col, "_offset", "_n"]
    )
    w = _W.partitionBy("_pid", group_col).orderBy(
        F.col(value_col), F.col(id_col)
    )
    ranked = ranged.withColumn("_lrn", F.row_number().over(w)).join(
        F.broadcast(off_df), ["_pid", group_col]
    )
    rank0 = F.col("_offset") + F.col("_lrn") - 1
    return ranked.withColumn(
        "bin", F.floor(rank0 * k / F.col("_n")).cast("int")
    ).drop("_pid", "_lrn", "_offset", "_n")


def multi_count_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_cols: Sequence[str],
) -> DataFrame:
    """COUNT(DISTINCT a), COUNT(DISTINCT b), ... per group WITHOUT
    Catalyst's Expand strategy.

    Spark plans multiple distinct aggregates in one ``agg`` via Expand:
    every input row is REPLICATED once per distinct column before the
    shuffle — at 100 TB, three distinct columns means shuffling 3× the
    dataset.  This helper runs one two-phase aggregate per column
    (map-side-deduped ``distinct`` on (keys, col), then a count) and
    joins the per-column results on the group keys — total shuffled
    volume is Σ|distinct(keys, col)|, which skew-resistant partial
    aggregation compresses BEFORE the wire, instead of row-count ×
    n_cols.  NULLs are excluded per SQL COUNT(DISTINCT) semantics.
    Absence of Expand is plan-asserted in tests.
    """
    keys = list(group_cols)
    out = None
    for c in distinct_cols:
        per = (
            df.filter(F.col(c).isNotNull())
            .select(*keys, c)
            .distinct()
            .groupBy(*keys)
            .agg(F.count("*").alias(f"n_distinct_{c}"))
        )
        out = per if out is None else out.join(per, keys, "full_outer")
    # groups whose every value was NULL for some column: count is 0
    assert out is not None, "distinct_cols must be non-empty"
    return out.select(
        *keys,
        *[
            F.coalesce(F.col(f"n_distinct_{c}"), F.lit(0)).alias(
                f"n_distinct_{c}"
            )
            for c in distinct_cols
        ],
    )


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
) -> DataFrame:
    """Exact 2-D skyline (Pareto frontier): rows not dominated by any
    other — dominated means another row is <= on ``min_col`` AND >= on
    ``max_col`` with at least one strict.  Duplicate (min, max) pairs
    collapse to one frontier point.

    The naive plan is a NOT-EXISTS self-join (O(n²)) or a single global
    window (one task).  This is the distributed sort-scan: after
    dedup, ``repartitionByRange(min asc, max desc)`` makes each
    partition an ordered slice; within a slice the running max of
    ``max_col`` over PRIOR rows decides dominance locally, and the only
    cross-partition state is ONE number per partition (its max), prefix-
    maxed on the driver and broadcast back — the q56/q70/q115 prefix
    pattern.  A point survives iff its ``max_col`` beats every prior
    row's: with the (min asc, max desc) order, any prior row with
    running-max >= this row's value is a strict dominator.
    """
    from pyspark.sql import Window as _W

    pts = df.select(
        F.col(min_col).alias("_x"), F.col(max_col).alias("_y")
    ).distinct()
    ranged = (
        pts.repartitionByRange(
            df.sparkSession.sparkContext.defaultParallelism,
            F.col("_x").asc(),
            F.col("_y").desc(),
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    part_max = ranged.groupBy("_pid").agg(F.max("_y").alias("_m")).collect()
    prefix: dict[int, float] = {}
    best = None
    for row in sorted(part_max, key=lambda r: r["_pid"]):
        prefix[row["_pid"]] = best
        best = row["_m"] if best is None else max(best, row["_m"])
    spark = df.sparkSession
    pre_df = spark.createDataFrame(
        [
            (pid, float(v) if v is not None else None)
            for pid, v in prefix.items()
        ],
        schema="_pid int, _prev_max double",
    )
    w = (
        _W.partitionBy("_pid")
        .orderBy(F.col("_x").asc(), F.col("_y").desc())
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    local_prev = F.max("_y").over(w)
    return (
        ranged.join(F.broadcast(pre_df), "_pid")
        .withColumn(
            "_dom",
            F.greatest(
                F.coalesce(local_prev, F.lit(float("-inf"))),
                F.coalesce(F.col("_prev_max"), F.lit(float("-inf"))),
            ),
        )
        .filter(F.col("_y") > F.col("_dom"))
        .select(F.col("_x").alias(min_col), F.col("_y").alias(max_col))
    )


def _group_lower_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Exact LOWER median per group — the 1-based element at position
    ``(n+1) div 2`` of the group's sorted values.  Element SELECTION,
    not interpolation: the result is an actual input value, identical
    in any engine (no midpoint-average float-order hazard).

    Shape: one shuffle on the group key; per-group state via sort-free
    two-pass (count, then row_number window per group).  Groups here are
    LOW-cardinality dimensions (event types, sources) so the per-group
    window is acceptable; for high-cardinality value domains use the
    ``equal_frequency_bins`` range-partitioned rank instead.
    """
    from pyspark.sql import Window as _W

    n = df.groupBy(group_col).agg(F.count(value_col).alias("_n"))
    w = _W.partitionBy(group_col).orderBy(F.col(value_col))
    ranked = df.select(group_col, value_col).withColumn(
        "_rn", F.row_number().over(w)
    )
    return (
        ranked.join(n, group_col)
        .filter(F.col("_rn") == F.floor((F.col("_n") + 1) / 2))
        .select(group_col, F.col(value_col).alias(out_col))
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier summary via Median Absolute Deviation:
    ``med = lower-median(x)``, ``mad = lower-median(|x - med|)``, an
    outlier is ``|x - med| > k·mad``.  Lower-medians are exact element
    selections (see ``_group_lower_median``) and the deviations are
    exact double subtractions, so the flag — and this summary — is
    bit-reproducible in any engine: no quantile interpolation, no
    accumulation-order float drift.

    Returns one row per group: median, mad, n, n_outliers.
    """
    med = _group_lower_median(df, group_col, value_col, "_med")
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = _group_lower_median(dev, group_col, "_adev", "_mad")
    return (
        dev.join(F.broadcast(mad), group_col)
        .groupBy(group_col)
        .agg(
            F.max("_med").alias("median"),
            F.max("_mad").alias("mad"),
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.col("_adev") > F.lit(k) * F.col("_mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


def apply_agg_delta(
    state: DataFrame,
    changelog: DataFrame,
    group_col: str = "g",
    cnt_col: str = "cnt",
    sum_col: str = "total",
) -> DataFrame:
    """Incremental view maintenance WITH RETRACTIONS: fold a row-level
    changelog into a keyed (count, sum) aggregate state without
    re-scanning the base table — the delta form of materialized-view
    maintenance (q26's rollup_merge handles append-only; this handles
    updates/deletes, including GROUP-CHANGING updates).

    ``changelog`` rows: ``(op, old_group, old_val, new_group,
    new_val)`` with op in I/U/D — the shape ``cdc.snapshot_diff``
    emits.  Contributions: I adds to ``new_group``; D retracts from
    ``old_group``; U retracts old AND adds new (two contributions, so a
    group change moves the row between groups).  Groups whose count
    reaches zero are dropped (exact retraction needs additive
    aggregates — count/sum/avg-from-sums; min/max need a re-scan of
    the affected group, deliberately out of scope).

    Scale shape: the changelog explodes to at most 2 contribution rows
    each, ONE map-side-combined groupBy builds the per-group delta, and
    ONE key-partitioned full-outer join folds it into state — cost
    proportional to the DELTA, never the base table.  That is the whole
    point of IVM at 100 TB: a day's changes against a year's aggregate.
    """
    adds = changelog.filter(F.col("op").isin("I", "U")).select(
        F.col("new_group").alias(group_col),
        F.lit(1).cast("bigint").alias("_dc"),
        F.col("new_val").cast("bigint").alias("_ds"),
    )
    retracts = changelog.filter(F.col("op").isin("D", "U")).select(
        F.col("old_group").alias(group_col),
        F.lit(-1).cast("bigint").alias("_dc"),
        (-F.col("old_val")).cast("bigint").alias("_ds"),
    )
    delta = (
        adds.unionByName(retracts)
        .groupBy(group_col)
        .agg(F.sum("_dc").alias("_dc"), F.sum("_ds").alias("_ds"))
    )
    merged = state.join(delta, on=group_col, how="full_outer").select(
        group_col,
        (F.coalesce(F.col(cnt_col), F.lit(0)) + F.coalesce("_dc", F.lit(0)))
        .cast("bigint")
        .alias(cnt_col),
        (F.coalesce(F.col(sum_col), F.lit(0)) + F.coalesce("_ds", F.lit(0)))
        .cast("bigint")
        .alias(sum_col),
    )
    return merged.filter(F.col(cnt_col) > 0)


def grouped_linear_trend(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: Column,
    y_col: Column,
) -> DataFrame:
    """Per-group OLS trend line (slope/intercept) in ONE aggregate pass
    — the trend/drift probe over a star schema ("is revenue trending
    up per segment?").

    Exactness contract: ``x`` and ``y`` must be INTEGER expressions
    (epoch days, cents, micros).  All five sufficient statistics
    (n, Σx, Σy, Σxy, Σx²) are then exact DECIMAL(38) sums; slope =
    (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) is formed from two exact decimals
    converted ONCE to double (identical IEEE value in any engine) and
    floor-quantized to micros — the engine-portable rounding.  Groups
    with a degenerate x (den = 0) report NULL slope.
    """
    x = x_col.cast("decimal(38,0)")
    y = y_col.cast("decimal(38,0)")
    stats = df.groupBy(*group_cols).agg(
        F.count("*").cast("decimal(38,0)").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).cast("decimal(38,0)").alias("_sxy"),
        F.sum(x * x).cast("decimal(38,0)").alias("_sxx"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "decimal(38,0)"
    )
    den = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(
        "decimal(38,0)"
    )
    slope = F.when(
        den != 0,
        F.floor(
            num.cast("double") / den.cast("double") * 1_000_000
        ).cast("long"),
    )
    # intercept = (Σy − slope·Σx)/n, from the same exact stats
    intercept = F.when(
        den != 0,
        F.floor(
            (
                F.col("_sy").cast("double")
                - (num.cast("double") / den.cast("double"))
                * F.col("_sx").cast("double")
            )
            / F.col("_n").cast("double")
            * 1_000_000
        ).cast("long"),
    )
    return stats.select(
        *group_cols,
        F.col("_n").cast("long").alias("n"),
        slope.alias("slope_micros"),
        intercept.alias("intercept_micros"),
    )


def time_weighted_average(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    end_expr: Column,
    order_tiebreak: str | None = None,
    value_scale: int = 2,
) -> DataFrame:
    """Time-weighted average per key of a STEP function: each sample's
    value holds from its timestamp until the key's next sample; the
    last sample holds until ``end_expr`` (a per-row Column, e.g. end of
    the sample's day).  This is the TWAP / sensor-mean primitive that a
    plain ``avg`` gets wrong whenever sampling is irregular.

    One partitioned window (shuffle on ``keys``) computes each sample's
    holding duration via ``lead``; one map-side-combined aggregate
    folds ``value x seconds``.  No global sort, no driver loop — scales
    with key count like any windowed aggregate.

    Determinism (oracle-exact): values are fixed to
    ``DECIMAL(18, value_scale)`` so the weighted sum is exact integer
    arithmetic; the single decimal->double conversion and one IEEE
    divide happen identically in any engine.  Pass ``order_tiebreak``
    (a unique column) so equal timestamps order identically everywhere
    — with equal ``ts`` the earlier-ordered sample holds for 0 seconds.

    Returns one row per key: ``n_samples``, ``total_seconds``,
    ``twa`` (double; null for a key whose total duration is 0).
    """
    keys = list(keys)
    order = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    holds_until = F.coalesce(F.lead(F.col(ts_col)).over(w), end_expr)
    dur = (
        F.unix_timestamp(holds_until) - F.unix_timestamp(F.col(ts_col))
    ).cast("long")
    vdec = F.col(value_col).cast(f"decimal(18,{value_scale})")
    stepped = df.select(
        *keys, dur.alias("_dur"), vdec.alias("_v")
    ).withColumn("_wv", F.col("_v") * F.col("_dur"))
    out = stepped.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_samples"),
        F.sum("_dur").cast("long").alias("total_seconds"),
        F.sum("_wv").alias("_swv"),
    )
    twa = F.when(
        F.col("total_seconds") > 0,
        F.col("_swv").cast("double") / F.col("total_seconds").cast("double"),
    )
    return out.select(*keys, "n_samples", "total_seconds", twa.alias("twa"))


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
    smoothing: float = 20.0,
    out_col: str = "te",
    target_scale: int = 2,
) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing — the
    category-to-number feature transform used where one-hot explodes
    (high-cardinality categorical features for model training)::

        te(row) = (S_cat - y_row + prior * m) / (n_cat - 1 + m)

    Leave-one-out (excluding the row's own target from its category
    statistic) is what prevents the encoded feature from leaking the
    label; ``m`` (smoothing) shrinks rare categories toward the global
    ``prior`` mean.  A singleton category encodes to ~prior.

    Spark shape: one map-side-combined aggregate per category, one
    1-row global aggregate, then an equi-join back (AQE broadcasts the
    category table while it fits — high-cardinality categories shuffle
    on the category key, which is exactly right at scale).  No window
    over the raw rows, no per-row Python.

    Determinism: category sums are exact DECIMAL; the conversion to
    double and the IEEE multiply/divide chain is pinned in one
    expression order, so a SQL oracle replays it bit-for-bit.  Appends
    ``out_col`` to ``df``'s columns.
    """
    ydec = F.col(target_col).cast(f"decimal(18,{target_scale})")
    cat = df.groupBy(category_col).agg(
        F.sum(ydec).alias("_s"), F.count("*").alias("_n")
    )
    tot = df.agg(
        (F.sum(ydec).cast("double") / F.count("*")).alias("_prior")
    )
    m = F.lit(float(smoothing))
    enc = (
        ((F.col("_s") - ydec).cast("double") + F.col("_prior") * m)
        / ((F.col("_n") - F.lit(1)).cast("double") + m)
    )
    return (
        df.join(cat, category_col)
        .crossJoin(F.broadcast(tot))
        .select(*df.columns, enc.alias(out_col))
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    num_buckets: int = 32,
) -> DataFrame:
    """Exact Gini coefficient of ``value_col`` (non-negative integers) —
    the one-number skew diagnostic: 0 = perfectly even, → 1 = one key
    owns everything.  The operational use is partition-skew triage: run
    it over per-key counts before a big join/groupBy and the answer
    tells you whether to salt.

    Identity (ascending sort, 1-based ranks)::

        G = (2·Σ i·x_i − (n+1)·Σ x) / (n·Σ x)

    Tied values make the rank assignment ambiguous but NOT the sum: a
    tie group of c copies of v always receives the same rank set
    {p+1..p+c} whatever its internal order, contributing
    ``v·(c·p + c(c+1)/2)`` — so the whole statistic is computed from
    the DISTINCT-value count table (the ``drift.ks_statistic`` /
    ``equal_frequency_bins`` distributed-prefix shape: range partitions
    over the value, bounded per-partition windows, one count per
    partition prefix-summed on the driver).  Everything is exact
    integer arithmetic; the single final division is the only double
    op, so a SQL oracle replays it bit-for-bit.

    Returns a 1-row frame ``(n, total, gini_num, gini_den, gini)``
    with ``gini = gini_num / gini_den``.  Integer bound: requires
    ``2·n·max(x)·n`` within int64 — counts-of-counts workloads are
    orders of magnitude inside it.
    """
    counts = (
        df.select(F.col(value_col).cast("long").alias("_v"))
        .groupBy("_v")
        .agg(F.count("*").alias("_c"))
    )
    ranged = (
        counts.repartitionByRange(num_buckets, F.col("_v"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    per_part = (
        ranged.groupBy("_pid").agg(F.sum("_c").alias("_s")).collect()
    )
    offsets = []
    run = 0
    for row in sorted(per_part, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], run))
        run += row["_s"]
    spark = df.sparkSession
    off = spark.createDataFrame(offsets, schema="_pid int, _off bigint")
    w = (
        Window.partitionBy("_pid")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        ranged.join(F.broadcast(off), "_pid")
        .withColumn("_cum", F.sum("_c").over(w) + F.col("_off"))
    )
    # 2·Σ ranks·v for the tie group ending at _cum: ranks are
    # (_cum-_c+1).._cum, so 2·Σranks = _c·(2·_cum - _c + 1).
    grp = F.col("_v") * F.col("_c") * (
        F.lit(2) * F.col("_cum") - F.col("_c") + F.lit(1)
    )
    agg = cum.agg(
        F.sum(grp).alias("_s1"),
        F.sum(F.col("_v") * F.col("_c")).alias("_t"),
        F.sum("_c").alias("_n"),
    )
    num = F.col("_s1") - (F.col("_n") + F.lit(1)) * F.col("_t")
    den = F.col("_n") * F.col("_t")
    return agg.select(
        F.col("_n").alias("n"),
        F.col("_t").alias("total"),
        num.cast("long").alias("gini_num"),
        den.cast("long").alias("gini_den"),
        # NULL (not a division error) when every value is 0: an all-zero
        # distribution has no defined inequality — ANSI mode would throw
        # (hypothesis-found edge)
        F.when(
            den != 0, num.cast("double") / den.cast("double")
        ).alias("gini"),
    )
