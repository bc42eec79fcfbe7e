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
