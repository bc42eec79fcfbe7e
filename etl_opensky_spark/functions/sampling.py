"""Deterministic data-splitting / sampling for training pipelines.

Hash-bucket splitting is THE reproducible way to partition a corpus into
train/validation/test: membership depends only on the row's key (stable
under reruns, re-partitioning, and appends), never on a random number
stream.  The bucket hash is md5-based so any engine can recompute the
exact same assignment (xxhash64 would be Spark-only).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BUCKETS = 10_000


def hash_bucket(col: Column, buckets: int = HASH_BUCKETS) -> Column:
    """Stable bucket in [0, buckets): first 4 md5 hex digits mod buckets.

    16 bits of hash -> keep ``buckets`` well below 65536 (default 10k
    gives 0.01% split granularity with acceptable bucket-size variance).
    """
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("int")
        % buckets
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float],
    out_col: str = "split",
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Assign every row a deterministic split label by hash bucket.

    ``weights`` maps label -> fraction (must sum to ~1); labels are
    assigned to contiguous bucket ranges in sorted-label order so the
    assignment is reproducible from the spec alone.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(F.col(key_col), buckets)
    expr = None
    lower = 0.0
    for label in sorted(weights):
        upper = lower + weights[label] * buckets
        clause = bucket < F.lit(int(round(upper)))
        expr = (
            F.when(clause, F.lit(label))
            if expr is None
            else expr.when(clause, F.lit(label))
        )
        lower = upper
    # float rounding could leave the last bucket unlabeled: close the range
    last = sorted(weights)[-1]
    return df.withColumn(out_col, expr.otherwise(F.lit(last)))


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: Mapping, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``DataFrame.sampleBy``): seeded and
    deterministic within Spark, but NOT reproducible by other engines —
    use ``hash_split`` when cross-system reproducibility matters."""
    return df.sampleBy(strata_col, dict(fractions), seed)


def take_until_budget(
    df: DataFrame,
    order_col: str,
    key_col: str,
    weight_col: str,
    budget: float,
    num_buckets: int = 64,
) -> DataFrame:
    """Budgeted corpus selection: walk rows in (``order_col`` DESC,
    ``key_col``) order — best-first — and keep the maximal prefix whose
    cumulative ``weight_col`` stays within ``budget`` (the 'take the
    highest-quality documents until the token budget is full' step of a
    data-mixing pipeline).

    The global prefix sum never serializes through one task:
    ``repartitionByRange`` splits the corpus into ordered buckets
    (partition i's rows all precede partition i+1's), each bucket
    windows its local cumsum in parallel, and the per-bucket totals are
    prefix-summed on the driver and broadcast back.  The bucketing is
    sample-based, so the materialized layout is pinned with an eager
    ``localCheckpoint`` — both the totals pass and the final filter must
    see the SAME partitioning.  The selected SET is independent of the
    bucketing (it is defined by the total order alone).
    """
    from pyspark.sql import Window

    ranged = (
        df.repartitionByRange(
            num_buckets, F.col(order_col).desc(), F.col(key_col)
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col(order_col).desc(), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn(
        "_cum", F.sum(F.col(weight_col).cast("long")).over(w)
    )
    totals = (
        ranged.groupBy("_pid")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("_tot"))
        .collect()
    )
    offsets, running = [], 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], running))
        running += row["_tot"]
    off_df = df.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .filter((F.col("_off") + F.col("_cum")) <= F.lit(float(budget)))
        .drop("_pid", "_cum", "_off")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
    key_out: str = "_sample_key",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res): each row draws u = hash-uniform(seed, key) in (0,1)
    and scores ``u^(1/w)``; the k highest scores are the sample.
    Inclusion probability is proportional to weight, and — because u
    comes from md5, not an RNG stream — the SAME rows are chosen on
    every rerun, any partitioning, and any engine (the property
    ``rand()``-based sampling loses the moment row order changes).

    Per-row arithmetic + a global top-k (TakeOrdered: per-partition
    heaps, driver merges k rows) — no shuffle of the corpus.  Rows with
    NULL or non-positive weight are excluded (their inclusion
    probability is zero).
    """
    # 15 md5 hex digits = 60 uniform bits; +0.5 keeps u strictly in (0,1)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**60))
    score = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn(key_out, score)
        .orderBy(F.col(key_out).desc(), F.col(key_col))
        .limit(k)
    )


def shuffle_deterministic(
    df: DataFrame, key_col: str, seed: int = 42, key_out: str = "_shuffle_key"
) -> DataFrame:
    """Engine-reproducible global shuffle: total order by
    ``md5(seed || key)`` — the standard trick for a training-data corpus
    shuffle that any engine (and any rerun) reproduces exactly, unlike a
    random-number shuffle.

    ``orderBy`` on the hash is Spark's distributed total order (range-
    partition exchange + per-partition sort); there is no single-task
    sort bottleneck, and downstream sequential writers read partitions
    in order.  The hash key is left in ``key_out`` so consumers can
    range-split the shuffled corpus without re-deriving it.
    """
    k = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string"))
    )
    return df.withColumn(key_out, k).orderBy(key_out)


def pack_contiguous(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    budget: int,
    num_buckets: int = 256,
    out_col: str = "bin",
) -> DataFrame:
    """Concatenate-then-split sequence packing: assign each row the bin
    ``floor(start_offset / budget)`` where ``start_offset`` is the running
    ``weight_col`` total in ``id_col`` order — the deterministic packing
    used to fill fixed-token-budget training sequences (rows may straddle
    a boundary; the consumer truncates/continues, as in LLM pretraining
    packing).

    The global prefix sum is computed WITHOUT a one-partition window:
    rows are bucketed by id range, each bucket computes its local cumsum
    in parallel (window partitioned by bucket), and the per-bucket totals
    (``num_buckets`` scalars) are prefix-summed on the driver and
    broadcast back — the classic two-pass distributed scan, so the plan
    scales with executors instead of serializing the corpus.

    Requires non-negative ``id_col`` values (bucket = id range slice).
    """
    from pyspark.sql import Window

    mx = df.agg(F.max(F.col(id_col)).alias("m")).collect()[0]["m"]
    if mx is None:  # empty frame
        return df.withColumn(out_col, F.lit(None).cast("long"))
    span = max(1, (int(mx) + num_buckets) // num_buckets)  # ceil((mx+1)/nb)
    bucketed = df.withColumn("_bkt", (F.col(id_col) / span).cast("int"))

    w = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn(
        "_cum", F.sum(F.col(weight_col).cast("long")).over(w)
    )

    totals = (
        bucketed.groupBy("_bkt")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("_tot"))
        .collect()
    )
    offsets, running = [], 0
    for row in sorted(totals, key=lambda r: r["_bkt"]):
        offsets.append((row["_bkt"], running))
        running += row["_tot"]
    off_df = df.sparkSession.createDataFrame(offsets, "_bkt int, _off long")

    start = F.col("_off") + F.col("_cum") - F.col(weight_col).cast("long")
    return (
        local.join(F.broadcast(off_df), "_bkt")
        .withColumn(out_col, F.floor(start / F.lit(float(budget))))
        .drop("_bkt", "_cum", "_off")
    )


def sample_by_fractions(
    df: DataFrame,
    group_col: str,
    key_col: str,
    fractions: Mapping[str, float],
    default: float = 1.0,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Deterministic per-group downsampling to target keep-fractions —
    the data-mixing primitive (re-weight domains/languages/sources of a
    corpus before training).  A row survives iff
    ``hash_bucket(key) < round(fraction(group) * buckets)``: the kept
    set is a pure function of the spec, reproducible in ANY engine with
    md5 (unlike ``stratified_sample``'s Spark-seeded Bernoulli), and
    monotone — raising a fraction only ADDS rows, so mixture updates
    are incremental, never a reshuffle of what was kept.

    Narrow per-row filter: no shuffle, no group materialization, scales
    to any corpus.  Groups absent from ``fractions`` keep ``default``.
    """
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1], got {f}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default fraction must be in [0, 1], got {default}")
    thr = None
    for g in sorted(fractions):
        cut = F.lit(int(round(fractions[g] * buckets)))
        cond = F.col(group_col) == g
        thr = F.when(cond, cut) if thr is None else thr.when(cond, cut)
    thr = (
        F.lit(int(round(default * buckets)))
        if thr is None
        else thr.otherwise(F.lit(int(round(default * buckets))))
    )
    return df.filter(hash_bucket(F.col(key_col), buckets) < thr)


def dsir_log_weights(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    is_target: F.Column,
    buckets: int = 1024,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    by how much more likely its tokens are under a TARGET distribution
    (rows where ``is_target``) than under the full corpus, using
    hashed-unigram bag-of-words models with add-1 smoothing.  Downstream,
    ``weighted_sample`` over ``exp(weight)`` IS importance resampling.

    Output: ``(id, n_tokens, log_weight_micros)`` where
    ``log_weight_micros = sum over tokens of round(1e6 * [log p_t(b) -
    log p_s(b)])`` — the per-BUCKET log-ratio is quantized to integer
    micro-units first, so the per-document sum is exact integer
    arithmetic: no float-summation-order hazard, any engine reproduces
    the hash bit-for-bit.

    Scale shape: tokenize is a narrow pass; bucket counts are ONE
    map-side-combined aggregate bounded by ``buckets`` rows; the
    bucket->ratio table is ``buckets`` rows (broadcast-sized BY
    CONSTRUCTION — a true bound, unlike group cardinality) joined back
    onto the token stream; the per-doc sum is the second and last
    shuffle, with map-side combine.  Corpus totals are two driver
    scalars.
    """
    toks = (
        docs.select(
            F.col(id_col), is_target.alias("_t"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("_tok"),
        )
        .filter(F.col("_tok") != "")
        .withColumn("_b", hash_bucket(F.col("_tok"), buckets))
    )
    bc = toks.groupBy("_b").agg(
        F.count("*").alias("_src_n"),
        F.count_if(F.col("_t")).alias("_tgt_n"),
    )
    tot = bc.agg(F.sum("_src_n"), F.sum("_tgt_n")).collect()[0]
    s_total, t_total = int(tot[0]), int(tot[1])
    ratio = bc.select(
        "_b",
        F.round(
            (
                F.log((F.col("_tgt_n") + 1.0) / F.lit(float(t_total + buckets)))
                - F.log((F.col("_src_n") + 1.0) / F.lit(float(s_total + buckets)))
            )
            * 1_000_000.0
        )
        .cast("long")
        .alias("_w"),
    )
    return (
        toks.join(ratio, on="_b")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("_w").alias("log_weight_micros"),
        )
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    universe_size: int | None = None,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every row, ``k`` pseudo-random OTHER ids drawn by salted md5 over a
    known id universe — ``(id_col, slot, neg_id)``.

    Candidate ``neg_id = md5(id:slot) mod universe`` is a pure function
    of (id, slot): reproducible across engines, runs, and partitionings
    (no ``rand()``).  Self-collisions are dropped (a row yields < k
    negatives with probability k/universe).  Candidates are validated
    against the actual id set by a key-partitioned LEFT SEMI join —
    never a broadcast of the corpus, never a cross join; shuffle volume
    is k rows per input row on the join key.

    ``universe_size`` defaults to ``df.count()`` (one scalar job) and
    assumes dense ids [0, n); for sparse id spaces the semi join is
    what guarantees only real ids survive — pass the id-space bound.
    """
    n = universe_size if universe_size is not None else df.count()
    slots = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("slot")
    cands = df.select(F.col(id_col), slots).select(
        id_col,
        "slot",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col(id_col).cast("string"),
                            F.col("slot").cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint")
            % n
        ).alias("neg_id"),
    ).filter(F.col("neg_id") != F.col(id_col))
    valid_ids = df.select(F.col(id_col).alias("neg_id")).distinct()
    return cands.join(valid_ids, "neg_id", "left_semi").select(
        id_col, "slot", "neg_id"
    )


def bottom_k_sample(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Bottom-k consistent sample: the ``k`` rows whose md5(key) hashes
    smallest — a deterministic uniform sample (the hash is the "random"
    tag, reproducible across runs/engines/partitionings) with the
    bottom-k sketch's MERGEABLE property: bottom-k(A ∪ B) =
    bottom-k(bottom-k(A) ∪ bottom-k(B)), so per-shard or per-day
    samples compose without resampling, and the k-th smallest hash is
    a distinct-count estimator (Bar-Yossef et al. 2002).

    Plans as TakeOrdered — each partition keeps its local k, the driver
    merges — never a global sort.  Ties break on the key itself, then on
    an ``xxhash64`` of the FULL row: without the last tiebreak, duplicate
    keys with differing payload columns would make which physical row
    survives the ``limit(k)`` cut depend on partitioning (ADVICE r4) —
    with it the result is partitioning-invariant even for non-unique
    keys (up to fully-identical rows, which are interchangeable)."""
    hk = F.md5(F.col(key_col).cast("string"))
    row_tb = F.xxhash64(*[F.col(c) for c in df.columns])
    return (
        df.withColumn("_hk", hk)
        .withColumn("_tb", row_tb)
        .orderBy("_hk", key_col, "_tb")
        .limit(k)
        .drop("_hk", "_tb")
    )


def proportional_allocation(
    df: DataFrame,
    strata_cols: list[str],
    budget: int,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer sample
    ``budget`` across strata — THE quota step of stratified sampling
    and dataset-mixture construction: every stratum gets
    ``floor(budget·n_i/N)`` rows, and the ``budget − Σ floor`` leftover
    seats go to the strata with the largest remainders (ties broken on
    the stratum key, ascending — fully deterministic).  Guarantees
    ``Σ alloc = budget`` exactly and ``|alloc_i − budget·n_i/N| < 1``,
    which float-rounding per-stratum quotas do not.

    All arithmetic is exact integers (``div``/``%`` on
    ``budget·n_i``); no float quota ever exists, so a SQL oracle
    replays the allocation bit-for-bit.

    Scale shape: one map-side-combined count aggregate over the corpus;
    everything after runs on the STRATA table, which is bounded by the
    key cardinality (orders of magnitude below the corpus) — the
    single-partition rank window over it is bounded by construction.

    Returns one row per stratum: ``(*strata_cols, n, base, alloc)``.
    """
    strata = df.groupBy(*strata_cols).agg(F.count("*").alias("n"))
    return _hamilton_allocate(strata, strata_cols, "n", budget, extra=["n"])


def _hamilton_allocate(
    strata: DataFrame,
    strata_cols: list[str],
    weight_col: str,
    budget: int,
    extra: list[str],
) -> DataFrame:
    """Largest-remainder core over an already-aggregated strata frame:
    integer floor quotas on ``weight_col``, leftover seats by remainder
    rank (ties on the stratum key).  ``extra`` names the columns to
    carry through beside ``base``/``alloc``."""
    tot = strata.agg(F.sum(weight_col).alias("_N"))
    b = (
        strata.crossJoin(F.broadcast(tot))
        .withColumn("_share", F.lit(int(budget)) * F.col(weight_col))
        .withColumn("base", F.expr("_share div _N").cast("long"))
        .withColumn("_rem", F.col("_share") % F.col("_N"))
    )
    leftover = b.agg(
        (F.lit(int(budget)) - F.sum("base")).alias("_left")
    )
    w = Window.orderBy(
        F.col("_rem").desc(), *[F.col(c).asc() for c in strata_cols]
    )
    return (
        b.withColumn("_rk", F.row_number().over(w))
        .crossJoin(F.broadcast(leftover))
        .select(
            *strata_cols,
            *extra,
            "base",
            (
                F.col("base")
                + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0)
            ).cast("long").alias("alloc"),
        )
    )


def temperature_allocation(
    df: DataFrame,
    strata_cols: list[str],
    budget: int,
    alpha_halves: int = 1,
) -> DataFrame:
    """Temperature-flattened mixture allocation — the multilingual /
    multi-domain rebalancing step (mC4, XLM-R): stratum weights
    ``n_i^α`` instead of ``n_i``, so rare strata are upsampled relative
    to their share (α < 1 flattens, α = 1 is proportional).

    ``α = alpha_halves / 2`` — α is restricted to half-integers on
    purpose: ``n^(k/2) = n^⌊k/2⌋ · sqrt(n)^(k mod 2)`` needs only
    integer powers and ONE IEEE ``sqrt`` (correctly rounded by spec in
    every engine), where an arbitrary ``pow`` is not cross-engine
    reproducible.  The weight is micro-quantized ONCE
    (``round(10^6 · n^α)``), then the allocation is the exact-integer
    Hamilton apportionment (``proportional_allocation``) over those
    integer weights — Σ alloc = budget exactly.

    Returns ``(*strata_cols, n, weight_micros, base, alloc)``.
    """
    if alpha_halves < 1:
        raise ValueError("alpha_halves must be >= 1")
    strata = df.groupBy(*strata_cols).agg(F.count("*").alias("n"))
    nd = F.col("n").cast("double")
    wf = F.lit(1.0)
    for _ in range(alpha_halves // 2):
        wf = wf * nd
    if alpha_halves % 2:
        wf = wf * F.sqrt(nd)
    strata = strata.withColumn(
        "weight_micros", F.round(wf * 1_000_000).cast("long")
    )
    return _hamilton_allocate(
        strata, strata_cols, "weight_micros", budget,
        extra=["n", "weight_micros"],
    )
