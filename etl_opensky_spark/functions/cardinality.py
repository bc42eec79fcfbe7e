"""HyperLogLog registers from scratch — engine-exact, mergeable.

``approx_count_distinct`` (already gated with accuracy bounds, q78) is a
black box: you cannot persist its state, merge it across days, or
replay it in another engine.  Production pipelines persist SKETCH STATE
(per-day HLL registers in the lake) and merge by element-wise max —
this module builds that state with arithmetic both Spark and DuckDB
reproduce bit-for-bit:

- hash = md5 (the repo's cross-engine parity hash): first ``b`` hex
  digits pick the register, the next 52 bits form the rank field;
- rho (position of the first 1-bit, 1-based from the MSB of the 52-bit
  field) is computed as ``52 - floor_log2(v)`` with ``floor_log2``
  UNROLLED as 51 integer comparisons ``v >= 2^k`` — pure integer
  arithmetic, no float ``log2``, no engine-specific ``bin()`` widths;
- registers are ``max(rho)`` per bucket: a map-side-combined groupBy,
  and the merge of two sketches IS element-wise max — the groupBy
  already computes the mergeable form.

Scale shape: one narrow hash pass + one aggregate whose output is
``2^b`` rows regardless of corpus size; per-partition partial maxes
combine losslessly (the sketch property).  The estimate denominator
``sum(2^-rho)`` is carried exactly as ``sum(2^(52-rho))`` over a common
``2^52`` denominator — exact bigint, one final double division.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RANK_BITS = 52  # 13 md5 hex digits


def floor_log2(v: Column, bits: int = RANK_BITS) -> Column:
    """``floor(log2(v))`` for ``v >= 1`` as unrolled integer compares
    (sum of ``v >= 2^k`` indicators) — deterministic in any engine."""
    terms = [
        F.when(v >= F.lit(1 << k), 1).otherwise(0) for k in range(1, bits)
    ]
    return reduce(lambda a, b: a + b, terms)


def floor_log2_sql(expr: str, bits: int = RANK_BITS) -> str:
    """The identical unrolled ``floor_log2`` as ANSI SQL."""
    terms = [
        f"(CASE WHEN ({expr}) >= {1 << k} THEN 1 ELSE 0 END)"
        for k in range(1, bits)
    ]
    return "(" + " + ".join(terms) + ")"


def hll_registers(
    df: DataFrame, col: str, b: int = 8
) -> DataFrame:
    """Per-bucket HLL registers ``(bucket, register)`` for ``2^b``
    buckets: ``bucket`` = first ``b/4`` md5 hex digits, ``register`` =
    max rho of the 52-bit rank field.  Missing buckets simply don't
    appear (register 0) — union + groupBy-max re-merges sketches."""
    if b % 4 != 0:
        raise ValueError("b must be a multiple of 4 (whole hex digits)")
    hexdigits = b // 4
    h = F.md5(F.col(col).cast("string"))
    bucket = F.conv(F.substring(h, 1, hexdigits), 16, 10).cast("int")
    rank_field = F.conv(
        F.substring(h, hexdigits + 1, RANK_BITS // 4), 16, 10
    ).cast("bigint")
    # TWO projections, deliberately: floor_log2 references its input in
    # 51 comparison terms, and inlining the md5+conv chain into each
    # term makes interpreted evaluation (the columnar-cache/RDD path,
    # where codegen + subexpression elimination don't apply) recompute
    # the hash 51x per row — measured 40 s vs 0.6 s on 1 M rows at the
    # round-5 sf1 rehearsal.  Project the rank ONCE; the compare chain
    # then reads a bound column.  CollapseProject keeps the split (it
    # does not duplicate non-cheap aliases referenced multiple times).
    pre = df.select(bucket.alias("bucket"), rank_field.alias("_rank"))
    rho = F.when(F.col("_rank") == 0, F.lit(RANK_BITS + 1)).otherwise(
        F.lit(RANK_BITS) - floor_log2(F.col("_rank"))
    )
    return (
        pre.select("bucket", rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate(
    registers: DataFrame, b: int = 8, correct_sparse: bool = False
) -> DataFrame:
    """Raw HLL estimate from a register table: ``alpha_m * m^2 / Z``
    with ``Z = sum over ALL m buckets of 2^-register`` (absent buckets
    contribute ``2^0 = 1``).  The sum is carried exactly as
    ``sum(2^(53-register))`` over denominator ``2^53`` — registers run
    1..53 (53 = all-zero rank field), so every exponent is >= 0 and the
    numerator is an exact bigint — then ONE double division.  Returns a
    single row ``(m, z_num_times_2p53, estimate)``."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    denom_pow = RANK_BITS + 1  # registers max out at RANK_BITS + 1
    agg = registers.agg(
        F.count("*").alias("n_buckets"),
        # pyspark's F.shiftleft only takes a literal int shift; the SQL
        # function accepts a column expression
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {denom_pow} - register)")
        ).alias("z_present"),
    )
    scale = float(1 << denom_pow)
    z_num = (
        F.col("z_present")
        + (F.lit(m) - F.col("n_buckets")).cast("bigint")
        * F.lit(1 << denom_pow).cast("bigint")
    )
    raw = F.lit(alpha * m * m * scale) / z_num.cast("double")
    est = raw
    if correct_sparse:
        # Flajolet et al.'s small-range correction: the raw estimator
        # biases high when most registers are still zero — below
        # 2.5·m switch to linear counting, m·ln(m/V) with V = count of
        # zero registers (bucket rows are only materialized for
        # non-zero registers, so V = m − n_buckets).  Off by default:
        # existing bound gates pin the raw estimator's behavior.
        v = (F.lit(m) - F.col("n_buckets")).cast("double")
        est = F.when(
            (raw <= F.lit(2.5 * m)) & (v > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v),
        ).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"),
        z_num.alias("z_num_times_2p53"),
        est.alias("estimate"),
    )


def hll_registers_by(
    df: DataFrame, key_cols: list[str], col: str, b: int = 8
) -> DataFrame:
    """Per-group HLL registers ``(*key_cols, bucket, register)`` — the
    persisted form for rolling-window distinct counts: store one
    register table per day/partition, merge any window of them by
    element-wise max, estimate without re-touching rows.  Same hash and
    rho arithmetic as ``hll_registers``."""
    if b % 4 != 0:
        raise ValueError("b must be a multiple of 4 (whole hex digits)")
    hexdigits = b // 4
    h = F.md5(F.col(col).cast("string"))
    bucket = F.conv(F.substring(h, 1, hexdigits), 16, 10).cast("int")
    rank_field = F.conv(
        F.substring(h, hexdigits + 1, RANK_BITS // 4), 16, 10
    ).cast("bigint")
    # two projections: see hll_registers — inlining the md5+conv chain
    # into floor_log2's 51 terms makes interpreted paths recompute the
    # hash 51x per row (40 s -> 1 s on 1 M rows, round-5 rehearsal)
    pre = df.select(*key_cols, bucket.alias("bucket"), rank_field.alias("_rank"))
    rho = F.when(F.col("_rank") == 0, F.lit(RANK_BITS + 1)).otherwise(
        F.lit(RANK_BITS) - floor_log2(F.col("_rank"))
    )
    return (
        pre.select(*key_cols, "bucket", rho.alias("rho"))
        .groupBy(*key_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union HLL sketches: registers merge by per-bucket MAX — the
    mergeability that makes HLL the 100 TB distinct-count answer
    (per-shard/per-day sketches compose without re-reading data).
    Feed the result to ``hll_estimate`` for ``|A ∪ B ∪ …|``; with the
    per-set estimates, inclusion-exclusion gives an intersection
    estimate ``|A∩B| ≈ est(A) + est(B) − est(A∪B)`` whose error is
    governed by the UNION's scale (document that to callers: a tiny
    true intersection under two huge sets is below the sketch's noise
    floor)."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.max("register").alias("register"))
