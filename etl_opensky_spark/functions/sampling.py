"""Deterministic data-splitting / sampling for training pipelines.

Hash-bucket splitting is THE reproducible way to partition a corpus into
train/validation/test: membership depends only on the row's key (stable
under reruns, re-partitioning, and appends), never on a random number
stream.  The bucket hash is md5-based so any engine can recompute the
exact same assignment (xxhash64 would be Spark-only).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
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
