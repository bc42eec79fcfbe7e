"""Data-quality validation: rule-based row quarantine.

The reference validates inputs implicitly (schema enforcement, FK
anti-joins — operators/joins.py:fk_orphans); production lakes also need
ROW-LEVEL expectation checks with a quarantine channel: bad rows are
routed aside with the reasons attached, never silently dropped, and the
clean stream proceeds.  This is the engine-side core of what
expectation frameworks (Great Expectations / dbt tests / Delta Live
Tables expectations) compile down to.

Scale shape: every rule is a Column predicate evaluated in the SAME
narrow pass (one scan, whole-stage codegen, zero shuffles); the
valid/quarantine split is two filters over that pass.  NULL handling is
explicit: a rule evaluating to NULL counts as a FAILURE (a null price
is not a positive price) — the semantics dbt's ``not_null`` +
``accepted_values`` users expect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FAILED_COL = "failed_rules"


def tag_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Attach ``failed_rules: array<string>`` listing every rule the row
    fails (empty array = clean).  Rule order follows dict order, so the
    tag column is deterministic."""
    checks = [
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
        for name, cond in rules.items()
    ]
    return df.withColumn(FAILED_COL, F.array_compact(F.array(*checks)))


def validate_rules(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, quarantined): valid rows drop the tag column,
    quarantined rows keep ``failed_rules`` for triage/replay."""
    tagged = tag_rules(df, rules)
    valid = tagged.filter(F.size(FAILED_COL) == 0).drop(FAILED_COL)
    quarantined = tagged.filter(F.size(FAILED_COL) > 0)
    return valid, quarantined


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    skew_share_pct: float = 1.0,
) -> DataFrame:
    """Join-key skew diagnostic: the pre-flight check before shuffling
    on ``key_col``.  Returns the ``top_k`` heaviest keys with their row
    counts, share of the table, and a ``skewed`` flag (share above
    ``skew_share_pct`` percent — a single reducer would receive that
    share of the shuffle).  This is the report that tells you to reach
    for ``salted_join``/AQE skew handling BEFORE the job dies at 100×.

    Shape: one map-side-combined count aggregate, a TakeOrdered top-k
    (never a global sort), one broadcast scalar total.  NULL keys count
    as a key — they hash to one reducer like any other hot key.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("_total"))
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("key").asc_nulls_last())
        .limit(top_k)
    )
    return top.crossJoin(F.broadcast(total)).select(
        "key",
        "cnt",
        (F.col("cnt") * 100.0 / F.col("_total")).alias("share_pct"),
        (F.col("cnt") * 100 > F.col("_total") * skew_share_pct).alias(
            "skewed"
        ),
        F.col("_total").alias("n_rows"),
    )
