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
