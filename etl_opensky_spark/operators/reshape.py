"""Reshaping operators (SURVEY §2.10: R1-R2, §2.1: S7).

``melt`` re-expresses the reference's airlines unpivot
(reference: src/jobs/load_dim_aircrafts.py:209-224); ``date_spine`` the
SQL ``EXPLODE(SEQUENCE(...))`` calendar generator
(reference: src/jobs/load_dim_dates.py:61-69).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
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
