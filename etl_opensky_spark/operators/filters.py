"""Filter / predicate operators (SURVEY §2.4: F1-F7, X10).

All produce plain Catalyst predicates so parquet partition pruning and
row-group pushdown stay effective (verify with ``df.explain()`` —
``PartitionFilters`` / ``PushedFilters`` must list them).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_partition(df: DataFrame, **eq: object) -> DataFrame:
    """F1 — conjunctive equality on partition columns -> partition pruning.

    ``filter_partition(df, flight_year=2018, flight_month=1, flight_day=1)``
    (reference: src/jobs/extract_flights.py:75-79).  Pass values already of
    the column type — Catalyst inserts casts for mismatches and a bad cast
    silently yields NULL (the reference compares an INT partition column to
    a string, src/jobs/load_fct_flights.py:103-104).
    """
    pred: Column | None = None
    for name, value in eq.items():
        clause = F.col(name) == F.lit(value)
        pred = clause if pred is None else (pred & clause)
    if pred is None:
        return df
    return df.filter(pred)


def where_expr(df: DataFrame, sql_expr: str) -> DataFrame:
    """F3 — SQL-string predicate (reference: src/jobs/load_dim_aircrafts.py:163-164)."""
    return df.where(sql_expr)


def dropna_all(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """F5 — drop rows where all (subset) columns are null
    (reference: src/jobs/load_dim_aircrafts.py:162)."""
    return df.dropna(how="all", subset=list(subset) if subset else None)


def nullify_values(df: DataFrame, sentinels: Mapping[str, Sequence[str]]) -> DataFrame:
    """X10 — canonicalize sentinel strings to NULL, per column.

    ``nullify_values(df, {"line_num": ["\\tN/A", "-", "n/a"]})`` maps any
    listed sentinel to NULL and leaves every other value (incl. NULL)
    untouched.  Pure column expression — stays in whole-stage codegen
    (reference builds the same predicate with a boolean loop,
    src/jobs/load_dim_aircrafts.py:137-154; ``isin`` is the idiomatic form).
    """
    return df.withColumns(
        {
            col: F.when(~F.col(col).isin(list(words)), F.col(col))
            for col, words in sentinels.items()
        }
    )
