"""Projection / column-transform operators (SURVEY §2.3: P1-P4).

Thin, named wrappers over DataFrame methods so pipelines read as a list of
engine ops; all are pure plan-builders (no actions), fully prunable by
Catalyst's ColumnPruning rule.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame


def select_columns(df: DataFrame, cols: Sequence[str | Column]) -> DataFrame:
    """P1 — narrow/reorder to the listed columns.

    Column order matters downstream: positional set ops (``subtract``)
    compare by position (reference relies on this,
    src/jobs/load_fct_flights.py:92-100).
    """
    return df.select(*cols)


def drop_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P2 — remove columns (missing names are ignored, as Spark does)."""
    return df.drop(*cols)


def with_columns(df: DataFrame, cols: Mapping[str, Column]) -> DataFrame:
    """P3 — add/replace derived columns in one pass.

    Single ``withColumns`` call: one Project node, not a chain
    (reference chains withColumn, e.g. src/jobs/extract_flights.py:52-63).
    """
    return df.withColumns(dict(cols))


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P4 — bulk rename {old: new} (reference: src/jobs/load_fct_flights.py:32-41)."""
    return df.withColumnsRenamed(dict(mapping))
