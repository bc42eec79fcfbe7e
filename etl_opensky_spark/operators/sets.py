"""Set operators (SURVEY §2.9: U1-U3).

``append_missing`` is the reference's core idempotency primitive:
re-running a day appends only ``new − existing``
(reference: src/jobs/extract_flights.py:80-92, load_fct_flights.py:102-116,
load_dim_dates.py:27-35).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_by_name(left: DataFrame, right: DataFrame) -> DataFrame:
    """U1 — union matching columns by name
    (reference: src/jobs/extract_flights.py:66)."""
    return left.unionByName(right)


def append_missing(new: DataFrame, existing: DataFrame) -> DataFrame:
    """U2 — rows to append for an idempotent re-run: ``new EXCEPT existing``.

    Semantics to know (tested, SURVEY §7.3):
    - positional column comparison (align ``select`` order first);
    - NULL-safe equality (EXCEPT treats NULL = NULL);
    - the result is DISTINCT — duplicates inside ``new`` collapse.

    Scale note: EXCEPT shuffles both sides on all columns.  At 100 TB the
    ``existing`` side must be pre-filtered to the affected partitions
    before calling this (the reference does exactly that: it subtracts
    against only the current day's partition).  For key-based idempotency
    prefer ``new.join(existing, keys, "left_anti")`` which shuffles on the
    key only — or dynamic partition overwrite (see session.py).
    """
    return new.subtract(existing)


def append_missing_by_key(new: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Key-based variant: rows of ``new`` whose key is absent from ``existing``.

    Unlike ``append_missing`` this does not collapse duplicate non-key
    columns and shuffles only on ``keys`` — the scalable default when a
    natural key exists.
    """
    return new.join(existing.select(*keys), on=keys, how="left_anti")
