"""Physical-plan linting: the pre-flight check before a job ships.

``tests/test_plan_shapes.py`` pins the engine's OWN operators to their
intended plans; this module gives engine USERS the same protection for
ad-hoc pipelines — a function that inspects a DataFrame's executed plan
and returns the scale hazards the optimizer will happily execute
anyway.  The checks encode this repo's measured lessons (docs/SCALE.md):

- ``cartesian-product`` / ``broadcast-nested-loop`` — quadratic joins
  that a missing/non-equi condition produces silently;
- ``python-row-udf`` — ``BatchEvalPython`` (row-at-a-time Python) in
  the plan; Arrow stages (``ArrowEvalPython``/``MapInPandas``) pass;
- ``full-width-scan`` — a parquet scan reading every column while the
  plan needs few (column pruning defeated, e.g. by an early UDF);
- ``no-partition-filters`` — a scan of a hive-partitioned source with
  no partition filter (full-lake read);
- ``single-partition-exchange`` — ``Exchange SinglePartition`` from a
  global window/ORDER BY without PARTITION BY: one task gets the
  whole table at 100×.

Heuristics over the plan string, deliberately: they need no Spark
internals beyond ``queryExecution`` and survive version drift.  Use in
CI as ``assert not plan_warnings(df)`` or interactively.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_warnings(df: DataFrame, max_scan_columns: int = 24) -> list[str]:
    """Return a list of human-readable scale hazards in ``df``'s plan
    (empty = clean).  ``max_scan_columns`` tunes the full-width-scan
    heuristic."""
    spark = df.sparkSession
    # ReadSchema is truncated at spark.sql.maxMetadataStringLength (100)
    # WITHOUT a closing '>', which silently corrupts schema-width parsing
    # (a cross-line regex match counted other operators' text as columns
    # — the round-5 q131 false positive).  Render untruncated, restore.
    key = "spark.sql.maxMetadataStringLength"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "100000")
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
    warnings: list[str] = []

    if "CartesianProduct" in plan:
        warnings.append(
            "cartesian-product: a join with no condition multiplies the "
            "inputs; add an equi-join key or an explicit bound"
        )
    if "BroadcastNestedLoopJoin" in plan:
        warnings.append(
            "broadcast-nested-loop: non-equi join condition — every row "
            "compares against the broadcast side; restructure to an "
            "equi-join (bucketed range, blocking key) if the build side "
            "can grow"
        )
    if "BatchEvalPython" in plan:
        warnings.append(
            "python-row-udf: row-at-a-time Python in the plan; use "
            "built-in Column functions or an Arrow pandas_udf/mapInPandas"
        )
    for m in re.finditer(r"ReadSchema: struct<([^>\n]*)>", plan):
        ncols = m.group(1).count(",") + 1 if m.group(1) else 0
        if ncols > max_scan_columns:
            warnings.append(
                f"full-width-scan: a scan reads {ncols} columns — column "
                "pruning defeated (often by an early UDF or a SELECT *)"
            )
            break
    if re.search(r"PartitionFilters: \[\]", plan) and re.search(
        r"PartitionCount: (?:[1-9]\d{2,})", plan
    ):
        warnings.append(
            "no-partition-filters: scanning 100+ partitions of a "
            "partitioned source with no partition predicate"
        )
    for m in re.finditer(r"Exchange SinglePartition.*", plan):
        # a SinglePartition exchange fed by PARTIAL aggregates moves one
        # pre-combined row per upstream partition — the inherently
        # bounded final stage of every scalar aggregate, not a hazard.
        # Look at the next few tree lines for the exchange's child.
        tail = plan[m.end():].split("\n", 4)[1:4]
        child = " ".join(tail)
        if "partial_" in child or "ObjectHashAggregate" in child and "partial" in child:
            continue
        warnings.append(
            "single-partition-exchange: a global sort/window/limit pulls "
            "ALL rows into one task; add PARTITION BY or use "
            "TakeOrdered-style top-k"
        )
        break
    return warnings
