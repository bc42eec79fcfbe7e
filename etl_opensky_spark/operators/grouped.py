"""Grouped-map operator surface (``applyInPandas``).

``grouped_apply`` is the engine's escape hatch for per-group logic that
built-in operators genuinely can't express (model fitting, library calls,
irregular resampling).  For anything SQL-expressible (z-scores, ranks,
rolling stats) use window functions instead — the pandas path serializes
every group through Arrow and breaks whole-stage codegen.

Scale contract: one shuffle on the group key; each group must fit in one
executor's memory as a pandas DataFrame.  Hot groups -> pre-split with a
salt column and merge results.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def grouped_apply(
    df: DataFrame,
    group_cols: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: str,
) -> DataFrame:
    """Apply ``fn`` to each group as a pandas DataFrame (Arrow-batched)."""
    return df.groupBy(*group_cols).applyInPandas(fn, schema=output_schema)
