"""Custom stateful streaming operator via ``applyInPandasWithState``.

``running_totals`` keeps a per-key (count, sum) accumulator across
micro-batches and emits the updated totals for every key seen in each
batch — the building block for live per-entity counters (events per user,
bytes per source, tokens per corpus shard).

State is keyed and partitioned by Spark's state store: memory scales with
distinct keys per executor, not stream length.  Timeouts are left to the
caller's config (NoTimeout here: counters never expire).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming per-key running (n, total) — updated rows emitted each
    micro-batch the key appears in.  The key column keeps its input type
    (string source ids work the same as numeric user ids)."""

    key_type = dict(stream.dtypes)[key_col]
    output_schema = f"{key_col} {key_type}, n long, total double"
    state_schema = "n long, total double"

    def update(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
