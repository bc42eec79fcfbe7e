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


def running_totals_tws(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (n, total) on the ``transformWithStateInPandas``
    API (Spark 4's successor to ``applyInPandasWithState``): typed
    ValueState handles, explicit processor lifecycle, per-state TTL
    support, multiple named state variables per key.

    Same semantics as :func:`running_totals` — the two are gated
    against the SAME batch oracle (q60 vs q176), pinning that the API
    migration preserves results.  State remains keyed/partitioned by
    the state store: memory scales with distinct keys per executor.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    key_type = dict(stream.dtypes)[key_col]
    output_schema = f"{key_col} {key_type}, n long, total double"

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n long, total double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {key_col: [key[0]], "n": [n], "total": [total]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=output_schema,
        outputMode="Update",
        timeMode="None",
    )
