"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's streaming layer is stateless per message (each Cloud
Function invocation is independent; ``logger/main.py:153-186``). A complete
engine also needs *cross-batch* keyed state — running per-entity aggregates
that survive micro-batch boundaries — which Structured Streaming exposes as
``applyInPandasWithState`` (Arrow-batched keyed state with timeouts).

The operator here keeps a running (count, sum, last_ts) per key and emits
the updated totals each micro-batch; idle keys are finalized and dropped
after ``idle_timeout`` of processing time — the keyed-state analogue of a
session close.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, closed boolean"
STATE_SCHEMA = "n long, total double"


def running_user_totals(events: DataFrame, *, idle_timeout_ms: int = 60_000) -> DataFrame:
    """Running per-user (count, sum) across micro-batches.

    Works on a streaming DataFrame with columns ``(user_id, value, ...)``;
    state is per-key ``(n, total)``, emitted updated every batch, closed via
    processing-time timeout when a key goes idle.
    """

    def update(key, pdfs, state):
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total], "closed": [True]}
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total], "closed": [False]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
