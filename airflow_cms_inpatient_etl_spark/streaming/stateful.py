"""Custom stateful streaming operator via ``applyInPandasWithState``.

Example operator: per-user running profile (event count + running value sum),
emitted on every micro-batch — the shape any custom accumulating state takes
(session carts, feature aggregates, counters).  The state is a single tuple
per key, so memory is O(|users|) regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
STATE_SCHEMA = "n bigint, total double"


def _update(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):  # noqa: F821
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [total]})


def running_user_profile(events: DataFrame) -> DataFrame:
    """Streaming per-user accumulator (custom stateful op, Arrow-batched)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
