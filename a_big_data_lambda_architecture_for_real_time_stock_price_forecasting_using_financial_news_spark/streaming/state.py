"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.7 T6 — the reference keeps all state in Elasticsearch painless
scripts; Structured Streaming keeps it in the state store instead).

``running_mean_stream`` is the correct-semantics version of the reference's
sentiment merge (K5): state per key = (sum, count), emitted as the running
mean in update mode. Exactly the state layout a ``MERGE``-free engine needs,
checkpointed and recoverable by Spark itself.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key string, n bigint, sum_v double, mean_v double"
STATE_SCHEMA = "n bigint, sum_v double"


def _update_running_mean(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["v"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"key": [key[0]], "n": [n], "sum_v": [s], "mean_v": [s / n if n else None]}
    )


def running_mean_stream(keyed: DataFrame) -> DataFrame:
    """``keyed`` must have columns (key string, v double) and be a streaming
    DataFrame. Emits one updated row per key per micro-batch."""
    return keyed.groupBy("key").applyInPandasWithState(
        _update_running_mean,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
