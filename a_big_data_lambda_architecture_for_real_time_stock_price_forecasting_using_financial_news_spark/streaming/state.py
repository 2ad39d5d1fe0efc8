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


TOPK_OUT_SCHEMA = "key string, n bigint, top1 double, top2 double, top3 double"
TOPK_STATE_SCHEMA = "n bigint, vals array<double>"
TOPK_K = 3


def _update_topk(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, vals = state.get if state.exists else (0, [])
    vals = list(vals)
    for pdf in pdfs:
        n += len(pdf)
        vals.extend(float(v) for v in pdf["v"])
        vals = sorted(vals, reverse=True)[:TOPK_K]
    state.update((n, vals))
    padded = vals + [None] * (TOPK_K - len(vals))
    yield pd.DataFrame(
        {"key": [key[0]], "n": [n],
         "top1": [padded[0]], "top2": [padded[1]], "top3": [padded[2]]}
    )


def running_topk_stream(keyed: DataFrame) -> DataFrame:
    """T6 variant with NON-algebraic state: the running top-3 values per
    key. Unlike (sum, count), top-k state is a bounded ORDER STATISTIC —
    the state store holds the k retained values, each batch folds its rows
    in and re-truncates, so state stays O(k) per key no matter how many
    rows stream past (the property that makes it safe at 100 TB)."""
    return keyed.groupBy("key").applyInPandasWithState(
        _update_topk,
        outputStructType=TOPK_OUT_SCHEMA,
        stateStructType=TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
