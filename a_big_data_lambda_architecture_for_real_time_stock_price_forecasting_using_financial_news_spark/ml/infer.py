"""Batched tensor inference through the Arrow seam — the model-shaped
workload the FinBERT slot (reference
``airflow/dags/Batch_layer/batchPipeline.py:134-147``) implies but never
exercises: real matrix multiplication over a *batch* of rows crossing
``mapInPandas``, not per-row lexicon lookups.

The model is a 2-layer integer MLP over the ``embeddings`` table:

    xq     = clip(floor(128 * x), -128, 127)          # int8-range input
    hidden = relu(xq @ W1)                            # (batch, d) @ (d, h)
    logits = hidden @ W2                              # (batch, h) @ (h, c)
    out    = argmax(logits), max(logits)

Every step is exact integer arithmetic, so the DuckDB oracle twin
(:func:`mlp_infer_sql`) matches bit-for-bit — no float summation-order
hazard — while the Spark path still performs genuine batched ``np.matmul``
over each Arrow record batch (BLAS-shaped work, the memory/batch-size
behavior a real quantized model exhibits). ``floor(128 * x)`` is chosen
over a learned scale because multiplication by a power of two and
``floor`` are IEEE-exact and identical across engines (same discipline as
``ext/similarity.quantize_int8``).

Weights are deterministic functions of their indices (no weight file):
``W1[j, i] = ((7 j + 11 i) mod 5) - 2`` and
``W2[i, c] = ((5 i + 13 c) mod 7) - 3``.

100 TB shape: embarrassingly parallel single pass — no shuffle, no join;
the weights are O(d*h + h*c) integers materialized once per Python worker;
peak memory per task is one Arrow batch (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``), which is exactly how a
real GPU/CPU model server would consume the stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 64
HIDDEN = 16
CLASSES = 4
SCALE = 128


def mlp_weights(d: int = DIM, h: int = HIDDEN, c: int = CLASSES):
    """The deterministic integer weight matrices (int64 for exact matmul)."""
    j = np.arange(d)[:, None]
    i = np.arange(h)[None, :]
    w1 = ((7 * j + 11 * i) % 5) - 2
    i2 = np.arange(h)[:, None]
    cc = np.arange(c)[None, :]
    w2 = ((5 * i2 + 13 * cc) % 7) - 3
    return w1.astype(np.int64), w2.astype(np.int64)


def mlp_infer(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_stats: bool = False,
) -> DataFrame:
    """Batched int8-MLP inference over an embedding column.

    ``batch_stats=True`` adds a ``batch_rows`` column recording the Arrow
    batch size each row was processed in — used by tests to prove the seam
    is genuinely batched (and bounded by ``arrow.maxRecordsPerBatch``);
    keep it off for oracle-compared output (batch boundaries are not
    deterministic across partitionings).
    """
    schema = f"{id_col} long, pred_class int, max_logit long"
    if batch_stats:
        schema += ", batch_rows int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w1, w2 = mlp_weights()
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            xq = np.clip(np.floor(SCALE * x), -128, 127).astype(np.int64)
            hidden = np.maximum(xq @ w1, 0)
            logits = hidden @ w2
            out = {
                id_col: pdf[id_col].to_numpy(),
                "pred_class": logits.argmax(axis=1).astype(np.int32),
                "max_logit": logits.max(axis=1),
            }
            if batch_stats:
                out["batch_rows"] = np.full(len(pdf), len(pdf), dtype=np.int32)
            yield pd.DataFrame(out)

    # Dense-input gate: besides null/mis-sized vectors, drop vectors with
    # any null/NaN element — np.floor(NaN).astype(int64) is platform-
    # undefined while SQL engines propagate NULL, a silent cross-engine
    # divergence on dirty input.  The oracle twin applies the same gate.
    dense = F.forall(vec_col, lambda x: x.isNotNull() & ~F.isnan(x))
    clean = df.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == DIM) & dense
    ).select(id_col, vec_col)
    return clean.mapInPandas(run, schema=schema)


def mlp_infer_sql(
    table: str, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """DuckDB twin: same quantization, same weights, same integer matmul
    (as nested list-lambda folds), same first-max argmax tie-break."""
    return f"""
    WITH q AS (
      SELECT {id_col},
             list_transform({vec_col},
               x -> CAST(greatest(-128, least(127,
                       floor({SCALE} * CAST(x AS DOUBLE)))) AS BIGINT)) AS xq
      FROM {table}
      WHERE {vec_col} IS NOT NULL AND len({vec_col}) = {DIM}
        AND len(list_filter({vec_col},
              x -> x IS NULL OR isnan(CAST(x AS DOUBLE)))) = 0
    ), h AS (
      SELECT {id_col},
             list_transform(range(0, {HIDDEN}), i ->
               greatest(0, CAST(list_sum(list_transform(range(0, {DIM}), j ->
                 xq[CAST(j + 1 AS INTEGER)] * (((7*j + 11*i) % 5) - 2)
               )) AS BIGINT))) AS hv
      FROM q
    ), l AS (
      SELECT {id_col},
             list_transform(range(0, {CLASSES}), c ->
               CAST(list_sum(list_transform(range(0, {HIDDEN}), i ->
                 hv[CAST(i + 1 AS INTEGER)] * (((5*i + 13*c) % 7) - 3)
               )) AS BIGINT)) AS logits
      FROM h
    )
    SELECT {id_col},
           CAST(list_indexof(logits, list_max(logits)) - 1 AS INTEGER) AS pred_class,
           CAST(list_max(logits) AS BIGINT) AS max_logit
    FROM l
    """
