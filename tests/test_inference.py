"""Batched-tensor Arrow seam (ml/infer.py): the model slot's batch-size and
memory behavior, which the lexicon scorer never exercised."""

from __future__ import annotations

import numpy as np
import pytest

from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.ml import (
    infer,
)


@pytest.fixture()
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_matches_numpy_reference(spark, emb):
    """End-to-end Spark result == straight-line numpy on the same rows."""
    rows = emb.orderBy("vec_id").collect()
    x = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    xq = np.clip(np.floor(infer.SCALE * x), -128, 127).astype(np.int64)
    w1, w2 = infer.mlp_weights()
    logits = np.maximum(xq @ w1, 0) @ w2
    got = {
        r.vec_id: (r.pred_class, r.max_logit)
        for r in infer.mlp_infer(emb).collect()
    }
    assert len(got) == len(rows)
    for k, r in enumerate(rows):
        assert got[r.vec_id] == (int(logits[k].argmax()), int(logits[k].max()))


def test_batches_bounded_and_result_batch_invariant(spark, emb):
    """The seam processes bounded Arrow batches (not one giant pandas frame,
    not per-row calls), and the answer is identical across batch sizes."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "37")
        small = infer.mlp_infer(emb.coalesce(1), batch_stats=True).collect()
        sizes = {r.batch_rows for r in small}
        assert max(sizes) <= 37
        assert len(small) > 37  # more rows than one batch -> several batches
        spark.conf.set(key, "100000")
        big = infer.mlp_infer(emb.coalesce(1)).collect()
    finally:
        if old is not None:
            spark.conf.set(key, old)
    assert {(r.vec_id, r.pred_class, r.max_logit) for r in small} == {
        (r.vec_id, r.pred_class, r.max_logit) for r in big
    }


def test_malformed_vectors_filtered(spark):
    """Null / wrong-dimension vectors are gated out before the seam."""
    import pyspark.sql.functions as F

    base = spark.range(5).select(
        F.col("id").alias("vec_id"),
        F.when(
            F.col("id") == 3, F.array(*[F.lit(0.5)] * 3)  # wrong dim
        )
        .when(F.col("id") == 4, F.lit(None))  # null
        .otherwise(F.array(*[F.lit(0.25)] * infer.DIM))
        .cast("array<float>")
        .alias("embedding"),
    )
    out = infer.mlp_infer(base).collect()
    assert sorted(r.vec_id for r in out) == [0, 1, 2]


def test_sparse_or_nan_elements_filtered(spark):
    """A right-sized vector containing a null or NaN element is also gated:
    np.floor(NaN).astype(int64) is platform-undefined while SQL engines
    propagate NULL — without the dense gate Spark and the oracle silently
    diverge on dirty input."""
    import pyspark.sql.functions as F

    full = F.array(*[F.lit(0.25)] * infer.DIM)
    with_nan = F.concat(
        F.array(*[F.lit(0.25)] * (infer.DIM - 1)), F.array(F.lit(float("nan")))
    )
    with_null = F.concat(
        F.array(*[F.lit(0.25)] * (infer.DIM - 1)),
        F.array(F.lit(None).cast("float")),
    )
    base = spark.range(4).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") == 2, with_nan)
        .when(F.col("id") == 3, with_null)
        .otherwise(full)
        .cast("array<float>")
        .alias("embedding"),
    )
    out = infer.mlp_infer(base).collect()
    assert sorted(r.vec_id for r in out) == [0, 1]
