"""pyspark.ml Transformers mirroring the reference's pipeline stages
(SURVEY §2.6 M1/M2/M4).

The reference defines ``CleanNews`` (scalar-UDF cleaner + dropna,
``Batch_layer/batchPipeline.py:20-66``) and ``AggNews`` (annotation
extraction + daily aggregation, ``batchPipeline.py:69-94``) and chains them
in a 5-stage ``Pipeline`` (batchPipeline.py:151-160). The Transformer shape
*is* idiomatic Spark ML, so it is kept — but ``_transform`` bodies are pure
Column expressions (no Python UDF on the hot path).
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Pipeline, Transformer
from pyspark.ml.param import Param, Params
from pyspark.ml.param.shared import HasInputCol, HasOutputCol
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import clean_text
from ..functions.sentiment import (
    lexicon_scores,
    lexicon_scores_pandas,
    tensor_scores_pandas,
)


class _ColParams(
    Transformer, HasInputCol, HasOutputCol, DefaultParamsWritable, DefaultParamsReadable
):
    """Param-only transformers are fully described by their params, so the
    default JSON reader/writer gives save/load (PipelineModel.save → load
    round-trips, tested) — the model-lifecycle surface the reference never
    had (it rebuilds its Pipeline in-line every run)."""

    @keyword_only
    def __init__(self, inputCol: str = "text", outputCol: str = "out"):
        super().__init__()
        self._set(inputCol=inputCol, outputCol=outputCol)


class CleanNews(_ColParams):
    """M1: clean + drop unusable rows (reference batchPipeline.py:20-66),
    UDF-free."""

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df.withColumn(self.getOutputCol(), clean_text(self.getInputCol()))
        return out.na.drop(subset=[self.getOutputCol()])


class ScoreSentiment(_ColParams):
    """M3 stand-in: deterministic sentiment scores as a map column — the
    same column shape the FinBERT stage yields after metadata extraction.

    backend="tensor" (default) runs a frozen-weight embedding+linear net as
    real batched tensor math over each Arrow record batch (numpy gather →
    sum-pool → matmul, padded token batches) — the exact integration seam
    AND execution shape a real transformer model (the reference's FinBERT,
    batchPipeline.py:142-147) plugs into, with
    spark.sql.execution.arrow.maxRecordsPerBatch bounding activation
    memory. backend="pandas" is the same seam with plain pandas ops;
    backend="column" keeps everything in codegen (the cheapest path when
    the scorer really is a lexicon). All three compute identical IEEE
    values, so swapping backends cannot change results (tested)."""

    backend = Param(Params._dummy(), "backend", "tensor | pandas | column")

    @keyword_only
    def __init__(
        self, inputCol: str = "text", outputCol: str = "out", backend: str = "tensor"
    ):
        super().__init__(inputCol=inputCol, outputCol=outputCol)
        if backend not in ("tensor", "pandas", "column"):
            raise ValueError(f"unknown backend {backend!r}")
        self._set(backend=backend)

    def _transform(self, df: DataFrame) -> DataFrame:
        out = self.getOutputCol()
        be = self.getOrDefault("backend")
        if be == "column":
            return df.withColumn(out, lexicon_scores(self.getInputCol()))
        scorer = tensor_scores_pandas if be == "tensor" else lexicon_scores_pandas
        s = scorer(F.col(self.getInputCol()))
        return (
            df.withColumn("_scored", s)
            .withColumn(
                out,
                F.create_map(
                    F.lit("positive"), F.col("_scored.positive"),
                    F.lit("negative"), F.col("_scored.negative"),
                    F.lit("neutre"), F.col("_scored.neutre"),
                ),
            )
            .drop("_scored")
        )


class AggNews(Transformer, DefaultParamsWritable, DefaultParamsReadable):
    """M2: per-day sentiment aggregation (reference batchPipeline.py:69-94):
    Nbr_article = sum of ones, per-class means from the scores map."""

    dateCol = Param(Params._dummy(), "dateCol", "grouping date column")
    scoresCol = Param(Params._dummy(), "scoresCol", "map<string,double> scores column")

    @keyword_only
    def __init__(self, dateCol: str = "Date", scoresCol: str = "scores"):
        super().__init__()
        self._set(dateCol=dateCol, scoresCol=scoresCol)

    def _transform(self, df: DataFrame) -> DataFrame:
        scores = F.col(self.getOrDefault("scoresCol"))
        return (
            df.withColumn("Nbr_article", F.lit(1))
            .groupBy(self.getOrDefault("dateCol"))
            .agg(
                F.sum("Nbr_article").cast("bigint").alias("Nbr_article"),
                F.avg(F.element_at(scores, "positive")).alias("Positive"),
                F.avg(F.element_at(scores, "negative")).alias("Negative"),
                F.avg(F.element_at(scores, "neutre")).alias("Neutre"),
            )
        )


def news_pipeline(text_col: str = "text", date_col: str = "Date") -> Pipeline:
    """M4: the reference's 5-stage Pipeline (clean → assemble/tokenize/score
    → aggregate), collapsed to its dataflow equivalent. ``fit`` is a no-op
    training pass exactly as in the reference (all stages Transformers)."""
    return Pipeline(
        stages=[
            CleanNews(inputCol=text_col, outputCol="text_clean"),
            ScoreSentiment(inputCol="text_clean", outputCol="scores"),
            AggNews(dateCol=date_col, scoresCol="scores"),
        ]
    )
