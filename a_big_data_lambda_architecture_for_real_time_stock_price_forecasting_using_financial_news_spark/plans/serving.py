"""Serving-layer composition (SURVEY §3.3) + domain news pipeline.

The reference's serving job range-reads speed/batch views, collects to the
driver, scores SARIMAX, and appends to serving_view
(``Serving_layer/prediction.py``). Spark-first: per-series grouped-map
forecasting (no driver collect), lambda reconciliation as a filtered union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.forecast import drift_forecast, forecast_per_series
from ..ml.transformers import news_pipeline
from ..session import prepare
from ..sources.batch import load_table

DEC = "decimal(18,2)"


def documents_with_dates(docs: DataFrame) -> DataFrame:
    """Attach a deterministic date to the (undated) documents fixture so the
    reference's Date-keyed news pipeline has a key: day = doc_id mod 30 in
    January 2024, aligning with the events fixture window."""
    return docs.withColumn(
        "Date",
        F.date_add(F.to_date(F.lit("2024-01-01")), (F.col("doc_id") % 30).cast("int")),
    )


def run_news_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1→M4 over documents: clean → lexicon-score → per-day aggregate.

    The per-class daily means use a decimal-stabilized average (exact sum of
    per-doc scores cast to DECIMAL(18,12), one final double division) so the
    result is independent of partial-aggregation order — ``avg(double)`` is
    not, and would flap against any oracle.
    """
    prepare(spark)
    docs = documents_with_dates(load_table(spark, sf_dir, "documents"))
    model = news_pipeline(text_col="text", date_col="Date").fit(docs)
    scored = model.stages[0].transform(docs)  # CleanNews
    scored = model.stages[1].transform(scored)  # ScoreSentiment
    sc = F.col("scores")

    def stable_avg(key: str):
        d = F.element_at(sc, key).cast("decimal(18,12)")
        return (F.sum(d).cast("double") / F.count(F.lit(1))).alias(key.capitalize())

    return scored.groupBy("Date").agg(
        F.count(F.lit(1)).cast("bigint").alias("Nbr_article"),
        stable_avg("positive"),
        stable_avg("negative"),
        stable_avg("neutre"),
    )


def daily_close_by_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) closing value from the events feed — the
    multi-series generalization of the reference's single-ticker view."""
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type").alias("series"), F.to_date("ts").alias("day")
    ).agg(
        F.max_by(F.col("value").cast(DEC), F.col("ts")).cast("double").alias("close_v")
    )


def run_serving_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: grouped-map drift forecast per series (reference
    prediction.py:63-76, minus the driver-side toPandas)."""
    daily = daily_close_by_series(spark, sf_dir)
    return forecast_per_series(daily, drift_forecast)
