"""Flagship batch-view pipeline (SURVEY §3.2, re-expressed Spark-first).

Reference flow (``Batch_layer/batchPipeline.py``): scan news_master +
stock_master from ES → clean → score sentiment → per-Date aggregate → inner
join stock⋈sentiment on the Date key → drop nulls → exclude today
(``Date != dateNow``, batchPipeline.py:166-167) → overwrite batch_view.

Testdata mapping: the ``events`` table plays both feeds — ``purchase``
events are the stock/trade feed (price = value), every other event type is
the news feed (per-article score = ``props.k``, parsed with ``from_json``
exactly like the reference parses Kafka payloads, P2). The join key is the
event date (the reference's ES ``_id``).

Scale notes (100 TB): one scan of events feeds both aggregation branches;
each branch reduces to O(#days) rows via partial+final hash agg before the
join, so the join is trivially broadcastable (AQE converts it). The clock is
an explicit ``as_of`` parameter — the reference's ``datetime.now()`` makes
runs irreproducible (SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import daily_ohlc, daily_sentiment
from ..schemas import EVENT_PROPS
from ..sources.batch import load_table

#: Deterministic stand-in for the reference's ``datetime.now()``: the last
#: day present in the events fixture at every scale factor.
DEFAULT_AS_OF = "2024-01-30"


def parse_props(events: DataFrame) -> DataFrame:
    """P1+P2: cast payload to string and parse JSON with an explicit schema
    (the reference's ``CAST(value AS STRING)`` + ``from_json`` + ``data.*``,
    e.g. ``Batch_layer/yfConsumer.py:33,47``)."""
    return events.withColumn(
        "k", F.from_json(F.col("props").cast("string"), EVENT_PROPS)["k"]
    )


def build_batch_view(events: DataFrame, as_of: str = DEFAULT_AS_OF) -> DataFrame:
    """stock-half ⋈ sentiment-half per day, excluding the live day (F1/T7)."""
    ev = parse_props(events)
    trades = ev.filter(F.col("event_type") == "purchase")
    news = ev.filter(F.col("event_type") != "purchase")

    stock = daily_ohlc(trades)
    senti = daily_sentiment(news).withColumnRenamed("event_date", "news_date")

    joined = stock.join(senti, stock["event_date"] == senti["news_date"], "inner")
    return (
        joined.select(
            "event_date",
            "open_v",
            "high_v",
            "low_v",
            "close_v",
            "n_trades",
            "turnover",
            "nbr_article",
            "avg_score",
        )
        .na.drop()
        .filter(F.col("event_date") != F.to_date(F.lit(as_of)))
    )


def flagship(spark: SparkSession, sf_dir: str, as_of: str = DEFAULT_AS_OF) -> DataFrame:
    return build_batch_view(load_table(spark, sf_dir, "events"), as_of=as_of)
