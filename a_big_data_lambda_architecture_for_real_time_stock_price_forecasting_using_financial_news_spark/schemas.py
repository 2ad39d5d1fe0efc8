"""Typed schemas for every stream/table the engine handles.

The reference parses every Kafka stream with a hand-written all-string
StructType (reference ``Batch_layer/yfConsumer.py:36-44``,
``twitterConsumer.py:42-45``, ``nytConsumer.py:36-40``) and carries numerics
as strings end-to-end. Per SURVEY §1.3 we type at the parse boundary instead:
DoubleType prices, LongType volume, DateType keys.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference-domain streams (SURVEY §1.2) -------------------------------

#: Raw stock feed as produced (reference yfProducer.py:23-39): all strings.
STOCK_RAW = T.StructType(
    [
        T.StructField("Date", T.StringType()),
        T.StructField("Open", T.StringType()),
        T.StructField("High", T.StringType()),
        T.StructField("Low", T.StringType()),
        T.StructField("Close", T.StringType()),
        T.StructField("Adj Close", T.StringType()),
        T.StructField("Volume", T.StringType()),
    ]
)

#: Typed stock row after ingest cast (engine-side improvement per SURVEY §1.3).
STOCK = T.StructType(
    [
        T.StructField("Date", T.DateType()),
        T.StructField("Open", T.DoubleType()),
        T.StructField("High", T.DoubleType()),
        T.StructField("Low", T.DoubleType()),
        T.StructField("Close", T.DoubleType()),
        T.StructField("Volume", T.LongType()),
    ]
)

#: Tweet stream (reference twitterConsumer.py:42-45).
TWEET_RAW = T.StructType(
    [
        T.StructField("Date", T.StringType()),
        T.StructField("Text", T.StringType()),
    ]
)

#: NYT article stream (reference nytConsumer.py:36-40).
NEWS_RAW = T.StructType(
    [
        T.StructField("Id", T.StringType()),
        T.StructField("Date", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

#: Merged daily view row (reference batchPipeline.py:163-164,
#: yfConsumerStream.py:49-53), typed.
DAILY_VIEW = T.StructType(
    [
        T.StructField("Date", T.DateType()),
        T.StructField("Open", T.DoubleType()),
        T.StructField("High", T.DoubleType()),
        T.StructField("Low", T.DoubleType()),
        T.StructField("Close", T.DoubleType()),
        T.StructField("Volume", T.LongType()),
        T.StructField("Nbr_article", T.LongType()),
        T.StructField("Positive", T.DoubleType()),
        T.StructField("Negative", T.DoubleType()),
        T.StructField("Neutre", T.DoubleType()),
    ]
)

# --- driver testdata tables (TESTDATA.md / FIXTURES.md §A) ----------------

#: events.props JSON payload (single counter key).
EVENT_PROPS = T.StructType([T.StructField("k", T.LongType())])

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
