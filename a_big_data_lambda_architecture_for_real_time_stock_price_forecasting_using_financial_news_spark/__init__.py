"""PySpark-native Lambda-architecture analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of the reference repo
``mohcinsarrar/A-Big-data-Lambda-architecture-for-real-time-stock-price-forecasting-using-financial-news``
(see SURVEY.md). The reference outsources keyed upserts, incremental
aggregation, and view maintenance to Elasticsearch painless scripts; this
engine internalizes all of it with idiomatic Spark primitives:

- typed ingest (``from_json`` + explicit StructType) instead of all-string rows
- parquet/partitioned keyed views instead of ES indices
- stateful Structured Streaming + ``foreachBatch`` keyed merges instead of
  painless upsert scripts
- Catalyst predicate pushdown instead of hand-written ``es.query`` JSON
- pure-Column expressions instead of row-at-a-time Python UDFs
- ``applyInPandas`` per-series forecasting instead of driver ``toPandas()``

Subpackages:
    sources/    batch + streaming scans (SURVEY §2.1)
    functions/  scalar expression layers: cleaning, sentiment, text, vectors
    operators/  aggregations, joins, keyed merges, dedup, similarity
    plans/      end-to-end pipeline compositions (batch view, serving)
    streaming/  triggers, watermarks, windows, stateful upserts
    ml/         Transformers (CleanNews/AggNews shape) + forecaster
"""

__version__ = "0.1.0"
