"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Lambda batch-view pipeline (SURVEY §3.2)
at sf0.001. ``queries()``/``oracle_sql()`` expose the full operator registry
(see ``plans/registry.py`` in the engine package).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.plans import (
    registry,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.
    Routed through the registered query so the session is prepared (UTC,
    AQE) and the DOUBLE output boundary applies here too."""
    return registry.QUERIES["flagship_batch_view"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
