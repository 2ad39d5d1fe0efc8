from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.session import (  # noqa: E402
    configure,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = configure(
        SparkSession.builder.appName("tests").master("local[4]")
    ).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
