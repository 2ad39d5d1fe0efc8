"""End-to-end smoke + contract tests (SURVEY §5.4)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"event_date", "open_v", "close_v", "nbr_article", "avg_score"} <= cols


def test_registry_contract():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 18
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # all callables take (spark, sf_dir)
    for fn in qs.values():
        assert callable(fn)


def test_flagship_excludes_live_day(spark, sf_dir):
    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.plans.batch_pipeline import (
        flagship,
    )

    df = flagship(spark, sf_dir, as_of="2024-01-30")
    dates = {str(r["event_date"]) for r in df.select("event_date").collect()}
    assert "2024-01-30" not in dates
    assert len(dates) > 0


def test_flagship_ohlc_invariants(spark, sf_dir):
    df = entrymod.entry(spark)
    for r in df.collect():
        assert r["low_v"] <= r["high_v"]
        assert r["low_v"] <= r["open_v"] <= r["high_v"]
        assert r["low_v"] <= r["close_v"] <= r["high_v"]
        assert r["n_trades"] > 0 and r["nbr_article"] > 0
