"""Plan-shape assertions: pushdown, broadcast, codegen (the 100 TB story).

These tests pin the physical-plan properties that matter at scale; a
regression here means a silent 100× slowdown on a real cluster even though
results stay correct.
"""

from __future__ import annotations

from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.plans import (
    registry,
)


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_f2_filter_pushed_to_scan(spark, sf_dir):
    df = registry.QUERIES["f2_date_range_pushdown"](spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "IsNotNull(o_orderdate)" in plan or "GreaterThanOrEqual(o_orderdate" in plan


def test_f2_column_pruning(spark, sf_dir):
    df = registry.QUERIES["f2_date_range_pushdown"](spark, sf_dir)
    plan = plan_of(df)
    # scan must not read unprojected columns
    assert "o_orderpriority" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_j1_broadcasts_dims(spark, sf_dir):
    df = registry.QUERIES["j1_broadcast_dim_join"](spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q1_wholestage_codegen_no_python(spark, sf_dir):
    df = registry.QUERIES["q1_pricing_summary"](spark, sf_dir)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # AQE finalizes the physical plan only after execution
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # codegen stages render as "*(N) " markers in the executed plan
    assert "*(1)" in executed


def test_q1_partial_aggregation(spark, sf_dir):
    df = registry.QUERIES["q1_pricing_summary"](spark, sf_dir)
    plan = plan_of(df)
    # partial (map-side) + final hash agg: two HashAggregate nodes
    assert plan.count("HashAggregate") >= 2


def test_flagship_single_scan_branches(spark, sf_dir):
    df = registry.QUERIES["flagship_batch_view"](spark, sf_dir)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python in pipeline
