"""Lazy-construction contract for the replay-executing entries (VERDICT r9
item 8): QUERIES[k] must be constructible without executing streams or
staging I/O — the replay runs on first touch of the returned frame, and
the result is identical to what the eager builder produced."""

from __future__ import annotations

from pyspark.sql import DataFrame

from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.plans import (
    registry,
)
from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.plans.lazyframe import (
    LazyReplayFrame,
)

LAZY_ENTRIES = [
    n
    for n, fn in registry.QUERIES.items()
    if getattr(fn, "__wrapped__", None) is not None
]


def test_lazy_entries_cover_every_replay_builder():
    """Every entry whose builder executes a stream replay or stages keyed
    views is wrapped; a new eager-construction entry must opt in here."""
    expected = {
        "t6_stream_running_mean",
        "t10_stream_topk",
        "t11_stream_stream_join",
        "t12_stream_static_join",
        "t13_stream_dedup",
        "t14_stream_state_expiry",
        "t15_stream_windowed_topk",
        "t16_stream_dedup_within_watermark",
        "t17_lambda_convergence",
        "t18_stream_scd2",
        "t19_time_travel",
        "t20_stream_agg_view",
        "t21_speed_view_stream_join",
        "t22_stream_hll_view",
        "t23_stream_cms_view",
        "t24_stream_erasure",
        "t25_stream_bitmap_view",
        "t26_stream_kmv_view",
        "t27_stream_gram_view",
        "t28_stream_histogram_view",
        "t29_stream_minhash_view",
        "t30_stream_substring_view",
        "t31_stream_semdedup_view",
        "p15_shallow_clone",
        "u9_right_to_erasure",
    }
    assert set(LAZY_ENTRIES) == expected


def test_construction_runs_no_jobs(spark, sf_dir):
    """Constructing every lazy entry triggers ZERO Spark jobs."""
    jt = spark.sparkContext._jsc.sc().statusTracker()
    frames = {}
    n_before = len(jt.getJobIdsForGroup(None))
    for name in LAZY_ENTRIES:
        frames[name] = registry.QUERIES[name](spark, sf_dir)
    n_after = len(jt.getJobIdsForGroup(None))
    assert n_after == n_before, f"construction ran {n_after - n_before} jobs"
    for name, df in frames.items():
        assert isinstance(df, DataFrame), name
        assert isinstance(df, LazyReplayFrame), name
        assert not df.is_materialized, name


def test_first_touch_materializes_and_matches_eager(spark, sf_dir):
    """Touching the proxy (schema, then collect) runs the replay once and
    reproduces the eager builder's rows exactly."""
    name = "t13_stream_dedup"  # cheapest replay in the battery
    lazy = registry.QUERIES[name](spark, sf_dir)
    assert not lazy.is_materialized
    schema = lazy.schema  # first touch: runs the replay
    assert lazy.is_materialized
    eager = registry.QUERIES[name].__wrapped__(spark, sf_dir)
    assert schema == eager.schema
    assert sorted(map(tuple, lazy.collect())) == sorted(
        map(tuple, eager.collect())
    )


def test_builder_attributeerror_surfaces_not_recurses(spark):
    """A builder bug that raises AttributeError must surface as the
    builder's error. Before the r10 fix it escaped __getattribute__,
    triggered Python's class-__getattr__ fallback (the classic
    DataFrame's column lookup), and recursed forever on the _jdf-less
    proxy."""
    import pytest

    def bad_thunk():
        raise AttributeError("'NoneType' object has no attribute 'select'")

    lf = LazyReplayFrame(bad_thunk)
    with pytest.raises(RuntimeError, match="lazy replay builder raised"):
        lf.collect()
