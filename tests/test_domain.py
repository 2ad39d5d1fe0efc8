"""Unit tests for the reference-domain layers: cleaning (X4/X5), sentiment
(M3), Transformers (M1/M2/M4), pairwise-compat mean (A4), forecaster (M5).
Behavior anchored to the reference semantics cited in each module."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Row
from pyspark.sql import functions as F

PKG = "a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark"


def test_clean_text_reference_semantics(spark):
    from importlib import import_module

    cleaning = import_module(f"{PKG}.functions.cleaning")
    df = spark.createDataFrame(
        [
            Row(id=1, text="Check https://t.co/xyz out @user #AAPL $150 big_gains \U0001f600!!"),
            Row(id=2, text="short"),  # len<10 → null → dropped
            Row(id=3, text=None),
            Row(id=4, text="plain words stay untouched"),
        ]
    )
    out = (
        df.withColumn("c", cleaning.clean_text("text"))
        .na.drop(subset=["c"])
        .select("id", "c")
        .collect()
    )
    got = {r["id"]: r["c"] for r in out}
    assert set(got) == {1, 4}
    assert got[1] == "Check out AAPL 150 big gains !!"
    assert got[4] == "plain words stay untouched"


def test_clean_tweet_producer_semantics(spark):
    from importlib import import_module

    cleaning = import_module(f"{PKG}.functions.cleaning")
    df = spark.createDataFrame([Row(text="RT @bob: AAPL; to the moon!! http://x.y 100%")])
    (got,) = df.select(cleaning.clean_tweet("text").alias("c")).collect()
    assert got["c"] == "RT AAPL to the moon 100"


def test_lexicon_scores_sum_to_one(spark):
    from importlib import import_module

    senti = import_module(f"{PKG}.functions.sentiment")
    df = spark.createDataFrame([Row(text="fast fast slow neutral words here")])
    (r,) = df.select(senti.lexicon_scores("text").alias("s")).collect()
    s = r["s"]
    assert abs(s["positive"] - 2 / 6) < 1e-15
    assert abs(s["negative"] - 1 / 6) < 1e-15
    assert abs(s["positive"] + s["negative"] + s["neutre"] - 1.0) < 1e-12


def test_pandas_scorer_matches_column_scorer(spark):
    from importlib import import_module

    senti = import_module(f"{PKG}.functions.sentiment")
    df = spark.createDataFrame(
        [Row(text="fast big slow x"), Row(text="a b c"), Row(text="slow slow slow")]
    )
    a = df.select(senti.lexicon_scores("text").alias("m")).collect()
    b = df.select(senti.lexicon_scores_pandas("text").alias("s")).collect()
    for ra, rb in zip(a, b):
        assert abs(ra["m"]["positive"] - rb["s"]["positive"]) < 1e-15
        assert abs(ra["m"]["negative"] - rb["s"]["negative"]) < 1e-15


def test_news_pipeline_transformer_chain(spark):
    from importlib import import_module

    tr = import_module(f"{PKG}.ml.transformers")
    df = spark.createDataFrame(
        [
            Row(Date="2024-01-01", text="fast big wins today ok"),
            Row(Date="2024-01-01", text="slow small losses today"),
            Row(Date="2024-01-02", text="neutral words only here"),
            Row(Date="2024-01-02", text="bad"),  # dropped by CleanNews
        ]
    )
    out = tr.news_pipeline().fit(df).transform(df).collect()
    by_date = {r["Date"]: r for r in out}
    assert by_date["2024-01-01"]["Nbr_article"] == 2
    assert by_date["2024-01-02"]["Nbr_article"] == 1
    r1 = by_date["2024-01-01"]
    assert abs(r1["Positive"] - (2 / 5 + 0) / 2) < 1e-12
    assert abs(r1["Negative"] - (0 + 2 / 4) / 2) < 1e-12


def test_pairwise_compat_is_recurrence_not_mean(spark):
    """Reference twitterConsumerStream.py:100-106: avg=(old+new)/2 per step.
    Sequence 1,2,3 (time order) → ((1+2)/2+3)/2 = 2.25, not mean 2.0."""
    from importlib import import_module

    agg = import_module(f"{PKG}.operators.aggregate")
    df = spark.createDataFrame(
        [Row(g="a", t=1, v=1.0), Row(g="a", t=2, v=2.0), Row(g="a", t=3, v=3.0)]
    )
    (r,) = agg.pairwise_mean_compat(df, ["g"], "t", "v").collect()
    assert r["pairwise_avg"] == 2.25
    assert r["n"] == 3


def test_last_write_wins_picks_latest(spark):
    from importlib import import_module

    agg = import_module(f"{PKG}.operators.aggregate")
    df = spark.createDataFrame(
        [Row(k="d1", t=1, v=10.0), Row(k="d1", t=5, v=50.0), Row(k="d2", t=2, v=20.0)]
    )
    rows = {r["k"]: r["v"] for r in agg.last_write_wins(df, "k", "t").collect()}
    assert rows == {"d1": 50.0, "d2": 20.0}


def test_drift_forecaster():
    from importlib import import_module

    fc = import_module(f"{PKG}.ml.forecast")
    pdf = pd.DataFrame(
        {"series": ["x"] * 3, "day": ["2024-01-01", "2024-01-02", "2024-01-03"],
         "close_v": [10.0, 11.0, 14.0]}
    )
    out = fc.drift_forecast(pdf)
    assert out["pred_close"].iloc[0] == 14.0 + (14.0 - 10.0) / 2
    assert out["n_days"].iloc[0] == 3


def test_forecast_per_series_distributed(spark):
    from importlib import import_module

    fc = import_module(f"{PKG}.ml.forecast")
    df = spark.createDataFrame(
        [
            Row(series="a", day="2024-01-01", close_v=1.0),
            Row(series="a", day="2024-01-02", close_v=3.0),
            Row(series="b", day="2024-01-01", close_v=5.0),
        ]
    )
    rows = {r["series"]: r for r in fc.forecast_per_series(df).collect()}
    assert rows["a"]["pred_close"] == 3.0 + (3.0 - 1.0) / 1
    assert rows["b"]["pred_close"] == 5.0  # single point → carry forward


def test_score_sentiment_backends_agree(spark):
    """M3 seam: the tensor backend (default — frozen-weight net, real
    batched matmul), the pandas backend, and the codegen Column backend
    produce identical map columns."""
    from importlib import import_module

    tr = import_module(f"{PKG}.ml.transformers")
    df = spark.createDataFrame(
        [Row(text="fast big slow x"), Row(text="a b c"), Row(text="slow slow slow")]
    )
    tens_rows = tr.ScoreSentiment(inputCol="text", outputCol="s").transform(df).collect()
    pd_rows = (
        tr.ScoreSentiment(inputCol="text", outputCol="s", backend="pandas")
        .transform(df)
        .collect()
    )
    col_rows = (
        tr.ScoreSentiment(inputCol="text", outputCol="s", backend="column")
        .transform(df)
        .collect()
    )
    for rt, rp, rc in zip(tens_rows, pd_rows, col_rows):
        assert rt["s"] == rp["s"] == rc["s"]


def test_tensor_scorer_respects_arrow_batch_size(spark):
    """The model seam must actually be BATCHED: under a small
    spark.sql.execution.arrow.maxRecordsPerBatch the scorer runs once per
    record batch (observed via accumulator), peak activation memory is
    O(batch), and the scores are unchanged by the batch slicing."""
    from importlib import import_module

    sent = import_module(f"{PKG}.functions.sentiment")
    from pyspark.sql import functions as F

    rows = [Row(doc_id=i, text=f"fast word{i} slow big") for i in range(100)]
    df = spark.createDataFrame(rows).repartition(1)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    acc = spark.sparkContext.accumulator(0)
    udf = sent.make_tensor_udf(batch_counter=acc)
    try:
        spark.conf.set(key, "16")
        small = {
            r["doc_id"]: r["s"]
            for r in df.withColumn("s", udf(F.col("text"))).collect()
        }
        n_batches = acc.value
        assert n_batches >= 100 // 16  # 100 rows / 16-cap -> >= 6 batches
        spark.conf.set(key, "10000")
        big = {
            r["doc_id"]: r["s"]
            for r in df.withColumn("s", udf(F.col("text"))).collect()
        }
    finally:
        spark.conf.set(key, old)
    assert small == big  # batch slicing cannot change model output


def test_tensor_scorer_batch_function_is_slice_invariant(spark):
    """Pure-numpy check (no Spark): scoring a frame in one batch equals
    scoring any concatenation of slices — padding per batch is internal."""
    import pandas as pd
    from importlib import import_module

    sent = import_module(f"{PKG}.functions.sentiment")
    texts = pd.Series(
        ["fast big slow x", "a b c", "slow slow slow", "", "fast"] * 7
    )
    whole = sent.tensor_score_batch(texts)
    parts = pd.concat(
        [sent.tensor_score_batch(texts[i : i + 4]) for i in range(0, len(texts), 4)]
    )
    assert whole.equals(parts)


def test_pairwise_compat_hot_key_guard(spark):
    """The bug-compat fold hard-errors on a key wider than max_values
    instead of OOMing the executor; under the cap results are unchanged."""
    import pytest
    from importlib import import_module

    agg = import_module(f"{PKG}.operators.aggregate")
    rows = [Row(g="hot", t=i, v=float(i)) for i in range(10)]
    df = spark.createDataFrame(rows)
    with pytest.raises(Exception, match="max_values"):
        agg.pairwise_mean_compat(df, ["g"], "t", "v", max_values=5).collect()
    (ok,) = agg.pairwise_mean_compat(df, ["g"], "t", "v", max_values=10).collect()
    assert ok["n"] == 10


def test_news_pipeline_save_load_roundtrip(spark, tmp_path):
    """M4 lifecycle: the fitted PipelineModel saves and loads with params
    intact and produces identical results — the reference rebuilds its
    pipeline in-line every run and has no persistence story."""
    from importlib import import_module

    from pyspark.ml import PipelineModel

    tr = import_module(f"{PKG}.ml.transformers")
    df = spark.createDataFrame(
        [
            Row(Date="2024-01-01", text="fast big wins today ok"),
            Row(Date="2024-01-01", text="slow small losses today"),
            Row(Date="2024-01-02", text="neutral words only here"),
        ]
    )
    model = tr.news_pipeline().fit(df)
    path = str(tmp_path / "news_model")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    want = {(r["Date"], r["Nbr_article"], r["Positive"]) for r in model.transform(df).collect()}
    got = {(r["Date"], r["Nbr_article"], r["Positive"]) for r in loaded.transform(df).collect()}
    assert got == want
    # backend param survives the round-trip
    assert loaded.stages[1].getOrDefault("backend") == "tensor"


def test_json_csv_sources_roundtrip_with_dead_letters(spark, tmp_path):
    """S4 source breadth: NDJSON and CSV readers with explicit schemas
    round-trip clean rows and quarantine malformed lines into the corrupt
    column instead of failing the job."""
    from importlib import import_module

    from pyspark.sql import types as T

    sources = import_module(f"{PKG}.sources.batch")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )

    jdir = tmp_path / "j"
    jdir.mkdir()
    (jdir / "a.json").write_text(
        '{"id": 1, "v": 1.5}\n'
        "this is not json\n"
        '{"id": 2, "v": 2.5}\n'
    )
    # Spark disallows corrupt-column-only queries on raw files; cache the
    # parsed result first (the documented pattern)
    jdf = sources.read_json_lines(spark, str(jdir), schema).cache()
    good = {(r["id"], r["v"]) for r in jdf.filter("_corrupt_record IS NULL").collect()}
    bad = jdf.filter("_corrupt_record IS NOT NULL").count()
    assert good == {(1, 1.5), (2, 2.5)} and bad == 1

    cdir = tmp_path / "c"
    cdir.mkdir()
    (cdir / "a.csv").write_text("id,v\n1,1.5\n2,not_a_number\n3,3.5\n")
    cdf = sources.read_csv(spark, str(cdir), schema).cache()
    good = {(r["id"], r["v"]) for r in cdf.filter("_corrupt_record IS NULL").collect()}
    assert good == {(1, 1.5), (3, 3.5)}
    assert cdf.filter("_corrupt_record IS NOT NULL").count() == 1


def test_holt_forecast_recursion(spark):
    """m9: hand-computed Holt(0.5, 0.5) on a 4-day series, plus the 1-day
    degenerate case."""
    from importlib import import_module

    fc = import_module(f"{PKG}.ml.forecast")
    daily = spark.createDataFrame(
        [Row(series="s", day=d, close_v=v) for d, v in
         [("2024-01-01", 10.0), ("2024-01-02", 12.0),
          ("2024-01-03", 11.0), ("2024-01-04", 15.0)]]
        + [Row(series="one", day="2024-01-01", close_v=7.0)]
    )
    rows = {r["series"]: r for r in
            fc.forecast_per_series(daily, fc.holt_forecast).collect()}
    # l,b: (10,2) ->12,2 ->12.5,1.25 ->14.375,1.5625 => pred 15.9375
    assert rows["s"]["pred_close"] == 15.9375
    assert rows["s"]["n_days"] == 4
    assert rows["one"]["pred_close"] == 7.0


def test_sql_catalog_entry_point(spark, sf_dir):
    """register_tables exposes the dataset to plain spark.sql with pushdown
    intact — the switch-over surface for a SQL-first reference user."""
    from importlib import import_module

    catalog = import_module(f"{PKG}.sources.catalog")
    names = catalog.register_tables(spark, sf_dir)
    assert "events" in names and "lineitem" in names
    df = spark.sql(
        """
        SELECT r.r_name, count(*) AS n
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )
    rows = df.collect()
    assert len(rows) == 5 and sum(r["n"] for r in rows) > 0
    # the nanos-normalized events view is queryable with date semantics
    (d,) = catalog.sql(
        spark, sf_dir, "SELECT count(DISTINCT CAST(ts AS DATE)) AS d FROM events"
    ).collect()
    assert d["d"] == 30


def test_float_weight_model_through_arrow_seam(spark):
    """Beyond the integer lexicon net: a float32 RANDOM-weight
    embedding+linear model (real checkpoint dtype and capacity) through
    the same pandas_udf seam. Per-row computation is independent, so Arrow
    batch slicing must not change a single score bit."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import col, pandas_udf
    from pyspark.sql.types import DoubleType

    rng = np.random.default_rng(42)
    emb_w = rng.standard_normal((1000, 32)).astype(np.float32)
    head_w = rng.standard_normal(32).astype(np.float32)

    def tok_id(w: str) -> int:  # deterministic across worker processes
        h = 0
        for ch in w:
            h = (h * 131 + ord(ch)) % 1000
        return h

    @pandas_udf(DoubleType())
    def scorer(text: pd.Series) -> pd.Series:
        vals = []
        for t in text:
            ids = np.array([tok_id(w) for w in t.split()] or [0])
            vals.append(float(emb_w[ids].sum(axis=0) @ head_w))
        return pd.Series(vals, index=text.index)

    df = spark.createDataFrame(
        [Row(i=i, text=f"tok{i} tok{i*7%90} common words here") for i in range(120)]
    ).repartition(1)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "16")
        small = {r["i"]: r["s"] for r in df.withColumn("s", scorer(col("text"))).collect()}
        spark.conf.set(key, "10000")
        big = {r["i"]: r["s"] for r in df.withColumn("s", scorer(col("text"))).collect()}
    finally:
        spark.conf.set(key, old)
    assert small == big and len(small) == 120
