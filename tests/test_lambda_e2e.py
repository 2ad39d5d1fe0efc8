"""End-to-end lambda exercise (SURVEY §3): two speed-layer streams merging
disjoint column-halves of ONE keyed view (J2: the reference's
yfConsumerStream + twitterConsumerStream racing on speed_view), then serving
reconciliation (T7) and the K8 JSON encode/parse roundtrip."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

PKG = "a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark"


def _mod(name):
    from importlib import import_module

    return import_module(f"{PKG}.{name}")


STOCK_SCHEMA = T.StructType(
    [
        T.StructField("d", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("close_v", T.DoubleType()),
    ]
)
NEWS_SCHEMA = T.StructType(
    [
        T.StructField("d", T.StringType()),
        T.StructField("score", T.LongType()),
    ]
)


def _write_batches(dirpath: str, lines_per_batch: list[list[str]]) -> None:
    os.makedirs(dirpath)
    for i, lines in enumerate(lines_per_batch):
        p = f"{dirpath}/b{i}.json"
        with open(p, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        # the file source orders batches by modification time; same-ms
        # writes make the replay order ambiguous
        os.utime(p, (1700000000 + i * 60, 1700000000 + i * 60))


def test_speed_view_two_streams_then_reconcile(spark):
    upsert = _mod("streaming.upsert")

    with tempfile.TemporaryDirectory() as tmp:
        # --- stock stream: 2 micro-batches of quotes; latest quote per day
        # wins (K4). Day d2 is revised by batch 2.
        _write_batches(
            f"{tmp}/stock",
            [
                [
                    '{"d":"2024-01-01","ts":"2024-01-01T10:00:00","close_v":10.0}',
                    '{"d":"2024-01-02","ts":"2024-01-02T10:00:00","close_v":20.0}',
                ],
                [
                    '{"d":"2024-01-02","ts":"2024-01-02T16:00:00","close_v":22.0}',
                    '{"d":"2024-01-03","ts":"2024-01-03T10:00:00","close_v":30.0}',
                ],
            ],
        )
        # --- news stream: 2 micro-batches of scored articles (K5 state)
        _write_batches(
            f"{tmp}/news",
            [
                ['{"d":"2024-01-01","score":4}', '{"d":"2024-01-01","score":6}'],
                ['{"d":"2024-01-01","score":2}', '{"d":"2024-01-03","score":9}'],
            ],
        )

        view = upsert.KeyedParquetView(spark, f"{tmp}/speed_view", ["d"])

        # stock half: per-day latest close within the batch, column-half merge
        def stock_fn(batch_df, batch_id):
            daily = batch_df.groupBy("d").agg(
                F.max_by("close_v", "ts").alias("close_v")
            )
            view.merge_column_halves(daily, ["close_v"], batch_id=batch_id, writer="stock")

        stock_q = (
            spark.readStream.schema(STOCK_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(f"{tmp}/stock")
            .writeStream.foreachBatch(stock_fn)
            .option("checkpointLocation", f"{tmp}/ckpt_stock")
            .trigger(availableNow=True)
            .start()
        )
        stock_q.awaitTermination()

        # sentiment half: per-day (sum, count) state, incremental-mean merge.
        # Its own batch ids start at 0 again — the per-writer replay
        # watermark must not treat them as replays of the stock stream.
        def news_fn(batch_df, batch_id):
            state = batch_df.groupBy("d").agg(
                F.sum("score").alias("sum_v"), F.count(F.lit(1)).alias("cnt_v")
            )
            view.merge_incremental_mean(state, batch_id=batch_id, writer="news")

        news_q = (
            spark.readStream.schema(NEWS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(f"{tmp}/news")
            .writeStream.foreachBatch(news_fn)
            .option("checkpointLocation", f"{tmp}/ckpt_news")
            .trigger(availableNow=True)
            .start()
        )
        news_q.awaitTermination()

        rows = {r["d"]: r for r in view.read().collect()}
        # stock half: latest close per day across batches
        assert rows["2024-01-01"]["close_v"] == 10.0
        assert rows["2024-01-02"]["close_v"] == 22.0
        assert rows["2024-01-03"]["close_v"] == 30.0
        # sentiment half: correct arithmetic mean across batches, stock
        # fields preserved through the mean merges (and vice versa)
        assert rows["2024-01-01"]["sum_v"] == 12 and rows["2024-01-01"]["cnt_v"] == 3
        assert rows["2024-01-01"]["mean_v"] == 4.0
        assert rows["2024-01-03"]["mean_v"] == 9.0
        # no news on d2: its partition was never touched by a news batch, so
        # it carries no sentiment state at all (null, undefined mean) — the
        # partition-pruned merge never rewrites untouched days
        assert rows["2024-01-02"]["cnt_v"] is None
        assert rows["2024-01-02"]["mean_v"] is None

        # --- T7 serving reconciliation: batch view owns days < as_of,
        # speed view owns the live day
        batch_view = spark.createDataFrame(
            [("2024-01-01", 10.0), ("2024-01-02", 22.5)],  # batch recompute revised d2
            "d string, close_v double",
        )
        speed = view.read().select("d", "close_v")
        as_of = "2024-01-03"
        serving = batch_view.filter(F.col("d") < as_of).unionByName(
            speed.filter(F.col("d") >= as_of)
        )
        got = {r["d"]: r["close_v"] for r in serving.collect()}
        assert got == {"2024-01-01": 10.0, "2024-01-02": 22.5, "2024-01-03": 30.0}


def test_k8_json_encode_parse_roundtrip(spark):
    ingest = _mod("streaming.ingest")

    df = spark.createDataFrame(
        [("2024-01-01", 12.5, 7), ("2024-01-02", None, 8)],
        "Date string, Close double, Volume long",
    )
    encoded = ingest.encode_json_value(df)
    assert encoded.columns == ["value"]
    schema = T.StructType(
        [
            T.StructField("Date", T.StringType()),
            T.StructField("Close", T.DoubleType()),
            T.StructField("Volume", T.LongType()),
        ]
    )
    back = ingest.parse_json_value(encoded, schema)
    assert sorted(back.collect()) == sorted(df.collect())


def test_streaming_corpus_filter_matches_batch_pipeline(spark, sf_dir):
    """pipe1 under streaming: documents arrive in two micro-batches; each
    batch is gated (lang confidence, quality, repetition, length) and
    merged keep-first by content hash into a view. The final view must
    equal the one-shot batch corpus filter (canonical = min doc_id, which
    keep-first reproduces because chunks arrive in doc_id order)."""
    import tempfile as tf

    from pyspark.sql import functions as F

    from importlib import import_module

    PKGP = "a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark"
    sources = import_module(f"{PKGP}.sources.batch")
    tx = import_module(f"{PKGP}.ext.text")
    dd = import_module(f"{PKGP}.ext.dedup")
    upsert = import_module(f"{PKGP}.streaming.upsert")
    registry = import_module(f"{PKGP}.plans.registry")

    docs = sources.load_table(spark, sf_dir, "documents")

    def gated(df):
        toks = tx.tokens(F.col("text"))
        staged = df.select(
            "doc_id", "lang", "text", toks.alias("_toks")
        )
        t = F.col("_toks")
        tri = tx.word_trigrams(t)
        n_tri = F.size(tri)
        return staged.select(
            "doc_id",
            "lang",
            F.md5(dd.norm_text(F.col("text"))).alias("content_hash"),
            tx.lang_id(F.col("text"), toks=t).alias("lang_pred"),
            tx.quality_score(F.col("text"), toks=t).alias("quality"),
            F.size(t).cast("int").alias("n_ws_tokens"),
            F.try_divide(
                (n_tri - F.size(F.array_distinct(tri))).cast("double"),
                n_tri.cast("double"),
            ).alias("rep_ratio"),
        ).filter(
            (F.col("lang_pred") == F.col("lang"))
            & (F.col("quality") >= 0.5)
            & (F.col("rep_ratio").isNull() | (F.col("rep_ratio") <= 0.2))
            & (F.col("n_ws_tokens") >= 5)
        ).select("doc_id", "lang", "content_hash", "n_ws_tokens", "rep_ratio")

    with tf.TemporaryDirectory() as tmp:
        # two chunks in doc_id order -> first arrival == min doc_id
        docs.filter("doc_id < 250").write.parquet(f"{tmp}/src/chunk=a")
        docs.filter("doc_id >= 250").write.parquet(f"{tmp}/src/chunk=b")
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(f"{tmp}/src")
        )
        # content-hash key is high-cardinality: opt out of per-key
        # partitioning (partition_by=None -> whole-view rewrite)
        view = upsert.KeyedParquetView(
            spark, f"{tmp}/corpus", ["content_hash"], partition_by=None
        )

        def sink(batch_df, batch_id):
            keep_first = gated(batch_df).withColumn(
                "_order", -F.col("doc_id")
            )
            view.merge_overwrite_by_key(keep_first, "_order", batch_id=batch_id)

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["doc_id"], r["lang"], r["n_ws_tokens"])
            for r in view.read().select("doc_id", "lang", "n_ws_tokens").collect()
        }
    want = {
        (r["doc_id"], r["lang"], r["n_ws_tokens"])
        for r in registry.QUERIES["pipe1_corpus_filter"](spark, sf_dir).collect()
    }
    assert got == want and got
