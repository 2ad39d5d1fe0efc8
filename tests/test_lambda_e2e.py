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


def test_t17_convergence_survives_checkpoint_restart(spark):
    """The t17 Lambda invariant under failure: a multi-batch speed-layer
    replay stopped after two micro-batches and RESTARTED from the
    checkpoint must (a) not re-apply the already-merged batches, (b)
    process only the new ones, and (c) still converge to the one-shot
    batch recompute over the full feed."""
    import tempfile

    from importlib import import_module

    upsert = import_module(f"{PKG}.streaming.upsert")
    agg = import_module(f"{PKG}.operators.aggregate")

    SCHEMA = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    # 4 micro-batches; day 01-02 spans batches 0+1 (open in b0, close+high
    # in b1), day 01-03 spans batches 2+3 across the restart boundary —
    # overwrite-newest semantics would get high/turnover wrong, only the
    # algebraic state merge converges
    batches = [
        ['{"ts":"2024-01-02T10:00:00","value":10.0}',
         '{"ts":"2024-01-02T11:00:00","value":14.0}'],
        ['{"ts":"2024-01-02T15:00:00","value":12.0}'],
        ['{"ts":"2024-01-03T09:00:00","value":50.0}',
         '{"ts":"2024-01-03T10:00:00","value":30.0}'],
        ['{"ts":"2024-01-03T16:00:00","value":40.0}'],
    ]

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/stock"
        _write_batches(src, batches[:2])  # only the first two files exist
        view = upsert.KeyedParquetView(spark, f"{tmp}/speed_view", ["event_date"])
        applied: list[int] = []

        def sink(batch_df, batch_id):
            applied.append(batch_id)
            view.merge_daily_ohlc(
                upsert.daily_ohlc_state(batch_df), batch_id=batch_id, writer="stock"
            )

        def run():
            q = (
                spark.readStream.schema(SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .json(src)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", f"{tmp}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run()  # first run: batches 0, 1 — then the "process dies"
        assert applied == [0, 1]
        assert view.last_batch_id("stock") == 1

        # mid-state check: day 01-02 merged across two batches
        mid = {r["event_date"].isoformat(): r for r in view.read().collect()}
        assert float(mid["2024-01-02"]["high_v"]) == 14.0
        assert float(mid["2024-01-02"]["close_v"]) == 12.0
        assert mid["2024-01-02"]["n_trades"] == 3

        # restart: two more files arrive; the new query resumes from the
        # checkpoint and must deliver them as NEW batch ids, not replays
        for i, lines in enumerate(batches[2:], start=2):
            p = f"{src}/b{i}.json"
            with open(p, "w") as fh:
                fh.write("\n".join(lines) + "\n")
            import os as _os

            _os.utime(p, (1700000000 + i * 60, 1700000000 + i * 60))
        run()
        assert applied == [0, 1, 2, 3]

        # at-least-once channel: re-deliver an old batch id — the
        # per-writer watermark must make it a no-op
        replay = spark.createDataFrame(
            [("2024-01-03T23:00:00", 999.0)], "ts string, value double"
        ).select(F.col("ts").cast("timestamp"), "value")
        before = sorted(map(str, view.read().collect()))
        view.merge_daily_ohlc(
            upsert.daily_ohlc_state(replay), batch_id=3, writer="stock"
        )
        assert sorted(map(str, view.read().collect())) == before

        # convergence: view == one-shot batch recompute over the full feed
        full = spark.createDataFrame(
            [r for b in batches for r in
             [tuple(__import__("json").loads(x).values()) for x in b]],
            "ts string, value double",
        ).select(F.col("ts").cast("timestamp"), "value")
        want = {
            r["event_date"].isoformat(): r
            for r in agg.daily_ohlc(full).collect()
        }
        got = {r["event_date"].isoformat(): r for r in view.read().collect()}
        assert set(got) == set(want)
        for d in want:
            for col in ("open_v", "high_v", "low_v", "close_v", "n_trades", "turnover"):
                assert got[d][col] == want[d][col], (d, col, got[d][col], want[d][col])


def test_merge_ohlc_preserves_sentiment_half(spark):
    """J2 shape with the algebraic stock half: OHLC merges must not
    disturb sentiment state living in the same speed-view row, and a
    stock batch arriving before any stock state exists must insert."""
    from importlib import import_module

    upsert = import_module(f"{PKG}.streaming.upsert")

    cur = spark.createDataFrame(
        [("2024-01-02", 12, 3, 4.0)],
        "event_date string, sum_score bigint, nbr_article bigint, avg_score double",
    )
    batch = upsert.daily_ohlc_state(
        spark.createDataFrame(
            [("2024-01-02T10:00:00", 10.0), ("2024-01-02T15:00:00", 12.0)],
            "ts string, value double",
        ).select(F.col("ts").cast("timestamp"), "value")
    ).withColumn("event_date", F.col("event_date").cast("string"))
    merged = upsert.merge_ohlc_states(cur, batch, ["event_date"]).collect()
    assert len(merged) == 1
    row = merged[0]
    assert row["sum_score"] == 12 and row["avg_score"] == 4.0  # sentiment intact
    assert float(row["open_v"]) == 10.0 and float(row["close_v"]) == 12.0
    assert row["n_trades"] == 2
