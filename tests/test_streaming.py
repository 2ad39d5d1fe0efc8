"""Streaming-layer tests (SURVEY §5.3): micro-batch replay with
availableNow, keyed-upsert views, replay idempotence, windowed aggs, and
the cross-stream column-half merge (J2)."""

from __future__ import annotations

import pytest

import tempfile

from pyspark.sql import functions as F

PKG = "a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark"


def _mod(name):
    from importlib import import_module

    return import_module(f"{PKG}.{name}")


def test_multibatch_lww_view_matches_batch_answer(spark, sf_dir):
    """K1: stream events in 4 micro-batches through the LWW upsert sink;
    the final view must equal the one-shot batch LWW (A3)."""
    ingest = _mod("streaming.ingest")
    upsert = _mod("streaming.upsert")
    agg = _mod("operators.aggregate")
    sources = _mod("sources.batch")

    stream = ingest.events_stream(spark, sf_dir, n_chunks=4).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    with tempfile.TemporaryDirectory() as tmp:
        view = upsert.KeyedParquetView(spark, f"{tmp}/view", ["user_id"])
        q = (
            stream.writeStream.foreachBatch(upsert.foreach_batch_lww(view, "ts"))
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r["user_id"]: (r["event_id"], r["value"])
            for r in view.read().collect()
        }
    ev = sources.load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    want = {
        r["user_id"]: (r["event_id"], r["value"])
        for r in agg.last_write_wins(ev, "user_id", F.struct("ts", "event_id")).collect()
    }
    assert got == want


def test_upsert_replay_is_idempotent(spark):
    """Checkpoint-recovery replay: applying the same batch_id twice must not
    change the view (exactly-once effect)."""
    upsert = _mod("streaming.upsert")
    from pyspark.sql import Row

    with tempfile.TemporaryDirectory() as tmp:
        view = upsert.KeyedParquetView(spark, f"{tmp}/v", ["k"])
        b1 = spark.createDataFrame([Row(k="a", t=1, v=1.0), Row(k="b", t=1, v=2.0)])
        view.merge_overwrite_by_key(b1, "t", batch_id=0)
        v1 = view._pointer()["version"]
        view.merge_overwrite_by_key(b1, "t", batch_id=0)  # replay
        assert view._pointer()["version"] == v1
        b2 = spark.createDataFrame([Row(k="a", t=2, v=9.0)])
        view.merge_overwrite_by_key(b2, "t", batch_id=1)
        got = {r["k"]: r["v"] for r in view.read().collect()}
        assert got == {"a": 9.0, "b": 2.0}


def test_incremental_mean_view(spark):
    """K5 correct semantics through the view API: merged (sum,count) states
    give the arithmetic mean over all data."""
    upsert = _mod("streaming.upsert")
    from pyspark.sql import Row

    with tempfile.TemporaryDirectory() as tmp:
        view = upsert.KeyedParquetView(spark, f"{tmp}/v", ["k"])
        s1 = spark.createDataFrame([Row(k="x", sum_v=10, cnt_v=2)])
        s2 = spark.createDataFrame([Row(k="x", sum_v=20, cnt_v=3)])
        view.merge_incremental_mean(s1, batch_id=0)
        view.merge_incremental_mean(s2, batch_id=1)
        (r,) = view.read().collect()
        assert r["sum_v"] == 30 and r["cnt_v"] == 5
        assert r["mean_v"] == 6.0


def test_cross_stream_column_half_merge(spark):
    """J2: stock half and sentiment half upserting the same keyed view
    (reference speed_view, yfConsumerStream + twitterConsumerStream)."""
    upsert = _mod("streaming.upsert")
    from pyspark.sql import Row

    with tempfile.TemporaryDirectory() as tmp:
        view = upsert.KeyedParquetView(spark, f"{tmp}/v", ["d"])
        stock = spark.createDataFrame(
            [("2024-01-01", 10.0, None, None)],
            "d string, close double, nbr bigint, pos double",
        )
        view.merge_column_halves(stock, ["close"], batch_id=0)
        senti = spark.createDataFrame([Row(d="2024-01-01", nbr=5, pos=0.5),
                                       Row(d="2024-01-02", nbr=1, pos=0.1)])
        view.merge_column_halves(senti, ["nbr", "pos"], batch_id=1)
        rows = {r["d"]: r for r in view.read().collect()}
        assert rows["2024-01-01"]["close"] == 10.0  # preserved from stock half
        assert rows["2024-01-01"]["nbr"] == 5 and rows["2024-01-01"]["pos"] == 0.5
        assert rows["2024-01-02"]["close"] is None  # inserted by sentiment only
        stock2 = spark.createDataFrame([Row(d="2024-01-01", close=11.0)])
        view.merge_column_halves(stock2, ["close"], batch_id=2)
        rows = {r["d"]: r for r in view.read().collect()}
        assert rows["2024-01-01"]["close"] == 11.0  # stock updated
        assert rows["2024-01-01"]["nbr"] == 5  # sentiment preserved


def test_streaming_tumbling_window_matches_batch(spark, sf_dir):
    """T5: windowed agg with watermark over the stream == batch window agg."""
    ingest = _mod("streaming.ingest")
    windows = _mod("streaming.windows")
    sources = _mod("sources.batch")

    stream = ingest.events_stream(spark, sf_dir, n_chunks=2)
    win = windows.tumbling(windows.with_watermark(stream, "ts", "1 hour"), "ts", "1 hour")
    with tempfile.TemporaryDirectory() as tmp:
        q = (
            win.writeStream.format("memory")
            .queryName("win_test")
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["window_start"], r["n_events"]) for r in spark.table("win_test").collect()
        }
    batch = windows.tumbling(sources.load_table(spark, sf_dir, "events"), "ts", "1 hour")
    want = {(r["window_start"], r["n_events"]) for r in batch.collect()}
    assert got == want


def test_watermark_drops_late_data(spark):
    """T5: an event older than watermark delay behind the max event time is
    dropped from windowed aggregation in append mode."""
    import os
    import tempfile as tf

    windows = _mod("streaming.windows")

    with tf.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        os.makedirs(src)
        # batch 1: events at 10:00-11:00; batch 2: a very late event at 08:00
        with open(f"{src}/b1.json", "w") as fh:
            fh.write(
                '{"ts": "2024-01-01T10:00:00", "value": 1.0}\n'
                '{"ts": "2024-01-01T11:30:00", "value": 2.0}\n'
            )
        from pyspark.sql import types as T

        schema = T.StructType(
            [T.StructField("ts", T.TimestampType()), T.StructField("value", T.DoubleType())]
        )
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
        )
        win = windows.tumbling(windows.with_watermark(stream, "ts", "30 minutes"), "ts", "1 hour")
        out = f"{tmp}/out"

        def run_once():
            q = (
                win.writeStream.format("parquet")
                .option("path", out)
                .outputMode("append")
                .option("checkpointLocation", f"{tmp}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        # late event arrives in a second run of the same query (new file)
        with open(f"{src}/b2.json", "w") as fh:
            fh.write('{"ts": "2024-01-01T08:00:00", "value": 99.0}\n')
        run_once()
        rows = spark.read.parquet(out).collect()
        hours = {r["window_start"].hour for r in rows}
        # the 08:00 window must have been discarded (watermark passed it);
        # the 10:00 window is final after watermark advanced beyond 11:00
        assert 8 not in hours
        assert 10 in hours


def test_state_expiry_closes_idle_sessions_across_batches(spark):
    """T14: event-time timeout fires for a key idle past the gap while an
    active key's state stays open — across genuine multiple micro-batches.

    Batch 1: users a and b active around 10:00. Batch 2 (hours later in
    event time): only b is active, advancing the watermark past a's
    last-activity + gap — a's session must be emitted by the timeout path
    and b's must not (it is still live in state)."""
    import os
    import tempfile as tf

    state = _mod("streaming.state")

    with tf.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        os.makedirs(src)
        with open(f"{src}/b1.json", "w") as fh:
            fh.write(
                '{"key": "a", "ts": "2024-01-01T10:00:00", "v": 3}\n'
                '{"key": "a", "ts": "2024-01-01T10:30:00", "v": 4}\n'
                '{"key": "b", "ts": "2024-01-01T10:00:00", "v": 5}\n'
            )
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("key", T.StringType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("v", T.LongType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
        )
        out = state.idle_session_close(
            stream.withWatermark("ts", "30 minutes"), gap_ms=3600 * 1000
        )
        sink_dir = f"{tmp}/out"

        def run_once():
            q = (
                out.writeStream.format("parquet")
                .option("path", sink_dir)
                .outputMode("append")
                .option("checkpointLocation", f"{tmp}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        # nothing can have closed yet: watermark is 10:30 - 30min = 10:00,
        # well before a's timeout at 11:30
        assert spark.read.parquet(sink_dir).count() == 0

        # batch 2: b alone, 6 hours later -> watermark 15:30 passes a's
        # timeout (11:30) but not b's new one (16:00 + 1h)
        with open(f"{src}/b2.json", "w") as fh:
            fh.write('{"key": "b", "ts": "2024-01-01T16:00:00", "v": 7}\n')
        run_once()
        rows = {r.key: (r.n, r.sum_v) for r in spark.read.parquet(sink_dir).collect()}
        assert rows == {"a": (2, 7)}


def test_streaming_dedup_within_watermark(spark):
    """S8 streaming form: dropDuplicates on id across micro-batches — the
    replayed article id must be emitted once."""
    import os
    import tempfile as tf

    from pyspark.sql import types as T

    with tf.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        os.makedirs(src)
        with open(f"{src}/b1.json", "w") as fh:
            fh.write('{"Id": "a1", "ts": "2024-01-01T10:00:00", "text": "x"}\n')
        with open(f"{src}/b2.json", "w") as fh:
            fh.write(
                '{"Id": "a1", "ts": "2024-01-01T10:05:00", "text": "x"}\n'
                '{"Id": "a2", "ts": "2024-01-01T10:06:00", "text": "y"}\n'
            )
        os.utime(f"{src}/b1.json", (1700000000, 1700000000))
        os.utime(f"{src}/b2.json", (1700000060, 1700000060))
        schema = T.StructType(
            [
                T.StructField("Id", T.StringType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("text", T.StringType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
        )
        deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["Id"])
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        ids = sorted(r["Id"] for r in spark.table("dedup_stream").collect())
        assert ids == ["a1", "a2"]


def test_k2_append_log_sink(spark, sf_dir):
    """K2: plain streaming append log to parquet — every input row lands
    exactly once, no keying."""
    import tempfile as tf

    ingest = _mod("streaming.ingest")
    sources = _mod("sources.batch")

    with tf.TemporaryDirectory() as tmp:
        stream = ingest.events_stream(spark, sf_dir, n_chunks=2).select(
            "event_id", "event_type"
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", f"{tmp}/log")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.read.parquet(f"{tmp}/log").count()
        want = sources.load_table(spark, sf_dir, "events").count()
        assert got == want


def test_partition_pruned_merge_leaves_untouched_files_alone(spark):
    """r2: a merge rewrites ONLY the partitions present in the incoming
    batch — every other partition's data files stay byte-identical on disk
    (cost O(touched), not O(view))."""
    import hashlib
    import os

    import tempfile as tf

    upsert = _mod("streaming.upsert")
    from pyspark.sql import Row

    def file_hashes(root):
        out = {}
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    with open(p, "rb") as fh:
                        out[os.path.relpath(p, root)] = hashlib.md5(fh.read()).hexdigest()
        return out

    with tf.TemporaryDirectory() as tmp:
        view = upsert.KeyedParquetView(spark, f"{tmp}/v", ["d"])
        b0 = spark.createDataFrame(
            [Row(d="2024-01-01", t=1, v=1.0), Row(d="2024-01-02", t=1, v=2.0),
             Row(d="2024-01-03", t=1, v=3.0)]
        )
        view.merge_overwrite_by_key(b0, "t", batch_id=0)
        before = file_hashes(f"{tmp}/v")
        assert before, "expected parquet files after first merge"

        # second merge touches ONLY 2024-01-02
        b1 = spark.createDataFrame([Row(d="2024-01-02", t=2, v=9.0)])
        view.merge_overwrite_by_key(b1, "t", batch_id=1)
        after = file_hashes(f"{tmp}/v")

        # every file from the first version still exists, byte-identical
        for relpath, digest in before.items():
            assert after.get(relpath) == digest, f"{relpath} was rewritten"
        # the new version dir contains only the touched partition
        v2_parts = {
            p for p in after if p.startswith("v=2" + os.sep)
        }
        assert v2_parts and all("d=2024-01-02" in p for p in v2_parts)

        # and the merged view is correct
        got = {r["d"]: (r["t"], r["v"]) for r in view.read().collect()}
        assert got == {
            "2024-01-01": (1, 1.0),
            "2024-01-02": (2, 9.0),
            "2024-01-03": (1, 3.0),
        }


def test_partition_pruned_halves_and_mean_merges(spark):
    """The column-half and incremental-mean strategies also go through the
    pruned path: untouched partitions survive with their other-half data."""
    import tempfile as tf

    upsert = _mod("streaming.upsert")
    from pyspark.sql import Row

    with tf.TemporaryDirectory() as tmp:
        view = upsert.KeyedParquetView(spark, f"{tmp}/v", ["d"])
        stock = spark.createDataFrame(
            [("2024-01-01", 10.0, None), ("2024-01-02", 20.0, None)],
            "d string, close double, nbr bigint",
        )
        view.merge_column_halves(stock, ["close"], batch_id=0)
        senti = spark.createDataFrame([Row(d="2024-01-01", nbr=5)])
        view.merge_column_halves(senti, ["nbr"], batch_id=1)
        rows = {r["d"]: r for r in view.read().collect()}
        assert rows["2024-01-01"]["close"] == 10.0 and rows["2024-01-01"]["nbr"] == 5
        assert rows["2024-01-02"]["close"] == 20.0 and rows["2024-01-02"]["nbr"] is None

    with tf.TemporaryDirectory() as tmp:
        view = upsert.KeyedParquetView(spark, f"{tmp}/v", ["k"])
        view.merge_incremental_mean(
            spark.createDataFrame([Row(k="x", sum_v=10, cnt_v=2), Row(k="y", sum_v=4, cnt_v=1)]),
            batch_id=0,
        )
        view.merge_incremental_mean(
            spark.createDataFrame([Row(k="x", sum_v=20, cnt_v=3)]), batch_id=1
        )
        got = {r["k"]: (r["sum_v"], r["cnt_v"], r["mean_v"]) for r in view.read().collect()}
        assert got == {"x": (30, 5, 6.0), "y": (4, 1, 4.0)}


def test_watermark_late_delta_vs_batch(spark):
    """T5 late-data contract, both sides: the same window builder evaluated
    in BATCH mode sees the late row (batch recomputation repairs it — the
    lambda architecture's reason to exist), while the STREAMING evaluation
    with a 30-minute watermark provably dropped it. The delta between the
    two evaluations is exactly the late row's window."""
    import os
    import tempfile as tf

    windows = _mod("streaming.windows")
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("value", T.DoubleType())]
    )
    with tf.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        os.makedirs(src)
        with open(f"{src}/b1.json", "w") as fh:
            fh.write(
                '{"ts": "2024-01-01T10:00:00", "value": 1.0}\n'
                '{"ts": "2024-01-01T11:30:00", "value": 2.0}\n'
            )
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
        win = windows.tumbling(
            windows.with_watermark(stream, "ts", "30 minutes"), "ts", "1 hour"
        )
        out = f"{tmp}/out"

        def run_once():
            q = (
                win.writeStream.format("parquet")
                .option("path", out)
                .outputMode("append")
                .option("checkpointLocation", f"{tmp}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        # watermark is now 11:00 (max 11:30 - 30m); this event is beyond it
        with open(f"{src}/b2.json", "w") as fh:
            fh.write('{"ts": "2024-01-01T08:00:00", "value": 99.0}\n')
        run_once()
        # advance the watermark past 12:00 so the 11:00 window finalizes —
        # a withheld-but-open window is NOT the same as a dropped one
        with open(f"{src}/b3.json", "w") as fh:
            fh.write('{"ts": "2024-01-01T13:00:00", "value": 3.0}\n')
        run_once()

        streamed = {
            r["window_start"].hour: r["sum_value"]
            for r in spark.read.parquet(out).collect()
        }
        batch_eval = {
            r["window_start"].hour: r["sum_value"]
            for r in windows.tumbling(
                spark.read.schema(schema).json(src), "ts", "1 hour"
            ).collect()
        }
        # batch sees the late 08:00 row; streaming dropped it for good
        assert batch_eval[8] == 99.0
        assert 8 not in streamed
        # the 11:00 window DID emit once the watermark passed it
        assert streamed[11] == batch_eval[11] == 2.0
        # the only gaps are the dropped late row and the still-open 13:00
        # window (its watermark hasn't passed yet)
        assert set(batch_eval) - set(streamed) == {8, 13}
        # windows both sides emitted agree exactly
        for h in set(batch_eval) & set(streamed):
            assert streamed[h] == batch_eval[h]


def test_view_crash_between_write_and_flip_is_invisible(spark):
    """Atomicity: a version directory written without a manifest flip (crash
    window) is invisible to readers, does not disturb the next merge, and
    is garbage-collected by vacuum()."""
    import os
    import tempfile as tf

    upsert = _mod("streaming.upsert")
    from pyspark.sql import Row

    with tf.TemporaryDirectory() as tmp:
        view = upsert.KeyedParquetView(spark, f"{tmp}/v", ["d"])
        view.merge_overwrite_by_key(
            spark.createDataFrame([Row(d="a", t=1, v=1.0)]), "t", batch_id=0
        )
        # simulate a crashed merge: v=2 written, manifest never flipped
        crashed = spark.createDataFrame([Row(d="a", t=9, v=99.0)])
        crashed.write.mode("overwrite").partitionBy("d").parquet(f"{tmp}/v/v=2")
        got = {r["d"]: r["v"] for r in view.read().collect()}
        assert got == {"a": 1.0}  # crashed write invisible

        # the next successful merge RECLAIMS v=2: mode("overwrite") purges
        # the orphaned contents before writing, and no reader can hold an
        # unflipped version, so reuse is safe
        view.merge_overwrite_by_key(
            spark.createDataFrame([Row(d="a", t=2, v=5.0)]), "t", batch_id=1
        )
        assert view._pointer()["version"] == 2
        got = {r["d"]: r["v"] for r in view.read().collect()}
        assert got == {"a": 5.0}  # crashed rows (v=99) fully purged

        # vacuum removes the superseded v=1; the reclaimed v=2 is current
        assert view.vacuum() == [1]
        assert os.path.exists(f"{tmp}/v/v=2")
        assert {r["d"]: r["v"] for r in view.read().collect()} == {"a": 5.0}


def test_streaming_session_window_matches_batch_closed_sessions(spark):
    """T5 session windows in TRUE streaming: replay two files through
    session_window + watermark in append mode; sessions the watermark has
    closed must match the batch evaluation exactly."""
    import os
    import tempfile as tf

    windows = _mod("streaming.windows")
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    with tf.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        os.makedirs(src)
        # user 1: two sessions (09:00-09:10, then 11:00); user 2: one
        with open(f"{src}/b1.json", "w") as fh:
            fh.write(
                '{"ts": "2024-01-01T09:00:00", "user_id": 1, "value": 1.0}\n'
                '{"ts": "2024-01-01T09:10:00", "user_id": 1, "value": 2.0}\n'
                '{"ts": "2024-01-01T09:05:00", "user_id": 2, "value": 5.0}\n'
            )
        with open(f"{src}/b2.json", "w") as fh:
            fh.write('{"ts": "2024-01-01T11:00:00", "user_id": 1, "value": 3.0}\n')
        os.utime(f"{src}/b1.json", (1700000000, 1700000000))
        os.utime(f"{src}/b2.json", (1700000060, 1700000060))
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
        win = windows.session(
            windows.with_watermark(stream, "ts", "10 minutes"), "ts", "30 minutes", "user_id"
        )
        q = (
            win.writeStream.format("memory")
            .queryName("sess_stream")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        streamed = {
            (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
            for r in spark.table("sess_stream").collect()
        }
        batch = {
            (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
            for r in windows.session(
                spark.read.schema(schema).json(src), "ts", "30 minutes", "user_id"
            ).collect()
        }
        # every emitted (closed) session matches batch exactly
        assert streamed <= batch
        # the two 09:xx sessions are closed by the 11:00 watermark advance
        closed = {b for b in batch if b[1].hour == 9}
        assert closed <= streamed


def test_view_time_travel_read_at(spark):
    """read_at(v) reconstructs the view as of any surviving version, per
    partition (Delta-style time travel, vacuum() shortens retention)."""
    import tempfile as tf

    upsert = _mod("streaming.upsert")
    from pyspark.sql import Row

    with tf.TemporaryDirectory() as tmp:
        view = upsert.KeyedParquetView(spark, f"{tmp}/v", ["d"])
        view.merge_overwrite_by_key(
            spark.createDataFrame([Row(d="a", t=1, v=1.0), Row(d="b", t=1, v=2.0)]),
            "t", batch_id=0,
        )
        view.merge_overwrite_by_key(
            spark.createDataFrame([Row(d="a", t=2, v=9.0)]), "t", batch_id=1
        )
        # as of v1: both days at their first values
        v1 = {r["d"]: r["v"] for r in view.read_at(1).collect()}
        assert v1 == {"a": 1.0, "b": 2.0}
        # as of v2 == current
        v2 = {r["d"]: r["v"] for r in view.read_at(2).collect()}
        assert v2 == {"a": 9.0, "b": 2.0}
        assert view.read_at(0) is None


def test_stateful_mean_survives_query_restart(spark):
    """T6 recovery: stop the stateful query, add data, restart from the
    same checkpoint — (sum, count) state must resume from the state store,
    not reset (the property the reference delegates to Elasticsearch)."""
    import os
    import tempfile as tf

    state = _mod("streaming.state")
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("key", T.StringType()), T.StructField("v", T.DoubleType())]
    )
    with tf.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        os.makedirs(src)
        with open(f"{src}/b1.json", "w") as fh:
            fh.write('{"key": "a", "v": 1.0}\n{"key": "a", "v": 3.0}\n')

        out = f"{tmp}/out"

        def run():
            # memory sink cannot recover from a checkpoint; foreachBatch
            # appending to parquet can
            def sink(batch_df, batch_id):
                batch_df.write.mode("append").parquet(out)

            stream = spark.readStream.schema(schema).json(src)
            q = (
                state.running_mean_stream(stream)
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", f"{tmp}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run()
        r1 = spark.read.parquet(out).collect()
        assert {(r["key"], r["n"], r["mean_v"]) for r in r1} == {("a", 2, 2.0)}

        # new file after shutdown; restart from the same checkpoint
        with open(f"{src}/b2.json", "w") as fh:
            fh.write('{"key": "a", "v": 8.0}\n{"key": "b", "v": 5.0}\n')
        run()
        rows = spark.read.parquet(out).collect()
        # final state per key = the row with the highest n
        final = {}
        for r in rows:
            if r["key"] not in final or r["n"] > final[r["key"]][0]:
                final[r["key"]] = (r["n"], r["sum_v"], r["mean_v"])
        # 'a' resumed (2 prior rows + 1 new), not reset to n=1
        assert final["a"] == (3, 12.0, 4.0)
        assert final["b"] == (1, 5.0, 5.0)


def test_view_compact_collapses_versions(spark):
    """compact() rewrites all live partitions into one version dir, drops
    history, preserves content exactly, and merges keep working after."""
    import os
    import tempfile as tf

    upsert = _mod("streaming.upsert")
    from pyspark.sql import Row

    with tf.TemporaryDirectory() as tmp:
        view = upsert.KeyedParquetView(spark, f"{tmp}/v", ["d"])
        for i, d in enumerate(["a", "b", "c"]):
            view.merge_overwrite_by_key(
                spark.createDataFrame([Row(d=d, t=1, v=float(i))]), "t", batch_id=i
            )
        before = {r["d"]: r["v"] for r in view.read().collect()}
        assert len({v for v in view._pointer()["parts"].values()}) == 3

        newv = view.compact()
        assert newv == 4
        # one owner version, old dirs gone, content identical
        assert set(view._pointer()["parts"].values()) == {4}
        assert sorted(os.listdir(f"{tmp}/v")) == ["_CURRENT", "v=4"]
        assert {r["d"]: r["v"] for r in view.read().collect()} == before

        # merges continue on top of the compacted view
        view.merge_overwrite_by_key(
            spark.createDataFrame([Row(d="b", t=2, v=9.0)]), "t", batch_id=3
        )
        after = {r["d"]: r["v"] for r in view.read().collect()}
        assert after == {**before, "b": 9.0}


def test_paced_producer_emits_kafka_shaped_payloads(spark):
    """S6/S7 analogue: a rate-paced producer loop emits JSON 'value'
    payloads at the trigger cadence; payloads parse back with the
    producer's schema (the K8 roundtrip)."""
    import time

    import tempfile as tf

    ingest = _mod("streaming.ingest")
    from pyspark.sql import types as T

    def payload(rate_df):
        return rate_df.select(
            F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias("Date"),
            (F.col("value") * 1.5).alias("Close"),
        )

    with tf.TemporaryDirectory() as tmp:
        q = ingest.paced_producer(
            spark, rows_per_second=50, payload_fn=payload,
            sink_path=f"{tmp}/out", checkpoint=f"{tmp}/ckpt",
            interval="500 milliseconds",
        )
        try:
            deadline = time.time() + 20
            rows = []
            while time.time() < deadline:
                time.sleep(1)
                try:
                    rows = spark.read.json(f"{tmp}/out").collect()
                except Exception:
                    rows = []
                if len(rows) >= 10:
                    break
        finally:
            q.stop()
        assert len(rows) >= 10  # the loop paced out real messages
        schema = T.StructType(
            [T.StructField("Date", T.StringType()),
             T.StructField("Close", T.DoubleType())]
        )
        parsed = ingest.parse_json_value(
            spark.createDataFrame([(r["value"],) for r in rows], "value string"),
            schema,
        ).collect()
        assert all(p["Date"] is not None and p["Close"] is not None for p in parsed)


def test_streaming_topk_multibatch_matches_batch(spark, sf_dir):
    """T6 top-k variant across multiple micro-batches: the retained O(k)
    state must converge to the batch top-3 per key."""
    ingest = _mod("streaming.ingest")
    state = _mod("streaming.state")
    sources = _mod("sources.batch")

    stream = ingest.events_stream(spark, sf_dir, n_chunks=3).select(
        F.col("user_id").cast("string").alias("key"),
        F.col("value").cast("double").alias("v"),
    )
    out = state.running_topk_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("topk_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    tblu = spark.table("topk_test")
    final = {
        r["key"]: (r["top1"], r["top2"], r["top3"])
        for r in (
            tblu.groupBy("key")
            .agg(F.max_by(F.struct("n", "top1", "top2", "top3"), "n").alias("s"))
            .select("key", "s.top1", "s.top2", "s.top3")
            .collect()
        )
    }
    ev = sources.load_table(spark, sf_dir, "events")
    want = {}
    for r in ev.select(F.col("user_id").cast("string").alias("k"), "value").collect():
        want.setdefault(r["k"], []).append(r["value"])
    for k, vs in want.items():
        top = sorted(vs, reverse=True)[:3]
        top += [None] * (3 - len(top))
        assert final[k] == tuple(top), k


def test_stream_stream_join_with_time_bounds(spark):
    """Stream-stream inner join (quotes x articles) with watermarks and an
    event-time range condition — the join Structured Streaming can run
    with bounded state (each side buffers only rows inside the watermark
    + range window). Result equals the batch join of the same data."""
    import os
    import tempfile as tf

    from pyspark.sql import types as T

    q_schema = T.StructType(
        [T.StructField("sym", T.StringType()),
         T.StructField("q_ts", T.TimestampType()),
         T.StructField("px", T.DoubleType())]
    )
    a_schema = T.StructType(
        [T.StructField("sym", T.StringType()),
         T.StructField("a_ts", T.TimestampType()),
         T.StructField("score", T.LongType())]
    )
    with tf.TemporaryDirectory() as tmp:
        os.makedirs(f"{tmp}/q")
        os.makedirs(f"{tmp}/a")
        with open(f"{tmp}/q/1.json", "w") as fh:
            fh.write(
                '{"sym": "X", "q_ts": "2024-01-01T10:00:00", "px": 10.0}\n'
                '{"sym": "X", "q_ts": "2024-01-01T12:00:00", "px": 11.0}\n'
                '{"sym": "Y", "q_ts": "2024-01-01T10:30:00", "px": 20.0}\n'
            )
        with open(f"{tmp}/a/1.json", "w") as fh:
            fh.write(
                '{"sym": "X", "a_ts": "2024-01-01T10:20:00", "score": 5}\n'
                '{"sym": "X", "a_ts": "2024-01-01T13:30:00", "score": 7}\n'
                '{"sym": "Y", "a_ts": "2024-01-01T09:45:00", "score": 9}\n'
            )
        quotes = (
            spark.readStream.schema(q_schema).json(f"{tmp}/q")
            .withWatermark("q_ts", "1 hour")
        )
        arts = (
            spark.readStream.schema(a_schema).json(f"{tmp}/a")
            .withWatermark("a_ts", "1 hour")
        )
        joined = quotes.join(
            arts,
            (quotes["sym"] == arts["sym"])
            & (arts["a_ts"] >= quotes["q_ts"] - F.expr("INTERVAL 1 HOUR"))
            & (arts["a_ts"] <= quotes["q_ts"] + F.expr("INTERVAL 1 HOUR")),
        ).select(quotes["sym"], "q_ts", "px", "a_ts", "score")
        q = (
            joined.writeStream.format("memory")
            .queryName("ssj")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {(r["sym"], r["px"], r["score"]) for r in spark.table("ssj").collect()}
    # batch truth: X@10 pairs with 10:20 article; Y@10:30 with 09:45;
    # X@12 pairs with neither (13:30 is 1.5h away); 13:30 article unmatched
    assert got == {("X", 10.0, 5), ("Y", 20.0, 9)}


def test_legacy_layout_migration_preserves_untouched_partitions(spark):
    """Regression: merging into a pre-partitioning view (manifest without
    'parts') with the default partition_by must migrate the WHOLE legacy
    view into the partitioned layout — not flip a manifest that only lists
    the batch-touched partitions, orphaning everything else (which a later
    vacuum would then delete permanently)."""
    upsert = _mod("streaming.upsert")
    from pyspark.sql import Row

    with tempfile.TemporaryDirectory() as tmp:
        # build a legacy (un-partitioned, whole-view) layout
        legacy = upsert.KeyedParquetView(spark, f"{tmp}/v", ["d"], partition_by=None)
        seed = spark.createDataFrame(
            [Row(d="2024-01-01", t=1, close=10.0),
             Row(d="2024-01-02", t=1, close=20.0),
             Row(d="2024-01-03", t=1, close=30.0)]
        )
        legacy.merge_overwrite_by_key(seed, "t", batch_id=0)
        assert "parts" not in legacy._pointer()

        # reopen with the r2+ default (partitioned) and touch ONE partition
        view = upsert.KeyedParquetView(spark, f"{tmp}/v", ["d"])
        batch = spark.createDataFrame([Row(d="2024-01-02", t=2, close=21.0)])
        view.merge_overwrite_by_key(batch, "t", batch_id=1)

        got = {r["d"]: r["close"] for r in view.read().collect()}
        assert got == {"2024-01-01": 10.0, "2024-01-02": 21.0, "2024-01-03": 30.0}
        # the migrated manifest owns every partition -> vacuum keeps them
        assert set(view._pointer()["parts"]) == {"2024-01-01", "2024-01-02", "2024-01-03"}
        view.vacuum()
        got = {r["d"]: r["close"] for r in view.read().collect()}
        assert got == {"2024-01-01": 10.0, "2024-01-02": 21.0, "2024-01-03": 30.0}


def test_null_partition_value_fails_fast(spark):
    """A batch row with a NULL partition key must raise — not be silently
    written to the Hive default partition and lost to every read."""
    import pytest

    upsert = _mod("streaming.upsert")
    from pyspark.sql import Row

    with tempfile.TemporaryDirectory() as tmp:
        view = upsert.KeyedParquetView(spark, f"{tmp}/v", ["d"])
        bad = spark.createDataFrame(
            [Row(d="2024-01-01", t=1, close=1.0), Row(d=None, t=1, close=2.0)]
        )
        with pytest.raises(ValueError, match="NULL 'd'"):
            view.merge_overwrite_by_key(bad, "t", batch_id=0)


def test_concurrent_writers_serialize_no_lost_half(spark):
    """The reference's J2 race (yfConsumerStream vs twitterConsumerStream
    painless scripts on one ES doc): two writers merging column halves into
    the SAME view concurrently. The writer lease serializes whole
    read-merge-flip cycles, so neither half is lost."""
    import threading

    upsert = _mod("streaming.upsert")
    from pyspark.sql import Row

    days = [f"2024-01-{i:02d}" for i in range(1, 6)]
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/v"
        errs = []

        def stock_writer():
            try:
                v = upsert.KeyedParquetView(spark, path, ["d"])
                for i, d in enumerate(days):
                    b = spark.createDataFrame([Row(d=d, close=float(10 + i))])
                    v.merge_column_halves(b, ["close"], batch_id=i, writer="stock")
            except Exception as e:  # surface thread failures in the assert
                errs.append(e)

        def senti_writer():
            try:
                v = upsert.KeyedParquetView(spark, path, ["d"])
                for i, d in enumerate(days):
                    b = spark.createDataFrame([Row(d=d, nbr=i + 1, pos=0.1 * (i + 1))])
                    v.merge_column_halves(b, ["nbr", "pos"], batch_id=i, writer="senti")
            except Exception as e:
                errs.append(e)

        t1 = threading.Thread(target=stock_writer)
        t2 = threading.Thread(target=senti_writer)
        t1.start(); t2.start(); t1.join(); t2.join()
        assert not errs, errs

        view = upsert.KeyedParquetView(spark, path, ["d"])
        rows = {r["d"]: r for r in view.read().collect()}
        assert set(rows) == set(days)
        for i, d in enumerate(days):  # both halves present on every row
            assert rows[d]["close"] == float(10 + i), d
            assert rows[d]["nbr"] == i + 1, d


def test_stale_lease_broken_and_reacquired(spark, tmp_path):
    """A crashed writer's stale lease must not block forever: the next
    writer breaks it (atomic rename-claim) and proceeds; a FRESH lease is
    honored until timeout."""
    import os
    import time as _time

    import pytest

    upsert = _mod("streaming.upsert")
    from pyspark.sql import Row

    path = str(tmp_path / "v")
    view = upsert.KeyedParquetView(spark, path, ["d"], lock_timeout=1.0, lock_stale=2.0)
    # simulate a crashed writer: lock file exists, made old
    os.makedirs(path, exist_ok=True)
    lf = os.path.join(path, "_LOCK")
    with open(lf, "w") as fh:
        fh.write("dead 0")
    old = _time.time() - 10
    os.utime(lf, (old, old))
    b = spark.createDataFrame([Row(d="2024-01-01", t=1, close=1.0)])
    view.merge_overwrite_by_key(b, "t", batch_id=0)  # breaks stale lease
    assert view.read().count() == 1
    assert not os.path.exists(lf)  # released cleanly

    # a FRESH lease blocks until timeout
    with open(lf, "w") as fh:
        fh.write("alive now")
    b2 = spark.createDataFrame([Row(d="2024-01-02", t=1, close=2.0)])
    with pytest.raises(TimeoutError):
        view.merge_overwrite_by_key(b2, "t", batch_id=1)
    os.unlink(lf)


def test_transform_with_state_user_stats(spark):
    """Spark 4 transformWithStateInPandas (streaming/state.py::
    user_stats_stream): per-key ValueState across micro-batches matches the
    batch aggregate. The state-server protocol needs google.protobuf —
    absent in this sandbox, so the test skips there (same dependency gate
    as the Kafka broker paths) but runs anywhere protobuf is installed."""
    import pytest

    pytest.importorskip("google.protobuf")
    import tempfile

    import pandas as pd

    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.streaming.state import (
        user_stats_stream,
    )
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    d = tempfile.mkdtemp(prefix="tws_")
    pd.DataFrame({"key": ["a", "a", "b"], "v": [1.0, 2.0, 5.0]}).to_parquet(
        f"{d}/p0.parquet"
    )
    pd.DataFrame({"key": ["a", "c"], "v": [4.0, 7.0]}).to_parquet(f"{d}/p1.parquet")
    schema = StructType(
        [StructField("key", StringType()), StructField("v", DoubleType())]
    )
    src = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = (
        user_stats_stream(src)
        .writeStream.format("memory")
        .queryName("tws_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        "SELECT key, max_by(struct(n, sum_v), n).* FROM tws_stats GROUP BY key"
    ).collect()
    got = {r[0]: (r[1], r[2]) for r in rows}
    assert got == {"a": (3, 7.0), "b": (1, 5.0), "c": (1, 7.0)}


def test_windowed_append_emits_only_finalized_windows(spark, tmp_path):
    """t15's determinism contract: with a zero-delay watermark and the
    single-batch replay, append mode emits exactly the windows whose end
    is at-or-before max event time; the still-open window is withheld."""
    import datetime as dt

    ingest = _mod("streaming.ingest")

    rows = []
    for day, n in [(1, 3), (2, 5)]:
        for i in range(n):
            rows.append(
                (i, dt.datetime(2024, 3, day, 10 + i), "click"),
            )
    rows.append((99, dt.datetime(2024, 3, 3, 6), "view"))  # opens day 3
    src = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    src.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    agg = (
        ingest.events_stream(spark, str(tmp_path), single_batch=True)
        .withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").cast("date").alias("d"), "event_type", "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t15_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(str(r["d"]), r["event_type"]): r["n"] for r in spark.table("t15_test").collect()}
    assert got == {("2024-03-01", "click"): 3, ("2024-03-02", "click"): 5}


def test_stream_stream_left_outer_join_emits_null_padded_rows(spark):
    """Stream-stream LEFT OUTER join: unmatched left rows must be emitted
    null-padded once the watermark passes their join window (the state
    eviction that makes outer stream joins bounded). maxFilesPerTrigger=1
    forces two micro-batches in one query: the second file carries
    far-future rows that advance the watermark past every batch-1 window,
    forcing the unmatched batch-1 quote out."""
    import os
    import tempfile as tf

    from pyspark.sql import types as T

    q_schema = T.StructType(
        [T.StructField("sym", T.StringType()),
         T.StructField("q_ts", T.TimestampType()),
         T.StructField("px", T.DoubleType())]
    )
    a_schema = T.StructType(
        [T.StructField("sym", T.StringType()),
         T.StructField("a_ts", T.TimestampType()),
         T.StructField("score", T.LongType())]
    )
    with tf.TemporaryDirectory() as tmp:
        os.makedirs(f"{tmp}/q")
        os.makedirs(f"{tmp}/a")
        with open(f"{tmp}/q/1.json", "w") as fh:
            fh.write(
                '{"sym": "X", "q_ts": "2024-01-01T10:00:00", "px": 10.0}\n'
                '{"sym": "Z", "q_ts": "2024-01-01T10:05:00", "px": 30.0}\n'
            )
        with open(f"{tmp}/a/1.json", "w") as fh:
            fh.write('{"sym": "X", "a_ts": "2024-01-01T10:20:00", "score": 5}\n')
        with open(f"{tmp}/q/2.json", "w") as fh:
            fh.write('{"sym": "W", "q_ts": "2024-01-02T10:00:00", "px": 1.0}\n')
        with open(f"{tmp}/a/2.json", "w") as fh:
            fh.write('{"sym": "W", "a_ts": "2024-01-02T09:00:00", "score": 1}\n')
        # pin file order so batch 1 = the *.1 files (oldest mtime first)
        now = 1_700_000_000
        for d, f, off in (("q", "1.json", 0), ("a", "1.json", 0),
                          ("q", "2.json", 60), ("a", "2.json", 60)):
            os.utime(f"{tmp}/{d}/{f}", (now + off, now + off))
        quotes = (
            spark.readStream.schema(q_schema)
            .option("maxFilesPerTrigger", 1)
            .json(f"{tmp}/q")
            .withWatermark("q_ts", "10 minutes")
        )
        arts = (
            spark.readStream.schema(a_schema)
            .option("maxFilesPerTrigger", 1)
            .json(f"{tmp}/a")
            .withWatermark("a_ts", "10 minutes")
        )
        joined = quotes.join(
            arts,
            (quotes["sym"] == arts["sym"])
            & (arts["a_ts"] >= quotes["q_ts"])
            & (arts["a_ts"] <= quotes["q_ts"] + F.expr("INTERVAL 30 MINUTES")),
            "leftOuter",
        ).select(quotes["sym"], "px", "score")
        q = (
            joined.writeStream.format("memory")
            .queryName("ssloj")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {(r["sym"], r["px"], r["score"]) for r in spark.table("ssloj").collect()}
    # X matched within its window; Z never matched -> emitted (Z, 30.0, None)
    # after the batch-2 watermark passed its window
    assert ("X", 10.0, 5) in got
    assert ("Z", 30.0, None) in got


def test_dedup_within_watermark_evicts_and_readmits(spark):
    """dropDuplicatesWithinWatermark semantics, both sides: a duplicate
    inside the horizon is suppressed, and once the watermark passes the
    key's event time + delay the state is EVICTED, so a later recurrence
    of the same key is emitted again. That re-admission is exactly what
    plain dropDuplicates (t13) never does — and why its state grows with
    every key ever seen while this one stays bounded by the horizon."""
    import os
    import tempfile as tf

    from pyspark.sql import types as T

    with tf.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        os.makedirs(src)
        # batch1: first sighting of k1 at 10:00
        with open(f"{src}/b1.json", "w") as fh:
            fh.write('{"Id": "k1", "ts": "2024-01-01T10:00:00"}\n')
        # batch2: duplicate inside the 10-minute horizon (suppressed) plus
        # a filler event that drags the watermark to 10:20 > 10:00+10m,
        # evicting k1's state
        with open(f"{src}/b2.json", "w") as fh:
            fh.write(
                '{"Id": "k1", "ts": "2024-01-01T10:05:00"}\n'
                '{"Id": "filler", "ts": "2024-01-01T10:30:00"}\n'
            )
        # batch3: filler only — state eviction runs at batch END against the
        # advanced watermark, so k1's expired state is removed here
        with open(f"{src}/b3.json", "w") as fh:
            fh.write('{"Id": "filler2", "ts": "2024-01-01T10:40:00"}\n')
        # batch4: k1 recurs at 10:35 (>= watermark, not late) -> re-emitted
        with open(f"{src}/b4.json", "w") as fh:
            fh.write('{"Id": "k1", "ts": "2024-01-01T10:35:00"}\n')
        for i, f in enumerate(["b1.json", "b2.json", "b3.json", "b4.json"]):
            os.utime(f"{src}/{f}", (1700000000 + 60 * i,) * 2)
        schema = T.StructType(
            [T.StructField("Id", T.StringType()), T.StructField("ts", T.TimestampType())]
        )
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(src)
        )
        deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
            ["Id"]
        )
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_wm_evict")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = sorted(
            (r["Id"], r["ts"].isoformat()) for r in spark.table("dedup_wm_evict").collect()
        )
        assert rows == [
            ("filler", "2024-01-01T10:30:00"),
            ("filler2", "2024-01-01T10:40:00"),
            ("k1", "2024-01-01T10:00:00"),
            ("k1", "2024-01-01T10:35:00"),
        ]


def test_t23_streamed_cms_matrix_equals_batch_build(spark, sf_dir, tmp_path):
    """CMS linearity end to end: a counter matrix maintained by
    chunked merge_custom additions (the t23 merge fn) must be
    CELL-IDENTICAL to a one-shot batch build over the same events — not
    just heavy-hitter-equal (the entry's oracle could mask a wrong cell
    that min() never selects; this pins the full state)."""
    from pyspark.sql import functions as F

    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.ext.hashing import (
        phash60,
    )
    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.plans import (
        registry,
    )
    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.sources.batch import (
        load_table,
    )
    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.streaming.upsert import (
        KeyedParquetView,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")

    def expand(df):
        proj = None
        for i in range(registry.CMS_D):
            p = df.select(
                "user_id",
                F.lit(i).alias("i"),
                (
                    phash60(F.col("user_id").cast("string"), seed=f"cms{i}")
                    % registry.CMS_W
                ).alias("col"),
            )
            proj = p if proj is None else proj.unionByName(p)
        return proj

    def fn(cur, b):
        delta = b.groupBy("i", "col").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        if cur is None:
            return delta
        return (
            cur.alias("v")
            .join(delta.alias("d"), ["i", "col"], "full_outer")
            .select(
                "i",
                "col",
                (
                    F.coalesce(F.col("v.c"), F.lit(0))
                    + F.coalesce(F.col("d.c"), F.lit(0))
                )
                .cast("bigint")
                .alias("c"),
            )
        )

    view = KeyedParquetView(spark, str(tmp_path / "mv"), ["i", "col"], partition_by="i")
    # 3 uneven chunks stand in for micro-batches
    for bid, pred in enumerate(
        [F.col("event_id") % 3 == 0, F.col("event_id") % 3 == 1, F.col("event_id") % 3 == 2]
    ):
        view.merge_custom(expand(ev.filter(pred)), fn, batch_id=bid, writer="cms")
    streamed = {
        (r["i"], r["col"]): r["c"] for r in view.read().collect()
    }
    batch = {
        (r["i"], r["col"]): r["c"]
        for r in expand(ev)
        .groupBy("i", "col")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .collect()
    }
    assert streamed == batch
    # total mass per matrix row == event count (linearity invariant)
    n = ev.count()
    for i in range(registry.CMS_D):
        assert sum(v for (ri, _), v in streamed.items() if ri == i) == n


def test_shallow_clone_is_zero_copy_and_isolated(spark, sf_dir, tmp_path):
    """The clone_to contract end to end: (1) the clone is metadata-only
    until written (no parquet under its path); (2) a merge into the
    clone leaves the source bit-identical; (3) the clone reads a MIXED
    manifest (its own new version dir + the source's shared history);
    (4) post-clone source writes are invisible to the clone;
    (5) compact() localizes the clone (drops the base pointer) and a
    re-clone of the compacted clone is then legal."""
    import json
    import os

    from pyspark.sql import functions as F

    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.sources.batch import (
        load_table,
    )
    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.streaming.upsert import (
        KeyedParquetView,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("event_id").alias("_ord"),
    )
    src = KeyedParquetView(spark, str(tmp_path / "src"), ["event_date"])
    src.merge_overwrite_by_key(daily, "_ord", batch_id=0)
    before = {(r["event_date"], r["n"]) for r in src.read().collect()}

    clone = src.clone_to(str(tmp_path / "fork"))
    # (1) zero-copy: manifest only, no data files under the clone
    files = [
        f for _, _, fs in os.walk(tmp_path / "fork") for f in fs if f.endswith(".parquet")
    ]
    assert files == []
    assert {(r["event_date"], r["n"]) for r in clone.read().collect()} == before

    # (2)+(3) merge into the clone: source unchanged, clone diverged.
    # The revision's _ord is STRICTLY greater than the stored rows' (+1):
    # max_by on an exact order tie is non-deterministic, so a tied revision
    # winning would be undefined behavior, not a contract (r8 advice).
    fix = (
        daily.filter(F.dayofmonth("event_date") <= 5)
        .withColumn("n", F.lit(0))
        .withColumn("_ord", F.col("_ord") + 1)
    )
    clone.merge_overwrite_by_key(fix, "_ord", batch_id=0, writer="fix")
    assert {(r["event_date"], r["n"]) for r in src.read().collect()} == before
    forked = {(r["event_date"], r["n"]) for r in clone.read().collect()}
    assert forked == {
        (d, 0 if d.day <= 5 else n) for d, n in before
    }

    # (4) post-clone source writes are invisible to the clone
    src.merge_overwrite_by_key(
        daily.withColumn("n", F.col("n") * 10).withColumn(
            "_ord", F.col("_ord") + 1
        ),
        "_ord",
        batch_id=1,
    )
    assert {(r["event_date"], r["n"]) for r in clone.read().collect()} == forked

    # (5) compact() localizes: base pointer dropped, re-clone now legal
    clone.compact()
    doc = json.load(open(tmp_path / "fork" / "_CURRENT"))
    assert "base" not in doc
    assert {(r["event_date"], r["n"]) for r in clone.read().collect()} == forked
    clone2 = clone.clone_to(str(tmp_path / "fork2"))
    assert {(r["event_date"], r["n"]) for r in clone2.read().collect()} == forked


def test_merge_that_empties_a_partition_deletes_it(spark, sf_dir, tmp_path):
    """A merge whose output for a touched partition is EMPTY must remove
    that partition from the manifest (the erasure/retention-delete
    case) — not point it at a fileless version dir that breaks reads;
    untouched partitions stay readable."""
    from pyspark.sql import functions as F

    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.streaming.upsert import (
        KeyedParquetView,
    )

    rows = spark.createDataFrame(
        [(0, 1, "a"), (0, 2, "b"), (1, 3, "c")], "b bigint, k bigint, v string"
    )
    view = KeyedParquetView(spark, str(tmp_path / "mv"), ["b", "k"], partition_by="b")
    view.merge_overwrite_by_key(rows.withColumn("_o", F.col("k")), "_o", batch_id=0)

    def wipe(cur, batch):  # delete every row of the touched partition
        return (cur if cur is not None else batch).limit(0)

    view.merge_custom(
        spark.createDataFrame([(0,)], "b bigint"), wipe, batch_id=0, writer="w"
    )
    got = {(r["b"], r["k"]) for r in view.read().collect()}
    assert got == {(1, 3)}
    assert "0" not in view._pointer()["parts"]


def test_hive_escaped_partition_values_survive_merges(spark, tmp_path):
    """Partition values Spark Hive-escapes in directory names (':' in
    timestamp strings, '#', '%') must NOT be dropped from the manifest:
    empty-partition detection compares the manifest's RAW value against
    the version dir's ESCAPED listing, so a raw isdir() check misses the
    written dir and silently deletes a live partition on every merge that
    touches it (r8 advice — silent data loss). Also covers read_at's
    history scan, which walks the same dirs."""
    from pyspark.sql import functions as F

    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.streaming.upsert import (
        KeyedParquetView,
    )

    vals = ["2020-01-01 00:00:00", "a#b", "p%q", "plain"]
    rows = spark.createDataFrame(
        [(v, i, 10 + i) for i, v in enumerate(vals)], "hr string, k bigint, x bigint"
    )
    view = KeyedParquetView(spark, str(tmp_path / "mv"), ["hr", "k"], partition_by="hr")
    view.merge_overwrite_by_key(rows.withColumn("_o", F.col("k")), "_o", batch_id=0)
    # every escaped value is in the manifest (v1 wrote them all)
    assert set(view._pointer()["parts"]) == set(vals)

    # a second merge touching ONLY the escaped partitions must keep them
    # alive at the new version — the raw-isdir bug dropped them here
    upd = spark.createDataFrame(
        [(v, i, 100 + i) for i, v in enumerate(vals[:3])],
        "hr string, k bigint, x bigint",
    )
    view.merge_overwrite_by_key(upd.withColumn("_o", F.col("k") + 10), "_o", batch_id=1)
    parts = view._pointer()["parts"]
    assert set(parts) == set(vals)
    assert all(parts[v] == 2 for v in vals[:3]) and parts["plain"] == 1
    got = {(r["hr"], r["x"]) for r in view.read().collect()}
    assert got == {(v, 100 + i) for i, v in enumerate(vals[:3])} | {("plain", 13)}

    # time travel back across escaped dirs: version 1 state intact
    at1 = {(r["hr"], r["x"]) for r in view.read_at(1).collect()}
    assert at1 == {(v, 10 + i) for i, v in enumerate(vals)}

    # an emptying merge still deletes the escaped partition (not a false
    # keep): the listing-based check distinguishes written vs absent
    def wipe(cur, batch):
        return (cur if cur is not None else batch).limit(0)

    view.merge_custom(
        spark.createDataFrame([("a#b",)], "hr string"), wipe, batch_id=0, writer="w"
    )
    assert "a#b" not in view._pointer()["parts"]
    assert {r["hr"] for r in view.read().collect()} == set(vals) - {"a#b"}


def test_clone_to_refuses_existing_view(spark, tmp_path):
    """clone_to must not silently overwrite a destination that already has
    a _CURRENT manifest — doing so would orphan the pre-existing view's
    data (r8 advice)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.streaming.upsert import (
        KeyedParquetView,
    )

    rows = spark.createDataFrame([(1, 1, 1)], "b bigint, k bigint, x bigint")
    src = KeyedParquetView(spark, str(tmp_path / "src"), ["b", "k"], partition_by="b")
    src.merge_overwrite_by_key(rows.withColumn("_o", F.col("k")), "_o", batch_id=0)
    other = KeyedParquetView(spark, str(tmp_path / "dst"), ["b", "k"], partition_by="b")
    other.merge_overwrite_by_key(rows.withColumn("_o", F.col("k")), "_o", batch_id=0)
    with _pytest.raises(ValueError, match="refusing to clone"):
        src.clone_to(str(tmp_path / "dst"))
    # the existing view is untouched
    assert {r["x"] for r in other.read().collect()} == {1}


def test_streaming_substring_view_converges_to_batch(spark, sf_dir):
    """t30 (r11 item-8 stretch, engine side): a STREAMING substring-dedup
    view — documents arrive in 3 micro-batches; each batch appends its
    chunk fingerprints to a stored fp view and replace-by-pair merges
    substring_spans_delta's output into a spans view via merge_custom
    (writer lease + batch-id replay watermark). After the replay the
    spans view must equal substring_spans over the whole corpus — the
    t20/t22/t23/t25/t26/t27 convergence proof for the substring family.
    The empty-pair tombstone trick is load-bearing: an affected pair
    whose recomputed span set is empty still ships one null-span row so
    its partition is rewritten (else removed spans would linger)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    dedup = _mod("ext.dedup")
    upsert = _mod("streaming.upsert")

    docs = _mod("sources.batch").load_table(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        stage = os.path.join(tmp, "feed")
        docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(stage)
        store = upsert.KeyedParquetView(
            spark, os.path.join(tmp, "fps"), ["doc_id", "cidx"], partition_by="pb"
        )
        spans_v = upsert.KeyedParquetView(
            spark, os.path.join(tmp, "spans"), ["doc_a", "doc_b"], partition_by="pb"
        )
        FP_COLS = ["doc_id", "cidx", "n_toks", "pos0", "chunk_hash"]

        def sink(batch_df, batch_id):
            new_fps = dedup._chunk_fps(batch_df).persist()  # cache: released-in-fn
            cur_store = store.read()
            all_fps = (
                new_fps
                if cur_store is None
                else cur_store.select(*FP_COLS).unionByName(new_fps)
            )
            cur_spans = spans_v.read()
            vp = (
                None
                if cur_spans is None
                else cur_spans.select("doc_a", "doc_b").distinct()
            )
            affected, recomputed = dedup.substring_spans_delta(all_fps, new_fps, vp)
            batch = affected.join(
                recomputed, ["doc_a", "doc_b"], "left"
            ).withColumn("pb", F.pmod(F.xxhash64("doc_a", "doc_b"), F.lit(4)))

            def merge_spans(cur, b):
                real = b.filter(F.col("start_a").isNotNull()).select(
                    "doc_a", "doc_b", "start_a", "start_b",
                    "n_chunks", "span_toks", "pb",
                )
                if cur is None:
                    return real
                keep = cur.join(
                    b.select("doc_a", "doc_b").distinct(),
                    ["doc_a", "doc_b"],
                    "left_anti",
                )
                return keep.unionByName(real)

            spans_v.merge_custom(batch, merge_spans, batch_id=batch_id, writer="ssd")
            store.merge_custom(
                new_fps.withColumn("pb", F.pmod(F.xxhash64("doc_id"), F.lit(4))),
                lambda cur, b: b if cur is None else cur.unionByName(b),
                batch_id=batch_id,
                writer="fps",
            )
            affected.unpersist()
            new_fps.unpersist()

        q = (
            spark.readStream.schema(spark.read.parquet(stage).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        got = sorted(
            map(
                tuple,
                spans_v.read()
                .select("doc_a", "doc_b", "start_a", "start_b", "n_chunks", "span_toks")
                .collect(),
            )
        )
        want = sorted(map(tuple, dedup.substring_spans(docs).collect()))
        assert got == want and got, "streamed spans view != batch recompute"


@pytest.mark.soak
def test_streaming_semdedup_view_converges_to_frozen_batch(spark, sf_dir):
    """t31 (r12 verdict item 5, engine side): the streamed SemDeDup view
    — centroids frozen on the vec_id % 3 == 0 snapshot, embeddings
    replayed in 3 micro-batches, per-batch incremental_semantic_dedup
    deltas min/sum-merged into a keyed view — must equal the one-shot
    frozen-centroid batch construction over the whole corpus (empty
    store, whole corpus as one batch: the delta relation IS the full
    pair relation then). Engine-vs-engine twin of the entry's DuckDB
    oracle; proves micro-batch boundaries are invisible to the merge."""
    from pyspark.sql import functions as F

    sim = _mod("ext.similarity")
    registry = _mod("plans.registry")

    got = sorted(
        map(
            tuple,
            registry.QUERIES["t31_stream_semdedup_view"](spark, sf_dir).collect(),
        )
    )

    emb = _mod("sources.batch").load_table(spark, sf_dir, "embeddings")
    nz = emb.filter(sim._nonzero_vec("embedding"))
    cents = sim.train_kmeans_centroids(nz.filter(F.col("vec_id") % 3 == 0))
    cells = sim._sem_cells(nz, cents)
    rm = sim.incremental_semantic_dedup(cells.limit(0), emb, cents)
    want = sorted(
        map(
            tuple,
            cells.select("vec_id", "cid")
            .join(rm.select("vec_id", "dup_of", "n_dups"), "vec_id", "left")
            .select(
                F.col("vec_id").cast("bigint"),
                F.col("cid").cast("int"),
                F.when(F.col("dup_of").isNull(), 1).otherwise(0).cast("int"),
                F.col("dup_of").cast("bigint"),
                F.coalesce(F.col("n_dups"), F.lit(0)).cast("bigint"),
            )
            .collect(),
        )
    )
    assert got == want and got, "streamed semdedup view != frozen batch"


def test_streaming_semdedup_view_planted_min_merge(spark, tmp_path_factory):
    """t31 on a PLANTED corpus whose duplicate groups span all three
    range-thirds of the replay, pinning the cross-batch merge facts by
    value: dup_of is the GLOBAL min-id partner even when smaller-id
    partners arrive in different micro-batches than the victim (min
    merge), n_dups is the TOTAL smaller-id partner count accumulated
    across batches (sum merge), the group minimum stays kept, vectors
    orthogonal to everything stay kept with n_dups 0, and a zero-norm
    vector vanishes from the view entirely. Seeds: ids 9 and 12 are the
    only train-subset (%3==0) ids passing the km-sample hash gate, so
    the two planted directions are exactly the two frozen centroids."""
    from pyspark.sql import functions as F  # noqa: F401

    registry = _mod("plans.registry")
    d = [1.0, 1.0, 0.0, 0.0, 0.0, 0.0]
    e = [0.0, 0.0, 1.0, 1.0, 0.0, 0.0]
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0, 1.0, 0.0], 0),
        (2, d, 0), (5, d, 0), (9, d, 0), (16, d, 0),
        (4, e, 0), (12, e, 0), (17, e, 0),
        (7, [0.0, 0.0, 0.0, 0.0, 0.0, 1.0], 0),
        (14, [1.0, -1.0, 0.0, 0.0, 0.0, 0.0], 0),
        (10, [0.0] * 6, 0),  # zero-norm: dropped before any cosine
    ]
    tmp = str(tmp_path_factory.mktemp("t31planted"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(tmp + "/embeddings.parquet")

    out = {
        r.vec_id: (r.kept, r.dup_of, r.n_dups)
        for r in registry.QUERIES["t31_stream_semdedup_view"](spark, tmp).collect()
    }
    assert 10 not in out and len(out) == 10
    for vid in (0, 2, 4, 7, 14):
        assert out[vid] == (1, None, 0), f"vec {vid} must be kept"
    assert out[5] == (0, 2, 1)
    assert out[9] == (0, 2, 2)
    assert out[16] == (0, 2, 3)
    assert out[12] == (0, 4, 1)
    assert out[17] == (0, 4, 2)


@pytest.mark.soak
def test_streaming_semdedup_view_survives_checkpoint_restart(spark, tmp_path_factory):
    """t31 under failure (the t17 invariant applied to the newest view):
    the replay is stopped after two micro-batches and RESTARTED from the
    checkpoint with a third file arrived in the gap. The restarted query
    must (a) not re-merge the already-applied batches (batch-id
    watermark), (b) deliver the new file as a NEW batch id, and (c)
    still converge to the planted frozen-centroid facts — including a
    victim (vec 16) whose ENTIRE removal evidence (partners 2, 5, 9)
    arrives in the post-restart batch against pre-restart store state,
    and sum-merged n_dups crossing the restart boundary (vec 17:
    partner 4 pre-restart-stored, partner 12 likewise, evidence found
    post-restart)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    sim = _mod("ext.similarity")
    upsert = _mod("streaming.upsert")

    d = [1.0, 1.0, 0.0, 0.0, 0.0, 0.0]
    e = [0.0, 0.0, 1.0, 1.0, 0.0, 0.0]
    groups = [
        [(0, [0.0, 0.0, 0.0, 0.0, 1.0, 0.0], 0), (2, d, 0), (4, e, 0), (5, d, 0)],
        [(7, [0.0, 0.0, 0.0, 0.0, 0.0, 1.0], 0), (9, d, 0), (10, [0.0] * 6, 0),
         (12, e, 0)],
        [(14, [1.0, -1.0, 0.0, 0.0, 0.0, 0.0], 0), (16, d, 0), (17, e, 0)],
    ]
    schema = "vec_id long, embedding array<float>, label int"
    tmp = str(tmp_path_factory.mktemp("t31restart"))
    src = os.path.join(tmp, "feed")
    os.makedirs(src)

    def ship(i):
        stage = os.path.join(tmp, f"stage{i}")
        spark.createDataFrame(groups[i], schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        os.utime(dst, (1700000000 + i * 60, 1700000000 + i * 60))

    all_rows = [r for g in groups for r in g]
    full = spark.createDataFrame(all_rows, schema)
    cdir = os.path.join(tmp, "cents")
    sim.train_kmeans_centroids(
        full.filter(F.col("vec_id") % 3 == 0).filter(sim._nonzero_vec("embedding"))
    ).write.mode("overwrite").parquet(cdir)

    cells_v = upsert.KeyedParquetView(
        spark, os.path.join(tmp, "cells"), ["vec_id"], partition_by="pb"
    )
    rm_v = upsert.KeyedParquetView(
        spark, os.path.join(tmp, "rm"), ["vec_id"], partition_by="pb"
    )
    CELL_COLS = ["vec_id", "cid", "e", "nrm"]
    pb = F.pmod(F.xxhash64("vec_id"), F.lit(4))
    applied: list[int] = []

    def sink(batch_df, batch_id):
        applied.append(batch_id)
        cents = spark.read.parquet(cdir)
        new_cells = sim._sem_cells(
            batch_df.filter(sim._nonzero_vec("embedding")), cents
        ).persist()
        cur_cells = cells_v.read()
        stored = (
            new_cells.limit(0) if cur_cells is None else cur_cells.select(*CELL_COLS)
        )
        delta = sim.incremental_semantic_dedup(stored, batch_df, cents)

        def merge_rm(cur, b):
            bb = b.select("vec_id", "cid", "dup_of", "n_dups", "pb")
            if cur is None:
                return bb
            return (
                cur.alias("c")
                .join(bb.alias("d"), "vec_id", "full_outer")
                .select(
                    "vec_id",
                    F.coalesce(F.col("c.cid"), F.col("d.cid")).alias("cid"),
                    F.least(F.col("c.dup_of"), F.col("d.dup_of"))
                    .cast("bigint")
                    .alias("dup_of"),
                    (
                        F.coalesce(F.col("c.n_dups"), F.lit(0))
                        + F.coalesce(F.col("d.n_dups"), F.lit(0))
                    )
                    .cast("bigint")
                    .alias("n_dups"),
                    F.coalesce(F.col("c.pb"), F.col("d.pb")).alias("pb"),
                )
            )

        rm_v.merge_custom(
            delta.withColumn("pb", pb), merge_rm, batch_id=batch_id, writer="rm"
        )
        cells_v.merge_custom(
            new_cells.withColumn("pb", pb),
            lambda cur, b: b if cur is None else cur.unionByName(b),
            batch_id=batch_id,
            writer="cells",
        )
        new_cells.unpersist()

    def run():
        q = (
            spark.readStream.schema(full.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    ship(0)
    ship(1)
    run()  # batches 0, 1 — then the "process dies"
    assert applied == [0, 1]
    assert rm_v.last_batch_id("rm") == 1 and cells_v.last_batch_id("cells") == 1
    mid = {r.vec_id: (r.dup_of, r.n_dups) for r in rm_v.read().collect()}
    assert mid[5] == (2, 1) and mid[9] == (2, 2) and mid[12] == (4, 1)

    ship(2)  # arrives while the query is down
    run()  # restart from the checkpoint
    assert applied == [0, 1, 2], "restart must deliver ONLY the new file"
    assert rm_v.last_batch_id("rm") == 2

    out = {
        r.vec_id: (r.dup_of, r.n_dups)
        for r in cells_v.read()
        .select("vec_id")
        .join(rm_v.read().select("vec_id", "dup_of", "n_dups"), "vec_id", "left")
        .collect()
    }
    assert 10 not in out and len(out) == 10
    for vid in (0, 2, 4, 7, 14):
        assert out[vid] == (None, None)
    assert out[5] == (2, 1)
    assert out[9] == (2, 2)
    assert out[16] == (2, 3)
    assert out[12] == (4, 1)
    assert out[17] == (4, 2)


@pytest.mark.soak
def test_streaming_substring_view_survives_restart_with_gate_crossing(
    spark, tmp_path_factory
):
    """t30 under failure, with the family's hardest arm ACROSS the
    restart boundary: the replay stops after two micro-batches with
    shared-block spans already merged into the view (block in 7 docs,
    inside the 2..8 df gate); while the query is down a third file
    lands that pushes the block's document frequency to 11 — OVER the
    cap. The restarted query must (a) deliver only the new file
    (batch-id watermark on all three keyed views, including the ndocs
    store whose additive merge would double-count on a replay), and
    (b) retroactively ERASE every pre-restart block span between OLD
    doc pairs via the replace-by-pair tombstones, leaving exactly the
    unrelated duplicate pair — equal to the batch recompute over the
    full corpus."""
    import os
    import shutil

    from pyspark.sql import Row, functions as F

    dedup = _mod("ext.dedup")
    upsert = _mod("streaming.upsert")

    block = [f"lic{i}" for i in range(40)]
    other = [f"dup{i}" for i in range(50)]

    def doc(i, toks):
        return Row(doc_id=i, text=" ".join(toks), lang="en", source="s")

    groups = [
        [doc(i, block + [f"tail{i}x{j}" for j in range(5)]) for i in range(4)]
        + [doc(100, other), doc(101, other)],
        [doc(i, block + [f"tail{i}x{j}" for j in range(5)]) for i in range(4, 7)],
        # the crossing file, landing while the query is down: ndocs 7 -> 11
        [doc(i, block + [f"tail{i}x{j}" for j in range(5)]) for i in range(7, 11)],
    ]
    tmp = str(tmp_path_factory.mktemp("t30restart"))
    src = os.path.join(tmp, "feed")
    os.makedirs(src)
    sample = spark.createDataFrame(groups[0])

    def ship(i):
        stage = os.path.join(tmp, f"stage{i}")
        spark.createDataFrame(groups[i]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        os.utime(dst, (1700000000 + i * 60, 1700000000 + i * 60))

    fps_v = upsert.KeyedParquetView(
        spark, os.path.join(tmp, "fps"), ["doc_id", "cidx"], partition_by="pb"
    )
    nd_v = upsert.KeyedParquetView(
        spark, os.path.join(tmp, "nd"), ["chunk_hash"], partition_by="pb"
    )
    spans_v = upsert.KeyedParquetView(
        spark, os.path.join(tmp, "spans"), ["doc_a", "doc_b"], partition_by="pb"
    )
    FP_COLS = ["doc_id", "cidx", "n_toks", "pos0", "chunk_hash"]
    nd_pb = F.pmod(F.xxhash64("chunk_hash"), F.lit(4))
    applied: list[int] = []

    def sink(batch_df, batch_id):
        applied.append(batch_id)
        new_fps = dedup._chunk_fps(batch_df).persist()
        cur_store = fps_v.read()
        stored = None if cur_store is None else cur_store.select(*FP_COLS)
        all_fps = new_fps if stored is None else stored.unionByName(new_fps)
        delta = dedup.ndocs_delta(stored, new_fps).persist()
        cur_nd = nd_v.read()
        merged_nd = dedup.merged_ndocs(
            None if cur_nd is None else cur_nd.select("chunk_hash", "ndocs"), delta
        )
        cur_spans = spans_v.read()
        vp = (
            None
            if cur_spans is None
            else cur_spans.select("doc_a", "doc_b").distinct()
        )
        affected, recomputed = dedup.substring_spans_delta(
            all_fps, new_fps, vp, dfreq=merged_nd
        )
        batch = affected.join(
            recomputed, ["doc_a", "doc_b"], "left"
        ).withColumn("pb", F.pmod(F.xxhash64("doc_a", "doc_b"), F.lit(4)))

        def merge_spans(cur, b):
            real = b.filter(F.col("start_a").isNotNull()).select(
                "doc_a", "doc_b", "start_a", "start_b", "n_chunks", "span_toks", "pb"
            )
            if cur is None:
                return real
            keep = cur.join(
                b.select("doc_a", "doc_b").distinct(), ["doc_a", "doc_b"], "left_anti"
            )
            return keep.unionByName(real)

        spans_v.merge_custom(batch, merge_spans, batch_id=batch_id, writer="ssd")
        nd_v.merge_custom(
            delta.withColumn("pb", nd_pb),
            lambda cur, b: dedup.merge_ndocs(
                None if cur is None else cur.select("chunk_hash", "ndocs"),
                b.select("chunk_hash", "ndocs"),
            ).withColumn("pb", nd_pb),
            batch_id=batch_id,
            writer="nd",
        )
        fps_v.merge_custom(
            new_fps.withColumn("pb", F.pmod(F.xxhash64("doc_id"), F.lit(4))),
            lambda cur, b: b if cur is None else cur.unionByName(b),
            batch_id=batch_id,
            writer="fps",
        )
        affected.unpersist()
        delta.unpersist()
        new_fps.unpersist()

    def run():
        q = (
            spark.readStream.schema(sample.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    ship(0)
    ship(1)
    run()  # batches 0, 1 — then the "process dies"
    assert applied == [0, 1]
    assert nd_v.last_batch_id("nd") == 1 and spans_v.last_batch_id("ssd") == 1
    mid_pairs = {(r.doc_a, r.doc_b) for r in spans_v.read().collect()}
    assert (100, 101) in mid_pairs
    assert any(a < 7 and b < 7 for (a, b) in mid_pairs if (a, b) != (100, 101)), (
        "block spans must exist before the crossing"
    )
    # the ndocs store equals the corpus recompute at the failure point
    nd_mid = {r.chunk_hash: r.ndocs for r in nd_v.read().collect()}
    fps_mid = fps_v.read().select(*FP_COLS)
    want_mid = {
        r.chunk_hash: r.n
        for r in fps_mid.groupBy("chunk_hash")
        .agg(F.count_distinct("doc_id").alias("n"))
        .collect()
    }
    assert nd_mid == want_mid

    ship(2)  # the crossing file lands while the query is down
    run()  # restart from the checkpoint
    assert applied == [0, 1, 2], "restart must deliver ONLY the crossing file"
    assert nd_v.last_batch_id("nd") == 2

    got = sorted(
        map(
            tuple,
            spans_v.read()
            .select("doc_a", "doc_b", "start_a", "start_b", "n_chunks", "span_toks")
            .collect(),
        )
    )
    all_docs = spark.createDataFrame([r for g in groups for r in g])
    want = sorted(map(tuple, dedup.substring_spans(all_docs).collect()))
    assert got == want and got
    pairs_left = {(a, b) for (a, b, *_r) in got}
    assert pairs_left == {(100, 101)}, (
        "the crossing must have erased every pre-restart block span"
    )
