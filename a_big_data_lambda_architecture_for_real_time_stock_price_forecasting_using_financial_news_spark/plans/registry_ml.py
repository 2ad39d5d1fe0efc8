"""Cleaning + ML pipeline + forecasting (X4/X5, M1-M5).

Mechanically split from plans/registry.py (r12): entry bodies moved
verbatim, registration order preserved by the facade import sequence,
names unchanged."""

from __future__ import annotations

from ..plans.batch_pipeline import DEFAULT_AS_OF, build_batch_view, flagship, parse_props
from pyspark.sql import functions as F
from .registry_base import DEC, register, tbl

# ---------------------------------------------------------------------------
# X4/X5 + M1-M5: cleaning, ML pipeline, forecasting (SURVEY §2.3, §2.6)
# ---------------------------------------------------------------------------


@register(
    "x4_x5_text_clean",
    """
    SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text_clean
    FROM documents WHERE length(text) >= 10
    """,
)
def x4_x5_text_clean(spark, sf_dir):
    """X5 cleaning chain (reference batchPipeline.py:41-52) as pure Column
    expressions — URL/handle/emoji/symbol stripping + whitespace collapse +
    length gate. The fixture texts are already clean, so the oracle reduces
    to the whitespace+gate steps; dirty-input behavior is pinned by unit
    tests."""
    from ..functions.cleaning import clean_text

    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.withColumn("text_clean", clean_text("text"))
        .na.drop(subset=["text_clean"])
        .select("doc_id", "text_clean")
    )


@register(
    "m1_m4_news_pipeline",
    """
    WITH dated AS (
      SELECT doc_id, text,
             DATE '2024-01-01' + CAST(doc_id % 30 AS INTEGER) AS Date
      FROM documents WHERE length(text) >= 10
    ), scored AS (
      SELECT Date,
             len(string_split(text, ' ')) AS n,
             len(list_filter(string_split(text, ' '), w -> w IN ('fast','big'))) AS pos,
             len(list_filter(string_split(text, ' '), w -> w IN ('slow','small'))) AS neg
      FROM dated
    ), ratios AS (
      SELECT Date,
             CAST(CAST(pos AS DOUBLE) / n AS DECIMAL(18,12)) AS rp,
             CAST(CAST(neg AS DOUBLE) / n AS DECIMAL(18,12)) AS rn,
             CAST(CAST(n - pos - neg AS DOUBLE) / n AS DECIMAL(18,12)) AS rt
      FROM scored
    )
    SELECT Date, count(*) AS Nbr_article,
           CAST(sum(rp) AS DOUBLE) / count(*) AS Positive,
           CAST(sum(rn) AS DOUBLE) / count(*) AS Negative,
           CAST(sum(rt) AS DOUBLE) / count(*) AS Neutre
    FROM ratios GROUP BY Date
    """,
)
def m1_m4_news_pipeline(spark, sf_dir):
    """M1 CleanNews + M3 lexicon scorer + M2 AggNews chained as a
    pyspark.ml Pipeline (reference batchPipeline.py:151-160), decimal-stable
    daily means."""
    from .serving import run_news_pipeline

    return run_news_pipeline(spark, sf_dir)


@register(
    "m5_serving_forecast",
    """
    WITH daily AS (
      SELECT event_type AS series, CAST(ts AS DATE) AS day,
             CAST(arg_max(CAST(value AS DECIMAL(18,2)), ts) AS DOUBLE) AS close_v
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT series, count(*) AS n_days,
             arg_min(close_v, day) AS first_close,
             arg_max(close_v, day) AS last_close
      FROM daily GROUP BY 1
    )
    SELECT series, n_days, first_close, last_close,
           CASE WHEN n_days = 1 THEN last_close
                ELSE last_close + (last_close - first_close) / (n_days - 1)
           END AS pred_close
    FROM s
    """,
)
def m5_serving_forecast(spark, sf_dir):
    """M5: per-series grouped-map forecast (drift surrogate) — replaces the
    reference's driver-side toPandas + pickled SARIMAX
    (prediction.py:63-76)."""
    from .serving import run_serving_forecast

    return run_serving_forecast(spark, sf_dir)


@register(
    "f4_vwap",
    """
    SELECT event_type AS series, CAST(ts AS DATE) AS day,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))
                         * CAST(props->>'k' AS BIGINT)) AS DOUBLE)
                / CAST(sum(CAST(props->>'k' AS BIGINT)) AS DOUBLE) AS DOUBLE)
             AS vwap,
           CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS volume
    FROM events
    WHERE CAST(props->>'k' AS BIGINT) > 0
    GROUP BY 1, 2
    """,
)
def f4_vwap(spark, sf_dir):
    """Volume-weighted average price per (series, day) — THE quote-feed
    aggregate (k plays volume). Both sums exact (DECIMAL / BIGINT), one
    final double division: order-independent and engine-exact. Zero-volume
    rows are excluded up front so the division is total."""
    ev = parse_props(tbl(spark, sf_dir, "events")).filter(F.col("k") > 0)
    pv = F.col("value").cast(DEC) * F.col("k")
    return (
        ev.groupBy(
            F.col("event_type").alias("series"), F.to_date("ts").alias("day")
        )
        .agg(
            (F.sum(pv).cast("double") / F.sum("k").cast("double"))
            .cast("double")
            .alias("vwap"),
            F.sum("k").cast("bigint").alias("volume"),
        )
    )


@register(
    "t9_gap_fill",
    """
    WITH daily AS (
      SELECT event_type AS series, CAST(ts AS DATE) AS day,
             CAST(arg_max(CAST(value AS DECIMAL(18,2)), ts) AS DOUBLE) AS close_v
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), spine AS (
      SELECT series,
             CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM (SELECT series, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1)
    )
    SELECT s.series, s.day,
           last_value(daily.close_v IGNORE NULLS)
             OVER (PARTITION BY s.series ORDER BY s.day
                   ROWS UNBOUNDED PRECEDING) AS close_filled,
           CAST(CASE WHEN daily.close_v IS NULL THEN 1 ELSE 0 END AS INTEGER)
             AS was_gap
    FROM spine s LEFT JOIN daily ON daily.series = s.series AND daily.day = s.day
    """,
)
def t9_gap_fill(spark, sf_dir):
    """Calendar gap-fill + forward-fill: build the full day spine per
    series (sequence between min and max day), left-join the observed
    closes, carry the last observation forward with an ignore-nulls
    window. The op every daily view needs before a forecaster sees it
    (the reference's ES keyed view silently leaves holes). One window
    sort per series; the spine explode is O(days), never O(events)."""
    from pyspark.sql import Window

    ev = tbl(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        F.col("event_type").alias("series"), F.to_date("ts").alias("day")
    ).agg(
        F.max_by(F.col("value").cast(DEC), F.col("ts")).cast("double").alias("close_v")
    )
    spine = (
        daily.groupBy("series")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "series",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    joined = spine.join(daily, ["series", "day"], "left")
    w = Window.partitionBy("series").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "series",
        "day",
        F.last("close_v", ignorenulls=True).over(w).alias("close_filled"),
        F.when(F.col("close_v").isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("int")
        .alias("was_gap"),
    )


@register(
    "m9_holt_forecast",
    """
    WITH RECURSIVE daily AS (
      SELECT event_type AS series, CAST(ts AS DATE) AS day,
             CAST(arg_max(CAST(value AS DECIMAL(18,2)), ts) AS DOUBLE) AS close_v
      FROM events GROUP BY 1, 2
    ), ordered AS (
      SELECT series, close_v,
             row_number() OVER (PARTITION BY series ORDER BY day) AS rn
      FROM daily
    ), sizes AS (
      SELECT series, max(rn) AS t_max FROM ordered GROUP BY series
    ), rec AS (
      SELECT o1.series, 1 AS t, o1.close_v AS l, o2.close_v - o1.close_v AS b
      FROM ordered o1 JOIN ordered o2
        ON o1.series = o2.series AND o1.rn = 1 AND o2.rn = 2
      UNION ALL
      SELECT r.series, r.t + 1,
             0.5 * o.close_v + 0.5 * (r.l + r.b),
             0.5 * ((0.5 * o.close_v + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
      FROM rec r
      JOIN ordered o ON o.series = r.series AND o.rn = r.t + 1
      JOIN sizes s ON s.series = r.series
      WHERE r.t < s.t_max
    ), ser AS (
      SELECT o.series, s.t_max AS n_days,
             arg_min(o.close_v, o.rn) AS first_close,
             arg_max(o.close_v, o.rn) AS last_close
      FROM ordered o JOIN sizes s ON s.series = o.series
      GROUP BY o.series, s.t_max
    )
    SELECT ser.series, ser.n_days, ser.first_close, ser.last_close,
           CASE WHEN ser.n_days = 1 THEN ser.last_close
                ELSE fin.l + fin.b END AS pred_close
    FROM ser LEFT JOIN (
      SELECT r.series, r.l, r.b
      FROM rec r JOIN sizes s ON s.series = r.series AND r.t = s.t_max
    ) fin ON fin.series = ser.series
    """,
)
def m9_holt_forecast(spark, sf_dir):
    """M5 upgrade path: Holt linear-trend smoothing per series — a genuine
    iterative recursion through the ``applyInPandas`` grouped-map seam
    (state at step t depends on step t-1, unlike the closed-form drift).
    The oracle replays the recursion as a DuckDB RECURSIVE CTE stepping
    through the same float ops in the same order, so values match
    bit-for-bit. (A ``list_reduce`` fold would be the natural oracle, but
    DuckDB 1.0's lambda CSE caches stale accumulator subtrees across fold
    iterations — verified wrong on a 3-element fold — so the recursion is
    materialized row-by-row instead.)"""
    from ..ml.forecast import forecast_per_series, holt_forecast
    from .serving import daily_close_by_series

    daily = daily_close_by_series(spark, sf_dir)
    return forecast_per_series(daily, holt_forecast)


@register(
    "a4_pairwise_compat",
    """
    SELECT CAST(ts AS DATE) AS event_date,
           list_reduce(
             list(CAST(CAST(props->>'k' AS BIGINT) AS DOUBLE)
                  ORDER BY ts, CAST(props->>'k' AS BIGINT)),
             (a, b) -> (a + b) / 2.0) AS pairwise_avg,
           count(*) AS n
    FROM events WHERE event_type <> 'purchase'
    GROUP BY 1
    """,
)
def a4_pairwise_compat(spark, sf_dir):
    """A4 bug-compat mode: the reference's ES painless pairwise-average
    recurrence (twitterConsumerStream.py:100-106) as an event-time-ordered
    fold per day. The recurrence is order-DEPENDENT, but our fold pins a
    total order (ts, then value), so DuckDB's first-element-seeded
    list_reduce over the identically-ordered list reproduces it float-exact
    — the one formerly rows-only query now has a full value oracle."""
    from ..operators.aggregate import pairwise_mean_compat

    ev = parse_props(tbl(spark, sf_dir, "events")).withColumn(
        "event_date", F.to_date("ts")
    )
    return pairwise_mean_compat(
        ev.filter(F.col("event_type") != "purchase"), ["event_date"], "ts", "k"
    )


