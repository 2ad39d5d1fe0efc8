"""Reference surface: flagship batch view, P/F/X/A/J operator families, T7 reconciliation, TPC-H bench headliners.

Mechanically split from plans/registry.py (r12): entry bodies moved
verbatim, registration order preserved by the facade import sequence,
names unchanged."""

from __future__ import annotations

from ..operators.aggregate import daily_ohlc, daily_sentiment, last_write_wins
from ..plans.batch_pipeline import DEFAULT_AS_OF, build_batch_view, flagship, parse_props
from pyspark.sql import functions as F
from .registry_base import DEC, dec2dbl, register, tbl

# ---------------------------------------------------------------------------
# Flagship (§3.2): full batch-view pipeline
# ---------------------------------------------------------------------------

@register(
    "flagship_batch_view",
    f"""
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS event_date, ts, event_type,
             CAST(value AS DECIMAL(18,2)) AS price,
             CAST(props->>'k' AS BIGINT) AS k
      FROM events
    ), stock AS (
      SELECT event_date,
             arg_min(price, ts) AS open_v,
             max(price) AS high_v,
             min(price) AS low_v,
             arg_max(price, ts) AS close_v,
             count(*) AS n_trades,
             CAST(sum(price) AS DECIMAL(18,2)) AS turnover
      FROM ev WHERE event_type = 'purchase' GROUP BY 1
    ), senti AS (
      SELECT event_date AS news_date, count(*) AS nbr_article, avg(k) AS avg_score
      FROM ev WHERE event_type <> 'purchase' GROUP BY 1
    )
    SELECT s.event_date,
           CAST(s.open_v AS DOUBLE) AS open_v,
           CAST(s.high_v AS DOUBLE) AS high_v,
           CAST(s.low_v AS DOUBLE) AS low_v,
           CAST(s.close_v AS DOUBLE) AS close_v,
           s.n_trades,
           CAST(s.turnover AS DOUBLE) AS turnover,
           n.nbr_article, n.avg_score
    FROM stock s JOIN senti n ON s.event_date = n.news_date
    WHERE s.event_date <> DATE '{DEFAULT_AS_OF}'
    """,
)
def flagship_batch_view(spark, sf_dir):
    """Flagship (§3.2): full batch-view pipeline; DOUBLE at the boundary."""
    return dec2dbl(flagship(spark, sf_dir))


# ---------------------------------------------------------------------------
# P: projections / parse (SURVEY §2.3 P1-P6)
# ---------------------------------------------------------------------------


@register(
    "p1_p2_json_parse",
    "SELECT event_id, CAST(props->>'k' AS BIGINT) AS k FROM events",
)
def p1_p2_json_parse(spark, sf_dir):
    """P1 cast + P2 from_json/flatten (reference yfConsumer.py:33,47)."""
    ev = parse_props(tbl(spark, sf_dir, "events"))
    return ev.select("event_id", "k")


@register(
    "p3_p5_project_rename_cast",
    """
    SELECT l_orderkey AS order_key, l_linenumber AS line_no,
           CAST(l_quantity AS INTEGER) AS qty,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
    FROM lineitem
    """,
)
def p3_p5_project_rename_cast(spark, sf_dir):
    """P3 select-list + P5 withColumnRenamed + X2 cast
    (reference batchPipeline.py:129,164). The 2-decimal pin stays (X2
    semantics); the output rides DOUBLE (dec2dbl boundary rule)."""
    li = tbl(spark, sf_dir, "lineitem")
    return dec2dbl(
        li.withColumnRenamed("l_orderkey", "order_key")
        .withColumnRenamed("l_linenumber", "line_no")
        .select(
            "order_key",
            "line_no",
            F.col("l_quantity").cast("int").alias("qty"),
            F.col("l_extendedprice").cast(DEC).alias("price"),
        )
    )


@register(
    "p4_constant_columns",
    """
    SELECT DISTINCT CAST(ts AS DATE) AS event_date,
           0 AS nbr_article,
           CAST(0.33 AS DOUBLE) AS positive,
           CAST(0.33 AS DOUBLE) AS negative,
           CAST(0.33 AS DOUBLE) AS neutre
    FROM events
    """,
)
def p4_constant_columns(spark, sf_dir):
    """P4: the speed-view default row — lit() defaults per key
    (reference yfConsumerStream.py:49-53: Nbr_article=0, probs=0.33)."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.select(F.to_date("ts").alias("event_date"))
        .distinct()
        .withColumn("nbr_article", F.lit(0))
        .withColumn("positive", F.lit(0.33))
        .withColumn("negative", F.lit(0.33))
        .withColumn("neutre", F.lit(0.33))
    )


@register(
    "p6_dropna_short_text",
    "SELECT doc_id, text AS text_clean FROM documents WHERE length(text) >= 10",
)
def p6_dropna_short_text(spark, sf_dir):
    """X5 null-out (len<10 → null, reference batchPipeline.py:42-43) + P6
    dropna (batchPipeline.py:64)."""
    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.withColumn(
            "text_clean", F.when(F.length("text") >= 10, F.col("text"))
        )
        .na.drop(subset=["text_clean"])
        .select("doc_id", "text_clean")
    )


# ---------------------------------------------------------------------------
# F: filters (SURVEY §2.3 F1-F3)
# ---------------------------------------------------------------------------


@register(
    "f1_filter_exclude_today",
    f"""
    SELECT event_id, event_type FROM events
    WHERE CAST(ts AS DATE) <> DATE '{DEFAULT_AS_OF}'
    """,
)
def f1_filter_exclude_today(spark, sf_dir):
    """F1: ``Date != dateNow`` (reference batchPipeline.py:166-167), clock
    injected as as_of."""
    ev = tbl(spark, sf_dir, "events")
    return ev.filter(F.to_date("ts") != F.to_date(F.lit(DEFAULT_AS_OF))).select(
        "event_id", "event_type"
    )


@register(
    "f2_date_range_pushdown",
    """
    SELECT o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def f2_date_range_pushdown(spark, sf_dir):
    """F2: the serving layer's ES range query (reference prediction.py:37-47)
    as a Catalyst-pushed parquet range filter."""
    o = tbl(spark, sf_dir, "orders")
    return dec2dbl(
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        ).select("o_orderkey", "o_orderdate", F.col("o_totalprice").cast(DEC).alias("total"))
    )


@register(
    "f3_keyword_filter",
    """
    SELECT doc_id, text FROM documents
    WHERE contains(text, 'spark') AND NOT contains(text, 'slow')
    """,
)
def f3_keyword_filter(spark, sf_dir):
    """F3: keyword containment + negative containment — the tweet keep rule
    (reference twitterProducer.py:27: AAPL-keyword and not 'RT @')."""
    docs = tbl(spark, sf_dir, "documents")
    return docs.filter(
        F.col("text").contains("spark") & ~F.col("text").contains("slow")
    ).select("doc_id", "text")


# ---------------------------------------------------------------------------
# X: scalar expressions (SURVEY §2.3 X1-X3)
# ---------------------------------------------------------------------------


@register(
    "x1_x2_nested_access",
    """
    SELECT doc_id,
           string_split(text, ' ')[1] AS first_word,
           string_split(text, ' ')[-1] AS last_word,
           CAST(length(text) AS BIGINT) AS len_from_map
    FROM documents
    """,
)
def x1_x2_nested_access(spark, sf_dir):
    """X1: array-ordinal + struct-field + map-value access — the reference
    reads ``col('class')[0]['metadata']`` then ``map_values(...)[i]``
    (batchPipeline.py:80-82). Same access patterns over a synthesized
    nested column."""
    docs = tbl(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    nested = F.struct(
        words.alias("words"),
        F.create_map(F.lit("len"), F.length("text").cast("bigint")).alias("meta"),
    )
    d = docs.withColumn("ann", nested)
    return d.select(
        "doc_id",
        F.element_at(F.col("ann.words"), 1).alias("first_word"),
        F.element_at(F.col("ann.words"), -1).alias("last_word"),
        F.element_at(F.col("ann.meta"), "len").alias("len_from_map"),
    )


@register(
    "x3_date_format",
    """
    SELECT event_id, strftime(ts, '%Y-%m-%d') AS day_iso,
           strftime(ts, '%Y%m%d') AS day_compact,
           strftime(ts, '%H') AS hour_str
    FROM events
    """,
)
def x3_date_format(spark, sf_dir):
    """X3: producer-side strftime date normalization
    (reference yfProducer.py:25-31, twitterProducer.py:32)."""
    ev = tbl(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day_iso"),
        F.date_format("ts", "yyyyMMdd").alias("day_compact"),
        F.date_format("ts", "HH").alias("hour_str"),
    )


# ---------------------------------------------------------------------------
# A: aggregations (SURVEY §2.5)
# ---------------------------------------------------------------------------


@register(
    "a1_a2_daily_agg",
    """
    SELECT CAST(ts AS DATE) AS event_date,
           count(*) AS nbr_article,
           CAST(sum(1) AS BIGINT) AS nbr_article_sum_of_ones,
           avg(CAST(props->>'k' AS BIGINT)) AS avg_score
    FROM events WHERE event_type <> 'purchase'
    GROUP BY 1
    """,
)
def a1_a2_daily_agg(spark, sf_dir):
    """A1 groupBy().agg(sum, avg...) + A2 count-via-sum-of-ones
    (reference batchPipeline.py:79,87-91)."""
    ev = parse_props(tbl(spark, sf_dir, "events"))
    return daily_sentiment(ev.filter(F.col("event_type") != "purchase"))


@register(
    "a3_last_write_wins",
    """
    SELECT event_id, ts, user_id, event_type, value FROM (
      SELECT e.*, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events e
    ) WHERE rn = 1
    """,
)
def a3_last_write_wins(spark, sf_dir):
    """A3: keyed last-write-wins — the ES ``es.mapping.id=Date`` overwrite /
    painless stock-half upsert (reference yfConsumerStream.py:57-68), as one
    hash aggregation (max_by), no window sort."""
    ev = tbl(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    return last_write_wins(ev, "user_id", F.struct("ts", "event_id")).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@register(
    "a5_dedup_at_most_once",
    """
    SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts FROM (
      SELECT e.*, row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS rn
      FROM events e
    ) WHERE rn = 1
    """,
)
def a5_dedup_at_most_once(spark, sf_dir):
    """A5: at-most-once keep-first dedup (reference nytProducer.py:47-49
    last_id gate) — min_by per key."""
    ev = tbl(spark, sf_dir, "events")
    packed = F.struct("ts", "event_id")
    return ev.groupBy("user_id", "event_type").agg(
        F.min_by(F.col("event_id"), packed).alias("first_event_id"),
        F.min_by(F.col("ts"), packed).alias("first_ts"),
    )


# ---------------------------------------------------------------------------
# J: joins (SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "j1_broadcast_dim_join",
    """
    SELECT r.r_name, count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def j1_broadcast_dim_join(spark, sf_dir):
    """J1: inner equi-join with tiny dimension sides — explicitly broadcast
    (the reference's stock⋈sentiment join at batchPipeline.py:163 relies on
    Catalyst defaults)."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    return dec2dbl(
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast(DEC).alias("total_acctbal"),
        )
    )


@register(
    "j2_keyed_column_merge",
    f"""
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS event_date, ts, event_type,
             CAST(value AS DECIMAL(18,2)) AS price,
             CAST(props->>'k' AS BIGINT) AS k
      FROM events
    ), stock AS (
      SELECT event_date, arg_max(price, ts) AS close_v, count(*) AS n_trades
      FROM ev WHERE event_type = 'purchase' GROUP BY 1
    ), senti AS (
      SELECT event_date, count(*) AS nbr_article, avg(k) AS avg_score
      FROM ev WHERE event_type <> 'purchase' GROUP BY 1
    )
    SELECT COALESCE(s.event_date, n.event_date) AS event_date,
           CAST(s.close_v AS DOUBLE) AS close_v, s.n_trades,
           COALESCE(n.nbr_article, 0) AS nbr_article,
           COALESCE(n.avg_score, CAST(0.33 AS DOUBLE)) AS avg_score
    FROM stock s FULL OUTER JOIN senti n ON s.event_date = n.event_date
    """,
)
def j2_keyed_column_merge(spark, sf_dir):
    """J2/K4/K5: two streams upsert disjoint column-halves of the same keyed
    row (reference yfConsumerStream.py:57-87 + twitterConsumerStream.py:94-127,
    merged by ES doc id). Batch equivalent: full-outer join on the key with
    per-half defaults (reference defaults at yfConsumerStream.py:49-53)."""
    ev = parse_props(tbl(spark, sf_dir, "events"))
    p = F.col("value").cast(DEC)
    stock = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("event_date"))
        .agg(
            F.max_by(p, F.col("ts")).alias("close_v"),
            F.count(F.lit(1)).alias("n_trades"),
        )
    )
    senti = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy(F.to_date("ts").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("nbr_article"),
            F.avg("k").alias("avg_score"),
        )
    )
    s, n = stock.alias("s"), senti.alias("n")
    return dec2dbl(
        s.join(n, F.col("s.event_date") == F.col("n.event_date"), "full_outer").select(
            F.coalesce(F.col("s.event_date"), F.col("n.event_date")).alias("event_date"),
            F.col("s.close_v").alias("close_v"),
            F.col("s.n_trades").alias("n_trades"),
            F.coalesce(F.col("n.nbr_article"), F.lit(0).cast("bigint")).alias("nbr_article"),
            F.coalesce(F.col("n.avg_score"), F.lit(0.33)).alias("avg_score"),
        )
    )


# ---------------------------------------------------------------------------
# T7: lambda reconciliation (serving union of batch + speed views)
# ---------------------------------------------------------------------------


@register(
    "t7_lambda_reconciliation",
    f"""
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS event_date, ts, event_type,
             CAST(value AS DECIMAL(18,2)) AS price,
             CAST(props->>'k' AS BIGINT) AS k
      FROM events
    ), stock AS (
      SELECT event_date,
             arg_min(price, ts) AS open_v, max(price) AS high_v,
             min(price) AS low_v, arg_max(price, ts) AS close_v,
             count(*) AS n_trades, CAST(sum(price) AS DECIMAL(18,2)) AS turnover
      FROM ev WHERE event_type = 'purchase' GROUP BY 1
    ), senti AS (
      SELECT event_date AS news_date, count(*) AS nbr_article, avg(k) AS avg_score
      FROM ev WHERE event_type <> 'purchase' GROUP BY 1
    ), view AS (
      SELECT s.event_date,
             CAST(s.open_v AS DOUBLE) AS open_v,
             CAST(s.high_v AS DOUBLE) AS high_v,
             CAST(s.low_v AS DOUBLE) AS low_v,
             CAST(s.close_v AS DOUBLE) AS close_v,
             s.n_trades,
             CAST(s.turnover AS DOUBLE) AS turnover,
             n.nbr_article, n.avg_score
      FROM stock s JOIN senti n ON s.event_date = n.news_date
    )
    SELECT *, 'batch' AS layer FROM view
    WHERE event_date >= DATE '{DEFAULT_AS_OF}' - INTERVAL 8 DAY
      AND event_date < DATE '{DEFAULT_AS_OF}' - INTERVAL 2 DAY
    UNION ALL
    SELECT *, 'speed' AS layer FROM view
    WHERE event_date >= DATE '{DEFAULT_AS_OF}'
    """,
)
def t7_lambda_reconciliation(spark, sf_dir):
    """T7: the serving layer reads speed_view for today and batch_view for
    D-8..D-2 (reference prediction.py:37-60) — disjoint range selection
    UNION, batch never clobbers the live day (batchPipeline.py:166-167)."""
    ev = tbl(spark, sf_dir, "events")
    view = build_batch_view(ev, as_of="9999-12-31")  # full view, no live-day cut
    as_of = F.to_date(F.lit(DEFAULT_AS_OF))
    batch = view.filter(
        (F.col("event_date") >= F.date_sub(as_of, 8))
        & (F.col("event_date") < F.date_sub(as_of, 2))
    ).withColumn("layer", F.lit("batch"))
    speed = view.filter(F.col("event_date") >= as_of).withColumn("layer", F.lit("speed"))
    return dec2dbl(batch.unionAll(speed))


# ---------------------------------------------------------------------------
# TPC-H-flavored plan-quality queries (bench headliners)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           avg(CAST(l_quantity AS BIGINT)) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: wide scan → partial+final hash agg; everything stays
    in WholeStageCodegen, money in DECIMAL."""
    li = tbl(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast("decimal(4,2)")
    return dec2dbl(
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
            F.sum(price).cast(DEC).alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("decimal(18,4)").alias("sum_disc_price"),
            F.avg(F.col("l_quantity").cast("bigint")).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q5_regional_revenue",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q5_regional_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join; dims broadcast, fact-fact joins shuffle on
    keys, date filter pushed to the orders scan."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    l = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        l.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            l["l_orderkey"] == o["o_orderkey"],
        )
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("decimal(18,4)").cast("double").alias("revenue"))
    )


