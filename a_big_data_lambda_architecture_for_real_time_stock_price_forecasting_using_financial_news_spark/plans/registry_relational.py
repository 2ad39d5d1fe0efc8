"""Relational completeness + TPC-H supply shapes (Q2/Q11/Q20).

Mechanically split from plans/registry.py (r12): entry bodies moved
verbatim, registration order preserved by the facade import sequence,
names unchanged."""

from __future__ import annotations

from ..ext import text as _tx
from ..plans.batch_pipeline import DEFAULT_AS_OF, build_batch_view, flagship, parse_props
from ..session import prepare
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .registry_base import DEC, QUERIES, dec2dbl, register, tbl

# ---------------------------------------------------------------------------
# Relational completeness: operators the reference lacks but a full engine
# must serve (SURVEY §2.5 note: "no distinct-agg, grouping sets, window
# functions, sorts, limits, or set operations exist anywhere in the
# reference"). All Catalyst built-ins; oracles pin cross-engine semantics.
# ---------------------------------------------------------------------------


@register(
    "w1_window_functions",
    """
    SELECT event_id, user_id,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           lag(k, 1) OVER w AS prev_k,
           CAST(sum(k) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS k_sum3
    FROM (SELECT event_id, ts, user_id, CAST(props->>'k' AS BIGINT) AS k
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w1_window_functions(spark, sf_dir):
    """Analytic window functions (row_number / lag / moving frame sum) over
    the per-user event stream. Shuffles once on the partition key; the frame
    sum is integer-exact so it hash-matches the oracle."""
    from pyspark.sql import Window

    ev = parse_props(tbl(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.lag("k", 1).over(w).alias("prev_k"),
        F.sum("k").over(w.rowsBetween(-2, 0)).cast("bigint").alias("k_sum3"),
    )


@register(
    "w2_ranking_functions",
    """
    SELECT event_id, user_id,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           percent_rank() OVER w AS prank
    FROM (SELECT event_id, user_id, CAST(props->>'k' AS BIGINT) AS k FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY k, event_id)
    """,
)
def w2_ranking_functions(spark, sf_dir):
    """Ranking battery (rank / dense_rank / ntile / percent_rank) per user
    ordered by score: one shuffle on the partition key, one sort, all four
    functions share the frame. percent_rank = (rank-1)/(n-1), a single
    int/int IEEE division — engine-exact."""
    from pyspark.sql import Window

    ev = parse_props(tbl(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("k", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "g2_pivot",
    f"""
    SELECT CAST(ts AS DATE) AS event_date,
           {", ".join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
                      for t in _EVENT_TYPES)}
    FROM events GROUP BY 1
    """,
)
def g2_pivot(spark, sf_dir):
    """PIVOT: daily counts spread into one column per event type. An
    explicit value list keeps it a single pass (no distinct-values
    pre-query) — at scale always pass the values; cells with no rows pin 0."""
    ev = tbl(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "event_date",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t) for t in _EVENT_TYPES],
    )


@register(
    "g3_unpivot",
    f"""
    WITH wide AS (
      SELECT CAST(ts AS DATE) AS event_date,
             {", ".join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
                        for t in _EVENT_TYPES)}
      FROM events GROUP BY 1
    )
    {" UNION ALL ".join(
        f"SELECT event_date, '{t}' AS event_type, CAST({t} AS BIGINT) AS n FROM wide"
        for t in _EVENT_TYPES)}
    """,
)
def g3_unpivot(spark, sf_dir):
    """UNPIVOT (melt) the pivoted daily counts back to long form via
    ``unpivot`` — the wide⇄long round-trip a feature store needs. Stays one
    narrow projection per row after the agg."""
    wide = QUERIES["g2_pivot"](spark, sf_dir)
    return wide.unpivot(
        "event_date", list(_EVENT_TYPES), "event_type", "n"
    ).select("event_date", "event_type", F.col("n").cast("bigint").alias("n"))


@register(
    "p7_malformed_json",
    """
    WITH raw AS (
      SELECT event_id,
             CASE WHEN event_id % 11 = 0 THEN '{oops'
                  ELSE CAST(props AS VARCHAR) END AS payload
      FROM events
    )
    SELECT event_id,
           CASE WHEN json_valid(payload)
                THEN CAST(payload->>'k' AS BIGINT) END AS k_parsed,
           CAST(CASE WHEN json_valid(payload) THEN 1 ELSE 0 END AS INTEGER)
             AS parse_ok
    FROM raw
    """,
)
def p7_malformed_json(spark, sf_dir):
    """P2 failure semantics: ``from_json`` is PERMISSIVE — a malformed
    payload fills the corrupt-record column and nulls the data fields,
    never failing the task (the reference's consumers would crash the
    stream on bad Kafka payloads). PERMISSIVE returns an all-null STRUCT,
    not a null struct, so failure detection must read the corrupt column,
    not ``isNull`` on the struct. Corruption is synthesized in-query
    (every 11th payload truncated) so the oracle sees identical input."""
    from pyspark.sql.types import StringType, StructField, StructType

    from ..schemas import EVENT_PROPS

    ev = tbl(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % 11 == 0, F.lit("{oops")
    ).otherwise(F.col("props").cast("string"))
    schema = StructType(
        list(EVENT_PROPS.fields) + [StructField("_corrupt", StringType())]
    )
    parsed = F.from_json(payload, schema, {"columnNameOfCorruptRecord": "_corrupt"})
    ok = parsed["_corrupt"].isNull()
    return ev.select(
        "event_id",
        F.when(ok, parsed["k"]).alias("k_parsed"),
        F.when(ok, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("parse_ok"),
    )


@register(
    "w3_range_frame",
    """
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(sum(CAST(props->>'k' AS BIGINT)) OVER w AS BIGINT) AS k_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(date_trunc('second', ts))
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def w3_range_frame(spark, sf_dir):
    """RANGE window frame over event time: per-user rolling 1-hour count
    and score sum — unlike ROW frames (w1), the frame bound is a VALUE
    distance on the ordering key, so ties (same second) all join the
    frame and the result is deterministic. Ordering on integer epoch
    seconds keeps both engines' range arithmetic identical."""
    from pyspark.sql import Window

    ev = parse_props(tbl(spark, sf_dir, "events"))
    sec = F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    w = Window.partitionBy("user_id").orderBy(sec.alias("sec")).rangeBetween(-3600, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_last_hour"),
        F.sum(F.col("k").cast("bigint")).over(w).cast("bigint").alias("k_last_hour"),
    )


@register(
    "g5_rollup_grouping_id",
    """
    SELECT event_type, CAST(ts AS DATE) AS event_date,
           CAST(GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE)) AS INTEGER)
             AS gid,
           count(*) AS n
    FROM events
    GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
    """,
)
def g5_rollup_grouping_id(spark, sf_dir):
    """grouping_id() over a rollup: distinguishes a genuinely-NULL group
    key from a subtotal/total row — the correctness nuance naive rollup
    consumers get wrong. Bit semantics (left key = high bit) agree across
    engines."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.col("ts").cast("date").alias("event_date"))
        .rollup("event_type", "event_date")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("event_type", "event_date", "gid", "n")
    )


@register(
    "g6_grouping_sets",
    """
    SELECT event_type, user_id,
           CAST(GROUPING(event_type) * 2 + GROUPING(user_id) AS INTEGER) AS gid,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type, user_id), (user_id), ())
    """,
)
def g6_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — the general form ROLLUP/CUBE (g1/g4) are
    sugar for, with a NON-hierarchical set list ((type,user), (user), ())
    neither could express. Catalyst expands the sets in ONE pass over the
    input (an Expand node, no re-scan per set); grouping_id disambiguates
    subtotal NULLs. DECIMAL keeps the money sums exact; DOUBLE rides out."""
    prepare(spark)
    tbl(spark, sf_dir, "events").createOrReplaceTempView("g6_events")
    return spark.sql(
        """
        SELECT event_type, user_id,
               CAST(GROUPING(event_type) * 2 + GROUPING(user_id) AS INTEGER)
                 AS gid,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM g6_events
        GROUP BY GROUPING SETS ((event_type, user_id), (user_id), ())
        """
    )


@register(
    "g1_rollup",
    """
    SELECT event_type, CAST(ts AS DATE) AS event_date,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
    """,
)
def g1_rollup(spark, sf_dir):
    """Hierarchical rollup (event_type -> date -> grand total): one pass,
    Catalyst expands the grouping sets; DECIMAL keeps totals exact."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("event_date"),
            F.col("value").cast(DEC).alias("v"),
        )
        .rollup("event_type", "event_date")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast(DEC).cast("double").alias("sum_value"),
        )
    )


@register(
    "g4_cube",
    """
    SELECT event_type, user_id % 10 AS user_bucket,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY CUBE (event_type, user_id % 10)
    """,
)
def g4_cube(spark, sf_dir):
    """CUBE over (event_type, user bucket): all four grouping sets in one
    pass (Catalyst expands then partially aggregates — the shuffle carries
    4x one row per (mapper, group), not 4 scans). Completes the
    grouping-sets family next to g1's ROLLUP."""
    ev = tbl(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            (F.col("user_id") % 10).alias("user_bucket"),
            F.col("value").cast(DEC).alias("v"),
        )
        .cube("event_type", "user_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast(DEC).cast("double").alias("sum_value"),
        )
    )


@register(
    "o1_sort_limit_topn",
    """
    SELECT o_orderkey, o_custkey, CAST(total AS DOUBLE) AS total FROM (
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS total
      FROM orders
      ORDER BY total DESC, o_orderkey
      LIMIT 100
    )
    """,
)
def o1_sort_limit_topn(spark, sf_dir):
    """Global top-N: Spark plans TakeOrderedAndProject (per-partition top-N
    then driver-side merge of N*partitions rows), never a full sort. Top-100
    membership is decided on the exact DECIMAL; the cast rides after."""
    o = tbl(spark, sf_dir, "orders")
    return dec2dbl(
        o.select(
            "o_orderkey", "o_custkey", F.col("o_totalprice").cast(DEC).alias("total")
        )
        .orderBy(F.desc("total"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "o2_limit_offset_page",
    """
    SELECT o_orderkey, o_custkey, CAST(total AS DOUBLE) AS total FROM (
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS total
      FROM orders
      ORDER BY total DESC, o_orderkey
      LIMIT 50 OFFSET 100
    )
    """,
)
def o2_limit_offset_page(spark, sf_dir):
    """Keyset-free pagination (page 3 of 50 under a total order): Spark
    plans LIMIT+OFFSET as a single TakeOrdered of offset+limit rows and
    drops the prefix on the driver — rows 1..100 never ship to one reducer
    as a global sort would. (Deep pages should switch to keyset pagination;
    this entry pins the operator, o1 the top-N form.) Page membership is
    decided on the exact DECIMAL; DOUBLE rides out."""
    prepare(spark)
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("o2_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, CAST(total AS DOUBLE) AS total FROM (
          SELECT o_orderkey, o_custkey,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS total
          FROM o2_orders
          ORDER BY total DESC, o_orderkey
          LIMIT 50 OFFSET 100
        )
        """
    )


@register(
    "u1_set_ops",
    """
    WITH buyers AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      WHERE CAST(o_totalprice AS DECIMAL(18,2)) > 150000
    ), recent AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      WHERE o_orderdate >= DATE '1997-01-01'
    )
    SELECT custkey, 'both' AS segment FROM (SELECT * FROM buyers INTERSECT SELECT * FROM recent)
    UNION ALL
    SELECT custkey, 'big_only' AS segment FROM (SELECT * FROM buyers EXCEPT SELECT * FROM recent)
    """,
)
def u1_set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT / UNION ALL over customer segments — planned as
    semi/anti hash joins on the distinct sets."""
    o = tbl(spark, sf_dir, "orders")
    buyers = (
        o.filter(F.col("o_totalprice").cast(DEC) > 150000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    recent = (
        o.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    both = buyers.intersect(recent).withColumn("segment", F.lit("both"))
    big_only = buyers.exceptAll(recent).withColumn("segment", F.lit("big_only"))
    return both.unionByName(big_only)


@register(
    "u2_union_distinct_except",
    """
    WITH a AS (SELECT event_type, user_id % 50 AS bucket FROM events
               WHERE event_type IN ('click', 'view')),
         b AS (SELECT event_type, user_id % 50 AS bucket FROM events
               WHERE event_type IN ('view', 'purchase'))
    SELECT event_type, bucket, 'union_d' AS op FROM (
      SELECT * FROM a UNION SELECT * FROM b)
    UNION ALL
    SELECT event_type, bucket, 'except_d' AS op FROM (
      SELECT DISTINCT * FROM a EXCEPT SELECT * FROM b)
    """,
)
def u2_union_distinct_except(spark, sf_dir):
    """UNION DISTINCT + set-EXCEPT (vs u1's EXCEPT ALL): the deduplicating
    set operators, planned as aggregate + anti join over the distinct
    sets. Completes the set-operation family."""
    ev = tbl(spark, sf_dir, "events")
    proj = lambda types: ev.filter(F.col("event_type").isin(*types)).select(
        "event_type", (F.col("user_id") % 50).alias("bucket")
    )
    a, b = proj(["click", "view"]), proj(["view", "purchase"])
    union_d = a.union(b).distinct().withColumn("op", F.lit("union_d"))
    except_d = a.distinct().exceptAll(b.distinct()).withColumn("op", F.lit("except_d"))
    return union_d.unionByName(except_d)


@register(
    "a6_distinct_agg",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def a6_distinct_agg(spark, sf_dir):
    """Distinct aggregation (exact count-distinct): Catalyst's two-phase
    expand + partial agg. approx_count_distinct is the 100 TB alternative
    when 2% error is acceptable."""
    ev = tbl(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey, CAST(revenue AS DOUBLE) AS revenue, order_date, o_orderpriority
    FROM (
      SELECT l_orderkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4))
               AS revenue,
             CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < DATE '1995-03-15'
        AND l_shipdate > DATE '1995-03-15'
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
      ORDER BY revenue DESC, order_date, l_orderkey
      LIMIT 10
    )
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dimension filters pushed to the scans, two
    equi-joins (customer side broadcast-eligible), agg, top-10."""
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    li = tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("date")
    )
    rev = (F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC)))
    return (
        F.broadcast(c)
        .join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.sum(rev).cast("decimal(38,4)").alias("revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("order_date"), F.asc("l_orderkey"))
        .limit(10)
        .transform(dec2dbl)
    )


@register(
    "j3_asof_join",
    """
    WITH quotes AS (
      SELECT user_id, ts,
             CAST(arg_max(CAST(value AS DECIMAL(18,2)), event_id) AS DECIMAL(18,2)) AS price
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ), lookups AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type <> 'purchase'
    )
    SELECT l.event_id, l.user_id, CAST(r.price AS DOUBLE) AS price
    FROM lookups l ASOF LEFT JOIN quotes r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def j3_asof_join(spark, sf_dir):
    """As-of join (operators/asof.py): every non-purchase event gets the
    most recent purchase price at-or-before its timestamp per user — one
    shuffle via the union-sort formulation, never a range join. Oracle is
    DuckDB's native ASOF JOIN."""
    from ..operators.asof import asof_join

    ev = tbl(spark, sf_dir, "events")
    quotes = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by(F.col("value").cast(DEC), F.col("event_id")).cast(DEC).alias("price"))
    )
    lookups = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(lookups, quotes, ["user_id"], "ts", ["price"])
    return dec2dbl(joined.select("event_id", "user_id", "price"))


@register(
    "x10_tfidf_top_terms",
    _tx.tfidf_top_terms_sql("documents", "doc_id", "text", k=3),
)
def x10_tfidf_top_terms(spark, sf_dir):
    """Top-3 tf-idf terms per document (ext/text.py:tfidf_top_terms).
    Integer-only output so libm ulp differences can't flap the oracle."""
    return _tx.tfidf_top_terms(tbl(spark, sf_dir, "documents"), "doc_id", "text", k=3)


@register(
    "q10_returned_revenue",
    """
    SELECT c_custkey, c_name, CAST(revenue AS DOUBLE) AS revenue, n_name
    FROM (
      SELECT c_custkey, c_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4))
               AS revenue,
             n_name
      FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20
    )
    """,
)
def q10_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer — a fact-to-dim
    join tree grouped on a HIGH-cardinality key (every customer), unlike
    Q1/Q5's few-group aggs. nation broadcasts; the lineitem filter
    (l_returnflag = 'R') is pushed to the scan so only ~25% of the fact
    table reaches the join."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))
    )
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("decimal(38,4)").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .transform(dec2dbl)
    )


@register(
    "q9_product_profit",
    """
    SELECT n_name, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit,
           count(*) AS n_lines
    FROM (
      SELECT n.n_name, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
             - CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(0.6 AS DECIMAL(3,1))
               * CAST(l.l_quantity AS DECIMAL(12,2)) AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    )
    GROUP BY n_name, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: product-line profit by supplier nation and year —
    a 5-way join tree with a LIKE gate on part name, where the cost term
    multiplies two DECIMAL measures per line. (The fixture has no
    partsupp, so supply cost is 0.6*p_retailprice — the join tree and
    exact-decimal profit arithmetic are the point.) Sum in DECIMAL,
    output DOUBLE."""
    p = tbl(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    o = tbl(spark, sf_dir, "orders")
    n = tbl(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    ) - F.col("p_retailprice").cast("decimal(12,2)") * F.lit(0.6).cast(
        "decimal(3,1)"
    ) * F.col("l_quantity").cast("decimal(12,2)")
    return (
        p.join(li, p["p_partkey"] == li["l_partkey"])
        .join(s, s["s_suppkey"] == li["l_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(amount).cast("double").alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q12_priority_class",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l_returnflag
    """,
)
def q12_priority_class(spark, sf_dir):
    """TPC-H Q12 shape: conditional CASE-counting of order priorities per
    line class after a fact-fact join with a cross-table date predicate
    (shipped >= 30 days after ordering; the fixture has no l_shipmode /
    commitdate, so returnflag plays the shipmode role). Integer-only
    output."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_shipdate") >= F.date_add(F.col("o_orderdate"), 30))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: quarterly revenue per supplier compared against
    the global maximum via an uncorrelated scalar subquery (no window, no
    driver collect — Catalyst plans the subquery as a broadcast scalar).
    The equality compare runs on the EXACT decimal; only the output rides
    DOUBLE."""
    prepare(spark)
    li = tbl(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("q15_lineitem")
    tbl(spark, sf_dir, "supplier").createOrReplaceTempView("q15_supplier")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
          FROM q15_lineitem
          WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
        FROM q15_supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        """
    )


@register(
    "q21_suppliers_kept_waiting",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    ), multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN multi m ON l1.l_orderkey = m.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE NOT EXISTS (
      SELECT 1 FROM late l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_suppliers_kept_waiting(spark, sf_dir):
    """TPC-H Q21 shape: the sole-blame anti-join — suppliers whose line
    shipped late (> 60 days after ordering; the fixture has no
    commit/receipt dates) in a multi-supplier order where NO other
    supplier was late: one EXISTS (semi) collapsed into the multi join
    and one NOT EXISTS (anti) against the same derived 'late' set.
    Integer counts; ORDER BY (numwait, name) is a total order, so the
    LIMIT 20 set is deterministic."""
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    s = tbl(spark, sf_dir, "supplier")
    # `late` feeds both the candidate side and the NOT-EXISTS side of the
    # anti-join: persist so the orders join isn't computed twice
    late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey")
        .persist()  # cache: caller-owns
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select("l_orderkey")
    )
    l1 = late.alias("l1")
    l2 = late.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    ).alias("l2")
    sole = l1.join(multi, "l_orderkey").join(
        l2,
        (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_anti",
    )
    return (
        sole.join(s, sole["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "q22_global_sales_opportunity",
    """
    WITH positive AS (
      SELECT c_custkey, c_acctbal, substring(c_name, 17, 2) AS code
      FROM customer WHERE c_acctbal > 0.0
    ), threshold AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
      FROM positive
      WHERE code IN ('01', '13', '21', '30', '45', '77')
    )
    SELECT code AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM positive p
    WHERE p.code IN ('01', '13', '21', '30', '45', '77')
      AND p.c_acctbal > (SELECT avg_bal FROM threshold)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey
                      AND o.o_orderdate >= DATE '2000-07-01')
    GROUP BY code
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: customers from selected 'country codes' (substring
    of the fixture's fixed-width name — it has no phone column) with
    above-average balances and no RECENT orders (every fixture customer
    has some order, so the anti-join gates on orders since mid-2000 to stay
    non-vacuous): substring grouping, an
    uncorrelated scalar-average subquery, and an anti-join against the
    fact table. The average follows the exactness rule — DECIMAL sum,
    ONE double division — and the balance sum rides DOUBLE only at the
    output."""
    prepare(spark)
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("q22_customer")
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("q22_orders")
    return spark.sql(
        """
        WITH positive AS (
          SELECT c_custkey, c_acctbal, substring(c_name, 17, 2) AS code
          FROM q22_customer WHERE c_acctbal > 0.0
        ), threshold AS (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
          FROM positive
          WHERE code IN ('01', '13', '21', '30', '45', '77')
        )
        SELECT code AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM positive p
        WHERE p.code IN ('01', '13', '21', '30', '45', '77')
          AND p.c_acctbal > (SELECT avg_bal FROM threshold)
          AND NOT EXISTS (SELECT 1 FROM q22_orders o WHERE o.o_custkey = p.c_custkey
                          AND o.o_orderdate >= DATE '2000-07-01')
        GROUP BY code
        """
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 / Q11 / Q20 shapes — the three that need a supply relation.
# The fixture has no partsupp table, so each derives one from lineitem:
# supply(ps_partkey, ps_suppkey, ps_supplycost=min unit price offered,
# ps_availqty=total quantity ever shipped). min() over DECIMAL and sum()
# over integer-valued quantities are both exact and order-independent, so
# the derived relation itself is hash-stable cross-engine. With these the
# full 22-query TPC-H battery is covered.
# ---------------------------------------------------------------------------


def _supply(li: DataFrame, with_qty: bool = False) -> DataFrame:
    """Derived partsupp: one map-side-combined agg over lineitem. At 100 TB
    this is a single shuffle on (partkey, suppkey) — the natural key the
    downstream joins reuse, so AQE can avoid re-shuffling."""
    aggs = [F.min(F.col("l_extendedprice").cast(DEC)).alias("ps_supplycost")]
    if with_qty:
        aggs.append(
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("ps_availqty")
        )
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(*aggs)


_SUPPLY_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_availqty
  FROM lineitem GROUP BY 1, 2
"""


@register(
    "q2_min_cost_supplier",
    f"""
    WITH supply AS ({_SUPPLY_SQL}), eur AS (
      SELECT ps.ps_partkey, ps.ps_supplycost, s.s_acctbal, s.s_name, n.n_name
      FROM supply ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
           CAST(e.ps_supplycost AS DOUBLE) AS min_cost
    FROM part p JOIN eur e ON e.ps_partkey = p.p_partkey
    WHERE p.p_size <= 15 AND p.p_type = 'STANDARD'
      AND e.ps_supplycost = (SELECT min(e2.ps_supplycost) FROM eur e2
                             WHERE e2.ps_partkey = p.p_partkey)
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part, the EUROPE supplier(s)
    offering it at the regional minimum cost. The reference's Q2 correlated
    MIN subquery is expressed Spark-first as a per-part window MIN over the
    regional supply relation — ONE pass, one shuffle on ps_partkey, no
    self-join (a min/rejoin formulation recomputes the supply agg twice;
    measured ~1.3s -> 1.04s median at sf0.1). Per-part groups are a handful of
    suppliers, so the window carries no skew risk at scale. nation/region/
    part are broadcast; the LIMIT rides a total order (s_name, p_partkey
    unique) so membership is deterministic. Decimal min compares exactly;
    only the output casts DOUBLE."""
    from pyspark.sql import Window

    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    p = tbl(spark, sf_dir, "part")
    eur = (
        _supply(li)
        .join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name")
    )
    out = (
        eur.withColumn(
            "_min_cost",
            F.min("ps_supplycost").over(Window.partitionBy("ps_partkey")),
        )
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .join(
            F.broadcast(
                p.filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
            ),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("ps_supplycost").alias("min_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )
    return dec2dbl(out)


@register(
    "q11_important_stock",
    f"""
    WITH supply AS ({_SUPPLY_SQL}), national AS (
      SELECT ps.ps_partkey,
             ps.ps_supplycost * CAST(ps.ps_availqty AS DECIMAL(10,0)) AS val
      FROM supply ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_7', 'NATION_12')
    ), per AS (
      SELECT ps_partkey, sum(val) AS v FROM national GROUP BY ps_partkey
    )
    SELECT ps_partkey, CAST(v AS DOUBLE) AS total_value
    FROM per
    WHERE CAST(v AS DOUBLE) > 3.0 * CAST((SELECT sum(v) FROM per) AS DOUBLE)
                                  / (SELECT count(*) FROM per)
    ORDER BY total_value DESC, ps_partkey
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: per-part inventory value within a nation group,
    kept only when it exceeds a threshold derived from the TOTAL national
    value — a group-agg compared against an uncorrelated scalar subquery.
    The classic fixed fraction (0.0001/SF) is scale-dependent; here the
    gate is 3x the MEAN per-part value, which stays non-vacuous at every
    SF. val = supplycost x availqty stays DECIMAL end-to-end (exact
    multiply, exact sum, order-independent); the threshold compare
    converts both sides to DOUBLE via ONE deterministic IEEE division,
    identical in both engines. At scale: one shuffle for the per-part agg;
    the scalar total is a byte-sized broadcast, not a driver collect. The
    #parts-sized `per` aggregate is persisted because the two uncorrelated
    scalar subqueries re-execute their whole input subtree: without the
    cache the expensive lineitem agg runs three times. Persisting `per`
    (not `national`) is deliberate — `per` is small at any SF, while
    `national` is supply-pair-sized; caching the big relation measured
    SLOWER (1.68s) than caching `per` (1.13s) or nothing (1.21s) at
    sf0.1."""
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    national = (
        _supply(li, with_qty=True)
        .join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(n.filter(F.col("n_name").isin("NATION_7", "NATION_12"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "ps_partkey",
            (
                F.col("ps_supplycost") * F.col("ps_availqty").cast("decimal(10,0)")
            ).alias("val"),
        )
    )
    per = national.groupBy("ps_partkey").agg(F.sum("val").alias("v")).persist()  # cache: caller-owns
    per.createOrReplaceTempView("q11_per")
    return spark.sql(
        """
        SELECT ps_partkey, CAST(v AS DOUBLE) AS total_value
        FROM q11_per
        WHERE CAST(v AS DOUBLE) > 3.0 * CAST((SELECT sum(v) FROM q11_per) AS DOUBLE)
                                      / (SELECT count(*) FROM q11_per)
        ORDER BY total_value DESC, ps_partkey
        """
    )


@register(
    "q20_potential_promotion",
    f"""
    WITH supply AS ({_SUPPLY_SQL}), shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty96
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY 1, 2
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_3', 'NATION_9', 'NATION_17')
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey FROM supply ps
        JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                       AND sh.l_suppkey = ps.ps_suppkey
        WHERE ps.ps_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'blue%')
          AND ps.ps_availqty > 4 * sh.qty96
      )
    ORDER BY s.s_name
    """,
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape: suppliers in selected nations holding excess stock
    of 'blue' parts — the nested IN-subquery chain (part-name gate ->
    availqty-vs-shipped gate -> supplier gate) expressed Spark-first as a
    cascade of broadcast + left_semi joins, so no subquery re-scans. The
    oracle's supply-vs-shipped join collapses into ONE conditional-sum
    aggregate over lineitem (availqty = total qty, qty96 = qty shipped in
    1996 via sum(CASE)): one scan + one shuffle instead of two of each
    (measured 0.69s -> 0.54s median at sf0.1); the blue-part semi gate is pushed
    BELOW the agg so only blue lineitem rows shuffle at all. The inner
    join's existence requirement survives as qty96 > 0. availqty > 4 x
    qty96 compares exact BIGINTs."""
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    p = tbl(spark, sf_dir, "part")
    blue = p.filter(F.col("p_name").startswith("blue")).select("p_partkey")
    in_96 = (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    excess = (
        li.join(F.broadcast(blue), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("ps_availqty"),
            F.sum(
                F.when(in_96, F.col("l_quantity").cast("bigint")).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("qty96"),
        )
        .filter((F.col("qty96") > 0) & (F.col("ps_availqty") > 4 * F.col("qty96")))
        .select("ps_suppkey")
    )
    return (
        s.join(
            F.broadcast(n.filter(F.col("n_name").isin("NATION_3", "NATION_9", "NATION_17"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


