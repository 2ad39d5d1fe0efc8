"""Keyed daily aggregations (SURVEY §2.5 A1-A4).

The reference computes its daily sentiment aggregate with
``groupBy("Date").agg(sum, avg, avg, avg)`` (reference
``Batch_layer/batchPipeline.py:87-91``) and maintains keyed state by pushing
painless scripts into Elasticsearch: last-write-wins for stock columns
(``Speed_layer/yfConsumerStream.py:57-68``) and an incremental *pairwise*
average for sentiment columns (``Speed_layer/twitterConsumerStream.py:100-106``).

Spark-first versions:
- A1/A2: plain ``groupBy().agg()`` — Catalyst emits partial (map-side) +
  final hash aggregation, so the shuffle carries one row per (partition, key),
  not per input row. At 100 TB the shuffle volume is O(distinct keys), fine.
- A3 last-write-wins: ``max_by`` per key (single hash agg, no window sort).
- A4: the *correct* running mean is sum/count state; the reference's pairwise
  recurrence (an exponentially-decaying mean, NOT the arithmetic mean) is
  provided as a documented bug-compat mode in :func:`pairwise_mean_compat`.

All money-like sums go through DECIMAL so results are exact and
order-independent — required for cross-engine oracle equality and good
practice for financial columns anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def daily_ohlc(trades: DataFrame, ts: str = "ts", price: str = "value") -> DataFrame:
    """A3-flavored daily bar: per-day open/high/low/close from a trade feed.

    Mirrors the stock half of the reference's speed view (the latest stock
    row per Date wins — ``yfConsumerStream.py:57-68``); close = last trade by
    event time via ``max_by`` (no window/sort shuffle, one hash agg).
    """
    p = F.col(price).cast(DEC)
    return trades.groupBy(F.to_date(F.col(ts)).alias("event_date")).agg(
        F.min_by(p, F.col(ts)).alias("open_v"),
        F.max(p).alias("high_v"),
        F.min(p).alias("low_v"),
        F.max_by(p, F.col(ts)).alias("close_v"),
        F.count(F.lit(1)).alias("n_trades"),
        F.sum(p).cast(DEC).alias("turnover"),
    )


def daily_sentiment(news: DataFrame, ts: str = "ts", score: str = "k") -> DataFrame:
    """A1/A2: per-day article count + mean score.

    Reference shape: ``groupBy('Date').agg(sum('Nbr_article'), avg(...)...)``
    with ``Nbr_article = lit(1)`` summed (batchPipeline.py:79,87-91) — i.e. a
    count spelled as sum-of-ones. We keep both spellings so the driver can
    check A2 == A1 count.
    """
    return news.groupBy(F.to_date(F.col(ts)).alias("event_date")).agg(
        F.count(F.lit(1)).alias("nbr_article"),
        F.sum(F.lit(1)).cast("bigint").alias("nbr_article_sum_of_ones"),
        F.avg(F.col(score)).alias("avg_score"),
    )


def last_write_wins(df: DataFrame, key: Column | str, order: Column | str) -> DataFrame:
    """A3: keep the latest full row per key (keyed ES overwrite semantics).

    ``max_by(struct(*), order)`` — a single hash aggregation. Compared with
    the window/row_number formulation this avoids a per-partition sort and
    keeps map-side partial aggregation, which matters when one key is hot.
    """
    cols = df.columns
    packed = F.struct(*[F.col(c) for c in cols])
    out = df.groupBy(key).agg(F.max_by(packed, order).alias("_row"))
    return out.select(*[F.col(f"_row.{c}").alias(c) for c in cols])


def pairwise_mean_compat(
    df: DataFrame,
    key_cols: list[str],
    ts: str,
    value: str,
    max_values: int = 100_000,
) -> DataFrame:
    """A4 bug-compat: the reference's ES painless script computes
    ``avg = (avg_old + avg_new) / 2`` per micro-batch
    (``twitterConsumerStream.py:100-106``) — an exponentially-decaying
    pairwise recurrence, not the arithmetic mean. Reproduced here as an
    event-time-ordered fold per key so the divergence is testable.

    Implemented with ``reduce`` over a ``sort_array``'d collect — the
    recurrence is order-dependent, so per-key values MUST be materialized in
    one row; that makes a hot key an OOM risk. ``max_values`` caps the
    per-key width with a hard, actionable error (``assert_true``) instead
    of an executor OOM; the correct-mean path (``avg`` / (sum,count) state)
    is the one that scales and should be used for anything hot.
    """
    pair = F.array_sort(
        F.collect_list(F.struct(F.col(ts).alias("t"), F.col(value).cast("double").alias("v")))
    )
    guard = F.assert_true(
        F.size(pair) <= F.lit(max_values),
        F.lit(
            f"pairwise_mean_compat: a key exceeds max_values={max_values} "
            "rows; this bug-compat fold is O(key width) in one row — use "
            "the correct (sum,count) mean for hot keys"
        ),
    )
    folded = F.aggregate(
        pair,
        F.struct(F.lit(0.0).alias("acc"), F.lit(True).alias("empty")),
        lambda acc, x: F.struct(
            F.when(acc["empty"], x["v"]).otherwise((acc["acc"] + x["v"]) / F.lit(2.0)).alias("acc"),
            F.lit(False).alias("empty"),
        ),
        lambda acc: acc["acc"],
    )
    return df.groupBy(*key_cols).agg(
        F.when(guard.isNull(), folded).alias("pairwise_avg"),
        F.count(F.lit(1)).alias("n"),
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed keys: stage 1 aggregates on
    (key, salt) — spreading each hot key over ``n_salts`` reducers — stage 2
    recombines the partial states per key.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {"sum", "count", "min", "max"} (the algebraic aggregates whose partial
    states recombine exactly; avg = sum/count composed by the caller).

    When to use: Spark's built-in partial aggregation already handles skew
    for map-side-combinable aggs, but the FINAL hash agg still lands each
    key on one reducer — a key holding 10% of 100 TB stalls that reducer.
    Salting bounds any reducer's share at 1/n_salts of the hot key. AQE's
    skew-join splitting does not apply to aggregations, so this is the
    manual tool. Cost: one extra (cheap) shuffle of the stage-1 partials.
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refold = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for out, (_, fn) in aggs.items():
        if fn not in fns:
            raise ValueError(f"{out}: {fn!r} is not an algebraic aggregate")
    # deterministic per-row salt (NOT monotonically_increasing_id, which is
    # re-evaluated differently on task retry and can double-count or drop
    # partials when only part of a stage is recomputed)
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).alias("_salt")
    stage1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(
        *[fns[fn](c).alias(out) for out, (c, fn) in aggs.items()]
    )
    return stage1.groupBy(*key_cols).agg(
        *[refold[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_count_distinct(
    df: DataFrame, key_cols: list[str], val_col: str, n_salts: int = 16
) -> DataFrame:
    """Skew-robust COUNT(DISTINCT val) per key -> column ``n_distinct``.

    Why distinct counting (unlike sum/count/min/max) genuinely skews: Spark
    plans it as a partial distinct on (key, value) followed by a final
    count per key, and that final aggregate receives one row PER DISTINCT
    VALUE of the key — a hot key with 10^8 distinct values stalls one
    reducer no matter how well the partial stage spread.

    The salt here MUST be a function of the VALUE (not a random row salt):
    every distinct value then lives in exactly one (key, salt) cell, the
    per-cell distinct counts are disjoint, and their sum is the exact
    distinct count. Two balanced shuffles, no reducer ever sees more than
    ~1/n_salts of a hot key's values.

    Measured honesty (bench.py skew section): at sandbox scale (5M rows,
    60%-hot key, ~3M distinct values) the UNSALTED form is faster — Spark
    pre-dedups map-side and the hot key's final merge is only ~1M compact
    rows, cheaper than salting's extra shuffle. Reach for this only when
    the distinct cardinality of a hot key is itself huge (10^8+), i.e. the
    final one-row-per-distinct-value merge is the stall."""
    salt = F.pmod(F.xxhash64(F.col(val_col)), F.lit(n_salts)).alias("_salt")
    stage1 = (
        df.select(*key_cols, F.col(val_col), salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count_distinct(F.col(val_col)).alias("_nd"))
    )
    return stage1.groupBy(*key_cols).agg(
        F.sum("_nd").cast("bigint").alias("n_distinct")
    )
