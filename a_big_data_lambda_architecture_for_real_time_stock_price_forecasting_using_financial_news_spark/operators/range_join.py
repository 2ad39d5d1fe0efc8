"""Range (interval-containment) join — the non-equi join Spark would
otherwise plan as a broadcast-nested-loop or cartesian product.

``point_in_interval_join`` matches point rows (a timestamp) to interval
rows ([start, end)) sharing a key. The scale formulation: explode each
interval into the fixed-width BUCKETS it overlaps, bucket each point,
equi-join on (key, bucket), then refine with the exact range predicate.

Why it scales: the join is a plain hash equi-join whose key cardinality is
(keys x buckets); shuffle volume is points + intervals x (interval_width /
bucket_width). A point has exactly ONE bucket and an interval lists each
overlapped bucket once, so a matching pair meets exactly once — no
dedup pass. Pick ``bucket_seconds`` on the order of the typical interval
width: too small multiplies the interval side, too big degrades the refine
selectivity (classic range-bucketing tradeoff, same as DuckDB/Databricks
range-join optimizations do internally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows with ``start <= ts < end`` on the
    shared ``keys`` — as an equi-join on (keys, time bucket) + refine.
    Columns of both inputs are preserved (name collisions aside)."""
    if how != "inner":
        raise ValueError("point_in_interval_join supports inner joins")
    # Bucket at MICROsecond precision: unix_timestamp() truncates sub-second
    # digits, which would drop the final bucket (and its points) whenever
    # `end` carries fractional seconds just past a bucket boundary.
    b = F.lit(int(bucket_seconds) * 1_000_000)
    # unix_micros rejects TIMESTAMP_NTZ (the regenerated fixtures store µs
    # with isAdjustedToUTC=false); the session zone is pinned UTC, so the
    # LTZ cast is wall-clock identity and a no-op on TIMESTAMP inputs
    mic = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    p = points.withColumn("_bucket", F.floor(mic(ts_col) / b).cast("bigint"))
    i = intervals.withColumn(
        "_b0", F.floor(mic(start_col) / b).cast("bigint")
    ).withColumn(
        # end is exclusive: the bucket of the last contained microsecond
        "_b1",
        F.floor((mic(end_col) - 1) / b).cast("bigint"),
    )
    i = i.withColumn("_bucket", F.explode(F.sequence(F.col("_b0"), F.col("_b1"))))
    joined = p.join(i, keys + ["_bucket"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_bucket", "_b0", "_b1")
