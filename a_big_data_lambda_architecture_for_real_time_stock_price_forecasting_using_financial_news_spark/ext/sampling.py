"""Deterministic, reproducible sampling for training-data pipelines.

``df.sample()`` draws from a per-partition RNG: results change with the
partitioning, the Spark version, and the run — useless for a dataset you
must be able to rebuild bit-for-bit. The tool a corpus pipeline needs is
HASH sampling: a row is kept iff ``h(key) mod D < rate``, so membership is
a pure function of the row, stable under repartitioning, resumable across
incremental runs, and auditable (the oracle can recompute it).

Stratified rates let a mixture be rebalanced at ingest (e.g. downsample
the dominant language). At 100 TB this is a narrow map-side filter —
no shuffle, pushdown-friendly, scan-bound.

Hash: the portable 60-bit md5 derivation (ext/hashing.py) shared with the
sketch pipeline, so Spark and DuckDB agree on every row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import phash60, phash60_sql

DENOM = 1000  # rates are per-mille


def sample_bucket(strata_col: str, id_col: str, seed: str = "sample") -> Column:
    """Per-row bucket in [0, DENOM): hash of 'strata:id', seeded so a new
    seed draws an independent sample."""
    key = F.concat_ws(":", F.col(strata_col), F.col(id_col).cast("string"))
    return phash60(key, seed=seed) % DENOM


def sample_bucket_sql(strata_col: str, id_col: str, seed: str = "sample") -> str:
    key = f"concat_ws(':', {strata_col}, CAST({id_col} AS VARCHAR))"
    return f"({phash60_sql(key, seed=seed)} % {DENOM})"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, int],
    default_rate: int,
    seed: str = "sample",
) -> DataFrame:
    """Keep each row iff its bucket < the per-mille rate of its stratum.

    E[kept] = rate/1000 per stratum, but membership is deterministic:
    re-running on any partitioning of any superset yields the same rows.
    """
    rate: Column = F.lit(default_rate)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    return df.filter(sample_bucket(strata_col, id_col, seed) < rate)


def stratified_sample_sql(
    table: str,
    strata_col: str,
    id_col: str,
    rates: dict[str, int],
    default_rate: int,
    seed: str = "sample",
    select: str = "*",
) -> str:
    case = "CASE"
    for k, v in sorted(rates.items()):
        case += f" WHEN {strata_col} = '{k}' THEN {v}"
    case += f" ELSE {default_rate} END"
    return (
        f"SELECT {select} FROM {table} "
        f"WHERE {sample_bucket_sql(strata_col, id_col, seed=seed)} < {case}"
    )


def temperature_rates(
    df: DataFrame,
    strata_col: str,
    target_frac_mille: int,
) -> DataFrame:
    """Per-stratum keep-rates (per-mille) for temperature-flattened
    domain rebalancing — the mixture op every LLM corpus pipeline runs
    (downweight the dominant web crawl, upweight books/code) before export.

    ``target_frac_mille`` is the desired output size as a per-mille
    fraction of the input (500 = keep about half the corpus), so the same
    spec scales with the data instead of hard-coding a row count.

    Sampling weight of stratum d with count ``c_d`` uses temperature
    alpha = 0.5:  ``w_d = floor(sqrt(c_d))``. The integer floors make both
    the weights and the target EXACT, so the only floating-point ops left
    are one fixed-order chain (mul, div, div, mul, floor), each
    correctly-rounded IEEE in both Spark and DuckDB: the rates are
    bit-deterministic cross-engine, not just approximately equal.

    ``target = floor(total_rows * frac / 1000)`` (integer)
    ``rate_mille_d = min(DENOM, floor(target * w_d / tot_w / c_d * DENOM))``

    Scale shape: one map-side-combined count per stratum (output rows =
    #strata, i.e. tiny), the total-weight/total-rows folds are windows over
    that tiny aggregate, and the result is a broadcastable rate table.
    Nothing here depends on corpus size except the first count scan.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_rows"))
    w = counts.withColumn(
        "_w", F.floor(F.sqrt(F.col("n_rows").cast("double"))).cast("bigint")
    )
    # global folds over the #strata-row aggregate: single-partition by
    # construction, bounded by the number of distinct strata (tiny)
    from pyspark.sql import Window

    win = Window.partitionBy()
    tot_w = F.sum("_w").over(win)
    target = (F.sum("n_rows").over(win) * target_frac_mille) / F.lit(DENOM)
    rate = F.least(
        F.lit(DENOM).cast("bigint"),
        F.floor(
            F.floor(target).cast("double")
            * F.col("_w").cast("double")
            / tot_w.cast("double")
            / F.col("n_rows").cast("double")
            * F.lit(DENOM)
        ).cast("bigint"),
    )
    return w.withColumn("rate_mille", rate).drop("_w")


def temperature_rebalance(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    target_frac_mille: int,
    seed: str = "mix",
) -> DataFrame:
    """Keep each row iff its hash bucket clears its stratum's temperature
    rate. Two corpus scans total (count pass + filter pass); the rate table
    is broadcast, so the filter stays a narrow map-side gate — the same
    100 TB shape as :func:`stratified_sample`, with the rates *derived from
    the data* instead of hand-specified."""
    rates = temperature_rates(df, strata_col, target_frac_mille).select(
        strata_col, "rate_mille"
    )
    return df.join(F.broadcast(rates), strata_col).filter(
        sample_bucket(strata_col, id_col, seed) < F.col("rate_mille")
    )


def temperature_rates_sql(
    table: str, strata_col: str, target_frac_mille: int
) -> str:
    """DuckDB twin of :func:`temperature_rates` (identical FP op order).

    DuckDB's ``/`` on integers is float division, so the integer-exact
    target uses ``//`` where Spark's ``(sum*frac)/1000`` (integer div on
    BIGINT) is floored by :func:`temperature_rates` via ``floor``; both
    yield the same exact integer before entering the FP chain.
    """
    w = "CAST(floor(sqrt(CAST(n_rows AS DOUBLE))) AS BIGINT)"
    return f"""
    SELECT {strata_col}, n_rows,
           least({DENOM}, CAST(floor(
             CAST((sum(n_rows) OVER () * {target_frac_mille}) // {DENOM} AS DOUBLE)
             * CAST({w} AS DOUBLE)
             / CAST(sum({w}) OVER () AS DOUBLE)
             / CAST(n_rows AS DOUBLE)
             * {DENOM}) AS BIGINT)) AS rate_mille
    FROM (SELECT {strata_col}, count(*) AS n_rows FROM {table} GROUP BY {strata_col})
    """
