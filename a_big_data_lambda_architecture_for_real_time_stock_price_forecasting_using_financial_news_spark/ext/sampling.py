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
