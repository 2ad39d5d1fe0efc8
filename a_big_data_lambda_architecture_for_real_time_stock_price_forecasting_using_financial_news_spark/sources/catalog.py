"""SQL catalog entry point: register the dataset as temp views so any
ANSI SQL runs against the engine directly (``spark.sql``) — the interface
a reference user lands on first when switching.

The nanos-timestamp normalization and session preparation ride along, so
``SELECT ... FROM events`` behaves identically to the DataFrame loaders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import prepare
from .batch import load_table

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def register_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Create (or replace) one temp view per dataset table; returns the
    registered names. Views are lazy — no data moves until a query runs,
    and Catalyst pushdown/pruning applies through them unchanged."""
    prepare(spark)
    out = []
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        out.append(name)
    return out


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot convenience: register + run."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
