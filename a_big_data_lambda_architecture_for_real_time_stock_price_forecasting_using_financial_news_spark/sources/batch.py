"""Batch sources (SURVEY §2.1 S4/S5).

The reference's batch reads are ES index scans with hand-written ``es.query``
JSON pushed down (reference ``Batch_layer/batchPipeline.py:108-127``,
``Serving_layer/prediction.py:37-60``). Here views live in parquet and
pushdown is Catalyst's job: declare filters/projections on the DataFrame and
the scan gets ``PushedFilters`` + pruned ``ReadSchema`` for free — verified in
tests via ``explain``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Column pruning/pushdown happens downstream.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark has no native type
    for — read it as long and truncate ns→µs with integer division (matching
    DuckDB's truncating nanos→micros read; float division would lose
    precision above 2^53 ns).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # driver fixture layout: TIMESTAMP(NANOS) read as raw nanos
            return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return df  # generated sets (tools/gen_sf1.py) store real µs timestamps
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_json_lines(
    spark: SparkSession,
    path: str,
    schema,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """NDJSON source with an EXPLICIT schema + corrupt-record capture.

    Two non-negotiables at scale: never let Spark infer the schema (a
    full pre-pass over 100 TB just to guess types), and never let a single
    bad line kill a 10-hour job — PERMISSIVE mode quarantines it into
    ``corrupt_col`` for a dead-letter query instead (the same contract
    p7_malformed_json pins for streamed payloads)."""
    from pyspark.sql.types import StringType, StructField, StructType

    full = StructType(list(schema.fields) + [StructField(corrupt_col, StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema,
    header: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """CSV source: explicit schema, PERMISSIVE corrupt capture, header
    handling. Same scale rules as read_json_lines."""
    from pyspark.sql.types import StringType, StructField, StructType

    full = StructType(list(schema.fields) + [StructField(corrupt_col, StringType())])
    return (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )
