"""Generate a ~sf1 dataset (10x sf0.1) for bench constant-factor checks.

Each replica i shifts every primary/foreign KEY by i*OFF, so the result is
10 disjoint, referentially-consistent TPC-H-ish universes sharing the
region/nation dims — row counts scale 10x, join fan-outs stay realistic,
and predicates like `vec_id % 50 = 0` keep their selectivity (OFF is a
multiple of 50). Document text gets a per-replica suffix so the dedup
benches see 10x corpus, not synthetic cross-replica dup cliques.
events.ts is written as a real microsecond TIMESTAMP (the fixture's
TIMESTAMP(NANOS) truncated exactly like load_table does) — both
sources/batch.py and the DuckDB oracles handle either layout.

Usage: python tools/gen_sf1.py [src_sf_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /root/repo/.data/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFF = 10_000_000_000  # replica key offset; multiple of 50
N_REP = 10

SHIFT = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
PARTS = {"lineitem": 16, "orders": 8, "events": 8, "documents": 8, "embeddings": 8}


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.data/sf1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.session import (
        configure,
    )

    spark = configure(
        SparkSession.builder.appName("gen_sf1").master("local[32]")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # events.ts

    os.makedirs(dst, exist_ok=True)
    for name, keys in SHIFT.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        if name == "events":
            from pyspark.sql.types import LongType, TimestampNTZType

            ts_type = df.schema["ts"].dataType
            if isinstance(ts_type, LongType):  # nanos long -> real µs timestamp
                df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
            elif isinstance(ts_type, TimestampNTZType):
                # regenerated fixtures already store µs; normalize to LTZ
                # (UTC session) so replicas match the batch reader's view
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        if keys:  # replicate with disjoint key universes
            df = df.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(N_REP - 1))))
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.col("_r").cast("bigint") * OFF)
            if name == "documents":
                # plain alnum suffix: several oracles assume fixture-clean
                # text (no #/$/@/URLs), an assumption generated corpora
                # must preserve
                df = df.withColumn(
                    "text", F.concat(F.col("text"), F.lit(" r"), F.col("_r"))
                )
            df = df.drop("_r")
        df.repartition(PARTS.get(name, 4)).write.mode("overwrite").parquet(
            f"{dst}/{name}.parquet"
        )
        print(f"{name}: {spark.read.parquet(f'{dst}/{name}.parquet').count()} rows")


if __name__ == "__main__":
    main()
