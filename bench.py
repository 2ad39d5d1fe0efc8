"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Timing uses the noop sink so we measure execution, not driver collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# r1 floor: 11.70 s for the first 11 queries (BENCH_r01.json); j3/w1/x10
# added in r2 so regressions in the sort/window/tf-idf paths are visible.
HEADLINE = [
    "flagship_batch_view",
    "q1_pricing_summary",
    "q5_regional_revenue",
    "a3_last_write_wins",
    "j2_keyed_column_merge",
    "t7_lambda_reconciliation",
    # training-data extensions (documents/embeddings tables)
    "d2_dedup_minhash_lsh",
    "d3_dedup_simhash",
    "s1_ann_topk_bruteforce",
    "s2_ann_topk_ivf",
    "x9_fingerprint",
    # r2 breadth: union-sort as-of join, analytic windows, tf-idf
    "j3_asof_join",
    "w1_window_functions",
    "x10_tfidf_top_terms",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.session import (
        configure,
    )

    spark = configure(
        SparkSession.builder.appName("bench").master(f"local[{cpus}]")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in os.environ.get("BENCH_EXTRA", "").split(",") if n in qs
    ]

    # warmup pass: whole-stage-codegen JIT compiles per expression shape, so
    # a single tiny query leaves every other plan cold (measured 5-10x noise
    # on the sketch-heavy queries). Run every headline once unmeasured, then
    # drop any caches it left so the timed pass re-does all real work.
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    timings = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
