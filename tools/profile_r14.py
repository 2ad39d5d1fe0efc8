"""Per-query profiler for the r14 optimization round.

Times individual registry queries with the bench's exact methodology
(noop sink, warmup pass, median of N interleaved reps, clearCache between
reps) and captures ``explain("formatted")`` for each into
``plans/r14/<name>_<tag>.txt``.

Usage:
    python tools/profile_r14.py --tag before [--sf DIR] [--reps 3] name...
    python tools/profile_r14.py --tag before --headline   # whole bench list

Prints one JSON line {"queries": {name: sec}, "machine": {...}} so runs can
be diffed against BENCH_* snapshots.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--plans-only", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.session import (
        configure,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = configure(
        SparkSession.builder.appName("profile_r14")
        .master(f"local[{cpus}]")
        .config("spark.ui.showConsoleProgress", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import bench as benchmod
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = list(args.names)
    if args.headline:
        names = [n for n in benchmod.HEADLINE if n in qs] + names
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        sys.exit(2)

    plans_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    machine = benchmod.machine_state()

    # capture plans first (cheap, no execution)
    if not args.no_plans:
        for name in names:
            df = qs[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(txt)
        spark.catalog.clearCache()

    if args.plans_only:
        spark.stop()
        print(json.dumps({"tag": args.tag, "plans": len(names)}), flush=True)
        return

    # warmup (codegen JIT), then timed reps — bench.py's exact discipline
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    reps: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"timed:{name}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            reps[name].append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    timings = {name: round(statistics.median(v), 3) for name, v in reps.items()}
    doc = {
        "tag": args.tag,
        "sf_dir": args.sf,
        "queries": timings,
        "total": round(sum(timings.values()), 3),
        "machine": machine,
        "machine_post": benchmod.machine_state(),
    }
    spark.stop()
    print(json.dumps(doc), flush=True)


if __name__ == "__main__":
    main()
