"""Whole-registry physical-plan audit: global invariants that keep every
query scale-safe, checked mechanically so a regression cannot hide in one
of 80+ entries. Usage: python plancheck.py [sf_dir]

Invariants (violations exit non-zero):
- no row-at-a-time Python (`BatchEvalPython`) anywhere — Python is allowed
  only Arrow-batched (MapInPandas / FlatMapGroupsInPandas / ArrowEvalPython);
- no `CartesianProduct` / `BroadcastNestedLoopJoin` outside the explicit
  allowlist (s1's brute-force ANN is a documented exact-scoring cross join);
- no DECIMAL output column (cross-engine hash hazard; `dec2dbl` rule);
- no nested-typed (array/map/struct) output column (the driver's pandas
  hasher cannot factorize list cells — r9's d16 red row).

Also prints per-query Exchange and join-node counts — the at-a-glance
shuffle budget.
"""

from __future__ import annotations

import re
import sys

# documented exceptions: brute-force ANN is an intentional cross join
# (s5 embeds it as the recall baseline); x10 crossJoins a 1-row count
# aggregate (broadcast) — bounded by design; s6/s7 crossJoin the k-means
# CENTROID table (<= KM_K = 64 rows, broadcast) for nearest-centroid
# assignment — every vector must score every centroid, and the small side
# is k x dim doubles regardless of corpus size
CROSS_JOIN_ALLOWLIST = {
    "s1_ann_topk_bruteforce",
    "s5_ivf_recall",
    "x10_tfidf_top_terms",
    "s6_ann_topk_ivf_kmeans",
    "s7_ann_recall_kmeans_vs_signbit",
    # centroid-table crossJoin (<= KM_K = 64 broadcast rows), same bound as s6
    "s11_incremental_ivf",
    # 1-row corpus-total broadcast crossJoin, same bound as x10
    "x26_unigram_surprisal",
    # 1-row corpus-total broadcast crossJoin, same bound as x10/x26
    "x30_pmi_collocations",
    # subset-bounded all-pairs TRUTH side of the dedup recall harness —
    # quadratic by design, the same yardstick contract as s1/s5
    "d11_lsh_recall",
    # 1-row corpus-total broadcast crossJoin (the heavy-hitter threshold),
    # same bound as x10/x26/x30
    "a21_cms_heavy_hitters",
    # t23 is a21's streaming twin: same 1-row total crossJoin in the
    # serving-side probe over the streamed sketch
    "t23_stream_cms_view",
    # m14 rides s1's sanctioned brute-force scoring leg (broadcast
    # serving-sized query set x corpus scan), same bound as s1
    "m14_knn_eval",
    # 1-row population-totals broadcast crossJoin back across the bin
    # histogram, same bound as x10/x26/x30/a21
    "m16_drift_tv",
    # 1-row basket-count broadcast crossJoin onto the frequent-pair
    # relation (lift numerator), same bound as x10/x26/m16
    "a27_assoc_rules",
    # class-count-bounded centroid-table broadcast crossJoin (10 rows),
    # same bound as s6/s11's centroid crossJoin
    "m17_nearest_centroid",
    # class-count-bounded model-head broadcast crossJoin (5 rows) plus the
    # 1-row doc-total crossJoin — same bounds as m17 and x26
    "m18_naive_bayes",
    # 1-row global-exact-count broadcast crossJoin onto the 1-row merged
    # sketch summary — same bound as x10/x26
    "a32_hll_union",
    # 5x5 event-type pair build (10-row cartesian by construction); every
    # sketch-row join after it is broadcast hash — same bound as m17
    "a30_kmv_setops",
    # 1-row corpus-totals (N, L) broadcast crossJoin onto the queried
    # terms' postings, same bound as x10/x26
    "x39_bm25",
    # 1-row x 1-row crossJoin of the two scalar kappa aggregates
    # (totals x expected-agreement), same bound as x10/x26
    "m21_cohens_kappa",
    # per-round 1-row WINNING-PAIR broadcast crossJoin folded back into
    # the vocabulary-sized word-type table (3 rounds), same bound as x10
    "x40_bpe_merges",
    # 1-row corpus-totals (ta, tb) broadcast crossJoin onto the
    # vocabulary-sized term-count relation, same bound as x10/x26
    "x41_logodds_keyness",
    # x40's trainer reused verbatim (per-round 1-row winner crossJoin),
    # same bound as x40
    "x42_bpe_tokenize",
    # 1-row edge-total (m) broadcast crossJoin onto the
    # communities-count-sized per-community relation, same bound as x10
    "g20_modularity",
    # m23 rides s1's sanctioned brute-force scoring leg (broadcast
    # serving-sized query set x corpus scan), same bound as s1/m14
    "m23_ndcg",
    # source-count-bounded pair build (sz x sz with a < filter, like
    # a30's 5x5 event-type pairs); the token intersection itself is a
    # vocabulary-sized EQUI-join — never nested-loop
    "x43_source_overlap",
    # centroid-table broadcast crossJoin (<= KM_K = 64 rows) for the
    # SemDeDup cluster assignment — same bound as s6/s11
    "d17_semdedup",
    # incremental SemDeDup probe: the same <= KM_K = 64-row broadcast
    # centroid crossJoin as d17 (batch assignment against the frozen table)
    "d22_semdedup_incremental",
    # class-count-bounded (5-row) + 1-row doc-total broadcast crossJoins
    # building the chi2 scoring grid — same bounds as m18
    "m28_chi2_feature_select",
    # x40's per-round 1-row winning-pair broadcast crossJoin, folded into
    # the lang-keyed word-type table — same bound as x40/x42
    "x45_tokenizer_fertility",
    # NOTE: s12_ann_ivfpq_adc is deliberately NOT allowlisted — PQ training
    # joins on m (broadcast hash join), and the plan-quality test asserts
    # no nested loop; keeping it out lets plancheck catch a regression
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    sys.path.insert(0, "/root/repo")
    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.session import (
        configure,
    )

    spark = configure(
        SparkSession.builder.appName("plancheck").master("local[8]")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    violations: list[str] = []
    rows: list[tuple[str, int, str]] = []
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        decs = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
        if decs:
            violations.append(f"{name}: DECIMAL output columns {decs}")
        nested = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nested:
            # r9: the driver's pandas hasher cannot factorize list cells —
            # a value-exact query with an array output column is still red
            violations.append(f"{name}: nested-typed output columns {nested}")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if "BatchEvalPython" in plan:
            violations.append(f"{name}: row-at-a-time Python (BatchEvalPython)")
        if (
            ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan)
            and name not in CROSS_JOIN_ALLOWLIST
        ):
            violations.append(f"{name}: un-allowlisted cartesian/nested-loop join")
        n_exchange = plan.count("Exchange")
        joins = sorted(set(re.findall(r"(\w+Join)", plan)))
        rows.append((name, n_exchange, ",".join(joins) or "-"))

    width = max(len(n) for n, _, _ in rows)
    for name, nex, joins in rows:
        print(f"{name:{width}s}  exchanges={nex:<3d} joins={joins}")
    if violations:
        print("\nVIOLATIONS:")
        for v in violations:
            print(" -", v)
        sys.exit(1)
    print(f"\n{len(rows)} queries audited, no violations")


if __name__ == "__main__":
    main()
