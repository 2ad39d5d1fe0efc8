"""Training-data extensions: dedup, similarity, text analysis, multimodal.

Mechanically split from plans/registry.py (r12): entry bodies moved
verbatim, registration order preserved by the facade import sequence,
names unchanged.

Findability note (r12 verdict item 6): entries REGISTERED AFTER the
split append to the declaration-order TAIL module (registry_tokenizer,
the last one the facade imports) so existing registration order stays
bit-identical — which is why the newest members of this module's
families live elsewhere: d18/d19/d20/d21 (substring dedup),
d22_semdedup_incremental, d23_substring_exact_bounds, and
t30_stream_substring_view are all in ``registry_tokenizer.py``. Grep for
the entry name; the facade re-exports everything either way."""

from __future__ import annotations

from ..plans.batch_pipeline import DEFAULT_AS_OF, build_batch_view, flagship, parse_props
from ..session import prepare
from pyspark.sql import functions as F
from .registry_base import DEC, register, tbl

# ---------------------------------------------------------------------------
# Extensions: dedup / similarity / text analysis / multimodal (driver
# mandate — first-class alongside SURVEY §2). Oracle SQL is GENERATED from
# the same parameters as the Spark builders (ext/*.py), so LSH candidate
# sets and float folds match bit-for-bit across engines.
# ---------------------------------------------------------------------------

from ..ext import dedup as _dd
from ..ext import hashing as _hh
from ..ext import multimodal as _mm
from ..ext import similarity as _sim
from ..ext import text as _tx


@register(
    "d1_dedup_exact",
    f"""
    SELECT md5({_dd.norm_text_sql('text')}) AS content_hash,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def d1_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized content (ext/dedup.py)."""
    return _dd.exact_dedup(tbl(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "d2_dedup_minhash_lsh",
    _dd.minhash_lsh_pairs_sql("documents", "doc_id", "text", threshold=0.5),
)
def d2_dedup_minhash_lsh(spark, sf_dir):
    """MinHash(16) + LSH(4x4 bands) near-dup pairs, exact-Jaccard verified
    at 0.5. Candidate generation is an equi-join on band hash — never
    all-pairs (ext/dedup.py:minhash_lsh_pairs)."""
    return _dd.minhash_lsh_pairs(
        tbl(spark, sf_dir, "documents"), "doc_id", "text", threshold=0.5
    )


@register(
    "d3_dedup_simhash",
    _dd.simhash_pairs_sql("documents", "doc_id", "text", max_hamming=3),
)
def d3_dedup_simhash(spark, sf_dir):
    """SimHash-32 near-dup pairs, hamming <= 3, byte-banded candidates
    (pigeonhole guarantees recall at this radius)."""
    return _dd.simhash_pairs(
        tbl(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )


@register(
    "d4_dedup_ngram_jaccard",
    _dd.ngram_jaccard_pairs_sql(
        "documents", "doc_id", "text", ["lang", "source"], threshold=0.75
    ),
)
def d4_dedup_ngram_jaccard(spark, sf_dir):
    """Char-4-gram Jaccard >= 0.75 within (lang, source) blocks — the
    high-precision blocked pass."""
    return _dd.ngram_jaccard_pairs(
        tbl(spark, sf_dir, "documents"), "doc_id", "text",
        ["lang", "source"], threshold=0.75,
    )


@register(
    "d5_dedup_embedding_cosine",
    _sim.embedding_near_dup_sql("embeddings", threshold=0.35),
)
def d5_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs within the coarse `label` cell."""
    return _sim.embedding_near_dup(tbl(spark, sf_dir, "embeddings"), threshold=0.35)


@register(
    "s1_ann_topk_bruteforce",
    _sim.topk_bruteforce_sql("embeddings", "vec_id % 50 = 0", k=5),
)
def s1_ann_topk_bruteforce(spark, sf_dir):
    """Exact cosine top-5 for queries vec_id % 50 == 0: broadcast queries x
    one corpus scan (ext/similarity.py:topk_bruteforce)."""
    emb = tbl(spark, sf_dir, "embeddings")
    return _sim.topk_bruteforce(emb, emb.filter(F.col("vec_id") % 50 == 0), k=5)


@register(
    "s2_ann_topk_ivf",
    _sim.topk_ivf_sql("embeddings", "vec_id % 50 = 0", k=5),
)
def s2_ann_topk_ivf(spark, sf_dir):
    """IVF top-5: probe only the query's sign-bit cell (64 cells) — the
    O(Q*N/cells) scale path; recall measured against s1."""
    emb = tbl(spark, sf_dir, "embeddings")
    return _sim.topk_ivf(emb, emb.filter(F.col("vec_id") % 50 == 0), k=5)


@register(
    "s5_ivf_recall",
    f"""
    WITH bf AS ({_sim.topk_bruteforce_sql("embeddings", "vec_id % 50 = 0", k=5)}),
    ivf AS ({_sim.topk_ivf_sql("embeddings", "vec_id % 50 = 0", k=5)}),
    hits AS (
      SELECT bf.query_id,
             count(ivf.neighbor_id) AS n_hit,
             count(*) AS n_true
      FROM bf LEFT JOIN ivf
        ON bf.query_id = ivf.query_id AND bf.neighbor_id = ivf.neighbor_id
      GROUP BY bf.query_id
    )
    SELECT count(*) AS n_queries,
           CAST(sum(n_hit) AS BIGINT) AS total_hits,
           CAST(sum(n_true) AS BIGINT) AS total_true,
           CAST(CAST(sum(n_hit) AS DOUBLE) / sum(n_true) AS DOUBLE) AS recall
    FROM hits
    """,
)
def s5_ivf_recall(spark, sf_dir):
    """ANN quality harness: recall of the IVF scale path against the exact
    brute-force baseline, computed IN the engine (the eval loop a vector
    pipeline runs after every quantizer change). Both sides are
    deterministic, so recall is a fixed number per dataset — integer hit
    counts, one final division."""
    emb = tbl(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0)
    bf = _sim.topk_bruteforce(emb, queries_df, k=5).select(
        "query_id", F.col("neighbor_id").alias("bf_neighbor")
    )
    ivf = _sim.topk_ivf(emb, queries_df, k=5).select(
        "query_id", F.col("neighbor_id").alias("ivf_neighbor")
    )
    hits = (
        bf.join(
            ivf,
            (bf["query_id"] == ivf["query_id"])
            & (bf["bf_neighbor"] == ivf["ivf_neighbor"]),
            "left",
        )
        .groupBy(bf["query_id"])
        .agg(
            F.count(ivf["ivf_neighbor"]).alias("n_hit"),
            F.count(F.lit(1)).alias("n_true"),
        )
    )
    return hits.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("n_hit").cast("bigint").alias("total_hits"),
        F.sum("n_true").cast("bigint").alias("total_true"),
        (F.sum("n_hit").cast("double") / F.sum("n_true")).cast("double").alias("recall"),
    )


@register(
    "s6_ann_topk_ivf_kmeans",
    _sim.topk_ivf_kmeans_sql("embeddings", "vec_id % 50 = 0", k=5, probe=2),
)
def s6_ann_topk_ivf_kmeans(spark, sf_dir):
    """ANN top-5 with the LEARNED coarse quantizer + multiprobe
    (ext/similarity.py:topk_ivf_kmeans): k-means centroids trained on a
    hash-gated sample with deterministic md5 seeding and integer-exact
    Lloyd updates, corpus assigned to nearest-centroid cells, each query
    probing its 2 nearest cells. Training is fully deterministic, so the
    identical procedure in SQL is the oracle — the learned upgrade the
    sign-bit `ivf_cell` docstring (s2) promises."""
    emb = tbl(spark, sf_dir, "embeddings")
    return _sim.topk_ivf_kmeans(
        emb, emb.filter(F.col("vec_id") % 50 == 0), k=5, probe=2
    )


@register(
    "s7_ann_recall_kmeans_vs_signbit",
    f"""
    WITH bf AS ({_sim.topk_bruteforce_sql("embeddings", "vec_id % 50 = 0", k=5)}),
    km AS ({_sim.topk_ivf_kmeans_sql("embeddings", "vec_id % 50 = 0", k=5, probe=1)}),
    sb AS ({_sim.topk_ivf_sql("embeddings", "vec_id % 50 = 0", k=5)}),
    j AS (
      SELECT bf.query_id, km.neighbor_id AS km_n, sb.neighbor_id AS sb_n
      FROM bf
      LEFT JOIN km ON bf.query_id = km.query_id AND bf.neighbor_id = km.neighbor_id
      LEFT JOIN sb ON bf.query_id = sb.query_id AND bf.neighbor_id = sb.neighbor_id
    )
    SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS total_true,
           CAST(count(km_n) AS BIGINT) AS hits_kmeans,
           CAST(count(sb_n) AS BIGINT) AS hits_signbit,
           CAST(CAST(count(km_n) AS DOUBLE) / count(*) AS DOUBLE) AS recall_kmeans,
           CAST(CAST(count(sb_n) AS DOUBLE) / count(*) AS DOUBLE) AS recall_signbit
    FROM j
    """,
)
def s7_ann_recall_kmeans_vs_signbit(spark, sf_dir):
    """Head-to-head recall harness at EQUAL probe fraction: the learned
    k-means quantizer (64 cells, probe 1) vs the data-independent sign-bit
    quantizer (64 cells, probe 1), both against the exact brute-force
    top-5. Each candidate set is ~N/64, so any recall gap is pure cell
    quality — the number that justifies (or rejects) training a quantizer.
    tests/test_ext.py asserts recall_kmeans >= recall_signbit."""
    emb = tbl(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") % 50 == 0)
    bf = _sim.topk_bruteforce(emb, qdf, k=5).select(
        "query_id", F.col("neighbor_id").alias("bf_neighbor")
    )
    km = _sim.topk_ivf_kmeans(emb, qdf, k=5, probe=1).select(
        F.col("query_id").alias("kq"), F.col("neighbor_id").alias("km_n")
    )
    sb = _sim.topk_ivf(emb, qdf, k=5).select(
        F.col("query_id").alias("sq"), F.col("neighbor_id").alias("sb_n")
    )
    j = bf.join(
        km,
        (F.col("query_id") == F.col("kq")) & (F.col("bf_neighbor") == F.col("km_n")),
        "left",
    ).join(
        sb,
        (F.col("query_id") == F.col("sq")) & (F.col("bf_neighbor") == F.col("sb_n")),
        "left",
    )
    n = F.count(F.lit(1))
    return j.agg(
        F.countDistinct("query_id").alias("n_queries"),
        n.cast("bigint").alias("total_true"),
        F.count("km_n").cast("bigint").alias("hits_kmeans"),
        F.count("sb_n").cast("bigint").alias("hits_signbit"),
        # try_divide: an empty truth set (no query has any true neighbor —
        # possible on degenerate generated corpora) is 0/0 = NULL in DuckDB
        # where ANSI Spark raises DIVIDE_BY_ZERO (r10 fuzz catch)
        F.try_divide(F.count("km_n").cast("double"), n)
        .cast("double")
        .alias("recall_kmeans"),
        F.try_divide(F.count("sb_n").cast("double"), n)
        .cast("double")
        .alias("recall_signbit"),
    )


@register(
    "s8_ann_int8_rerank",
    _sim.topk_int8_rerank_sql("embeddings", "vec_id % 50 = 0", k=5),
)
def s8_ann_int8_rerank(spark, sf_dir):
    """The full ANN serving cascade (ext/similarity.py:topk_int8_rerank):
    IVF cell probe -> int8 integer-dot prefilter (top-25 per query) ->
    exact cosine rerank (top-5). The quantized middle stage is what makes
    the candidate scoring affordable when cells are large at 100 TB."""
    emb = tbl(spark, sf_dir, "embeddings")
    return _sim.topk_int8_rerank(emb, emb.filter(F.col("vec_id") % 50 == 0), k=5)


@register(
    "x6_lang_id",
    f"""
    SELECT doc_id, lang, {_tx.lang_id_sql('text')} AS lang_pred
    FROM documents
    """,
)
def x6_lang_id(spark, sf_dir):
    """Heuristic stopword language-ID (ext/text.py:lang_id)."""
    d = tbl(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", _tx.lang_id(F.col("text")).alias("lang_pred"))


@register(
    "x7_quality_score",
    f"""
    SELECT doc_id, {_tx.quality_score_sql('text')} AS quality
    FROM documents
    """,
)
def x7_quality_score(spark, sf_dir):
    """Deterministic quality score: alpha/punct/stopword ratios."""
    d = tbl(spark, sf_dir, "documents")
    return d.select("doc_id", _tx.quality_score(F.col("text")).alias("quality"))


@register(
    "x8_token_count",
    (lambda ws, bpe: f"""
    SELECT doc_id, CAST({ws} AS INTEGER) AS n_ws_tokens,
           CAST({bpe} AS INTEGER) AS n_bpe_units
    FROM documents
    """)(*_tx.token_counts_sql("text")),
)
def x8_token_count(spark, sf_dir):
    """Whitespace + BPE-ish token counts, pure regexp expressions."""
    d = tbl(spark, sf_dir, "documents")
    ws, bpe = _tx.token_counts(F.col("text"))
    return d.select(
        "doc_id",
        ws.cast("int").alias("n_ws_tokens"),
        bpe.cast("int").alias("n_bpe_units"),
    )


@register(
    "x9_fingerprint",
    f"""
    SELECT doc_id, {_tx.fingerprint_sql('text')} AS fp
    FROM documents
    """,
)
def x9_fingerprint(spark, sf_dir):
    """Order-sensitive rolling-hash document fingerprint."""
    d = tbl(spark, sf_dir, "documents")
    return d.select("doc_id", _tx.fingerprint(F.col("text")).alias("fp"))


@register(
    "m6_multimodal_features",
    """
    SELECT doc_id,
           CAST(16 AS INTEGER) AS byte_len,
           CAST(list_sum(list_transform(range(0, 16),
                i -> CAST(concat('0x', md5(text)[2*i+1 : 2*i+2]) AS BIGINT)))
                AS BIGINT) AS byte_sum,
           CAST(concat('0x', md5(text)[1:15]) AS BIGINT) AS head64,
           'fake' AS fmt
    FROM documents
    """,
)
def m6_multimodal_features(spark, sf_dir):
    """Binary media column + Arrow-batched mapInPandas feature extraction
    (ext/multimodal.py). Payload = md5(text) bytes, so the oracle recomputes
    the same features from hex; head64 = first 60 bits = phash60(text)."""
    d = tbl(spark, sf_dir, "documents")
    return _mm.extract_features(_mm.attach_media(d, "doc_id", "text"))


from ..ext import sampling as _sp


@register(
    "x11_repetition_score",
    _tx.repetition_stats_sql("documents", "doc_id", "text"),
)
def x11_repetition_score(spark, sf_dir):
    """Within-doc repetition (duplicate word-3-gram fraction) — the
    Gopher-style boilerplate/spam signal for training-data filtering
    (ext/text.py:repetition_stats)."""
    return _tx.repetition_stats(tbl(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "x12_length_histogram",
    """
    SELECT CAST(least(floor(length(text) / 100.0), 9) AS INTEGER) AS bucket,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
)
def x12_length_histogram(spark, sf_dir):
    """Corpus length profile: 100-char buckets (capped at 9) with doc and
    char totals — the histogram a quality-filter threshold is read off.
    One map-side-combined agg over ~10 groups: shuffle is O(buckets)."""
    d = tbl(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.length("text") / 100), F.lit(9)).cast("int")
    return d.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
    )


@register(
    "s3_stratified_sample",
    _sp.stratified_sample_sql(
        "documents",
        "lang",
        "doc_id",
        rates={"en": 200},
        default_rate=600,
        select="doc_id, lang",
    ),
)
def s3_stratified_sample(spark, sf_dir):
    """Deterministic hash-stratified sampling (ext/sampling.py): rebalance
    the language mixture at ingest — keep 20% of the dominant 'en' stratum,
    60% elsewhere. Membership = pure row hash: stable across partitioning,
    runs, and supersets (unlike df.sample's per-partition RNG)."""
    d = tbl(spark, sf_dir, "documents")
    return _sp.stratified_sample(
        d, "lang", "doc_id", rates={"en": 200}, default_rate=600
    ).select("doc_id", "lang")


@register(
    "a8_quantiles",
    """
    SELECT event_type,
           quantile_cont(CAST(props->>'k' AS BIGINT), 0.5) AS med_k,
           quantile_cont(CAST(props->>'k' AS BIGINT), 0.9) AS p90_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def a8_quantiles(spark, sf_dir):
    """Exact quantiles per group (median + p90 of the score column): Spark
    ``percentile`` and DuckDB ``quantile_cont`` both use linear
    interpolation over the sorted group; over integer inputs the
    interpolation arithmetic agrees bit-for-bit (verified on the driver
    fixtures). Exact percentile sorts each group — at 100 TB prefer
    ``approx_percentile`` (t-digest, mergeable partial states) when 1%
    error is acceptable; this entry pins the exact semantics."""
    ev = parse_props(tbl(spark, sf_dir, "events"))
    k = F.col("k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.percentile(k, F.lit(0.5)).alias("med_k"),
        F.percentile(k, F.lit(0.9)).alias("p90_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "a11_collect_sorted",
    """
    SELECT event_type,
           array_to_string(list_sort(list_distinct(
             list(CAST(user_id % 100 AS BIGINT)))), ',') AS user_buckets,
           CAST(len(list_distinct(list(user_id % 100))) AS INTEGER) AS n_buckets
    FROM events GROUP BY event_type
    """,
)
def a11_collect_sorted(spark, sf_dir):
    """Collect-set aggregation made deterministic: collect_set's order is
    arbitrary, so the canonical form is sort_array + string join — the
    only hash-stable way to emit a set-valued aggregate. Bounded per key
    (distinct buckets <= 100); unbounded collect_list per key is the OOM
    pattern pairwise_mean_compat guards against."""
    ev = tbl(spark, sf_dir, "events")
    buckets = F.sort_array(F.collect_set((F.col("user_id") % 100).cast("bigint")))
    return ev.groupBy("event_type").agg(
        F.concat_ws(",", buckets.cast("array<string>")).alias("user_buckets"),
        F.size(buckets).cast("int").alias("n_buckets"),
    )


@register(
    "a10_approx_quantiles",
    """
    SELECT event_type,
           quantile_cont(CAST(props->>'k' AS BIGINT), 0.5) AS exact_med,
           1 AS approx_within_tol
    FROM events GROUP BY event_type
    """,
)
def a10_approx_quantiles(spark, sf_dir):
    """approx_percentile (Greenwald-Khanna sketch, mergeable partial
    states) — the quantile path that scales where exact percentile's
    per-group sort does not. Sketch values are engine-specific, so the
    gated output is the exact median plus a flag asserting the approx
    answer landed within the sketch's RANK guarantee: with accuracy A
    the returned value is an actual element whose rank error is at most
    n/A, i.e. strictly under one position for groups smaller than A —
    so it must lie between the order statistics bracketing the median
    (ranks floor(n/2) .. floor(n/2)+2, clamped). r9's flag used a VALUE
    distance (|approx - exact| <= 2.0), which is not an invariant at
    all — the r10 fuzz layer falsified it with a two-element group
    {0, 5}: exact 2.5, approx 0 or 5, distance 2.5. Rank windows are
    what the sketch actually promises; value windows were a fixture
    artifact."""
    ev = parse_props(tbl(spark, sf_dir, "events"))
    k = F.col("k").cast("bigint")
    agg = ev.groupBy("event_type").agg(
        F.percentile(k, F.lit(0.5)).alias("exact_med"),
        F.percentile_approx(k, F.lit(0.5), F.lit(10000)).alias("_approx"),
        F.array_sort(F.collect_list(k)).alias("_arr"),
    )
    n = F.size("_arr")
    lo_i = F.greatest(F.floor(n / 2).cast("int"), F.lit(1))
    hi_i = F.least(n, F.floor(n / 2).cast("int") + F.lit(2))
    within = (F.col("_approx") >= F.element_at("_arr", lo_i)) & (
        F.col("_approx") <= F.element_at("_arr", hi_i)
    )
    return agg.select(
        "event_type",
        "exact_med",
        F.when(within, F.lit(1)).otherwise(F.lit(0)).cast("int").alias(
            "approx_within_tol"
        ),
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-aggregate, zero joins — the query
    whose whole cost is the scan, so every predicate must reach the parquet
    reader and the agg must be a single partial+final pass."""
    li = tbl(spark, sf_dir, "lineitem")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & disc.between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(F.col("l_extendedprice").cast(DEC) * disc).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue, count(*) AS n_lines
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume — the nation dimension joins
    the fact tree TWICE (supplier side and customer side), with a
    symmetric pair predicate that can only be applied after both joins.
    Both nation aliases broadcast; the sum runs in DECIMAL, output
    DOUBLE."""
    s = tbl(spark, sf_dir, "supplier")
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    n1 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    vol = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        s.join(li, s["s_suppkey"] == li["l_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(vol).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q8_market_share",
    """
    SELECT l_year,
           CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                     AS DOUBLE)
                / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share,
           count(*) AS n_lines
    FROM (
      SELECT n1.n_name AS supp_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      WHERE p.p_type = 'ECONOMY'
    )
    GROUP BY l_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a product segment's revenue
    per year — conditional DECIMAL sum over the full segment divided by
    the segment total (one final double division, the m5/k5 ratio
    pattern). Dims broadcast; the p_type filter prunes the part side
    before its join."""
    s = tbl(spark, sf_dir, "supplier")
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    national = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0))
    return (
        s.join(li, s["s_suppkey"] == li["l_suppkey"])
        .join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("n1_key"))
        .groupBy(F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            (F.sum(national).cast("double") / F.sum(vol).cast("double"))
            .cast("double")
            .alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: aggregate-of-aggregate — orders per customer
    (LEFT join keeps zero-order customers, count(col) skips their nulls),
    then the distribution of those counts. Two hash aggs; the second
    groups on the first's output, O(distinct counts) rows out."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q18_large_orders",
    """
    SELECT c_name, c_custkey, o_orderkey,
           CAST(total_qty AS BIGINT) AS total_qty,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
    FROM orders
    JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(CAST(l_quantity AS BIGINT)) > 150) big
      ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered aggregate joined back to the fact
    and dim tables — the big-volume-order report. The grouped side shrinks
    to qualifying orders before any join; quantity sums are integer-exact."""
    li = tbl(spark, sf_dir, "lineitem")
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("total_qty").cast("bigint").alias("total_qty"),
            F.col("o_totalprice").cast(DEC).cast("double").alias("total"),
        )
    )


@register(
    "q14_promo_share",
    """
    SELECT CAST(CAST(sum(CASE WHEN p_type = 'ECONOMY'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))
                     ELSE 0 END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS DOUBLE) AS promo_share,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-06-01'
    """,
)
def q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation over a fact⋈dim join — the
    part side broadcasts, both sums run exact in DECIMAL, one final double
    division (the m5/k5 pattern) keeps the ratio engine-exact."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-06-01").cast("timestamp"))
    )
    p = tbl(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    promo = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            (F.sum(promo).cast("double") / F.sum(rev).cast("double"))
            .cast("double")
            .alias("promo_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "j5_salted_join",
    """
    SELECT n.n_name, count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def j5_salted_join(spark, sf_dir):
    """Skew-robust salted join (operators/joins.py): customer.c_nationkey
    is exactly the hot-key shape (25 nations, skewed populations). The
    nation side is replicated over 16 salts, customers scatter uniformly,
    so no reducer owns a whole nation. Oracle = the plain join: salting
    must be invisible in the result."""
    from ..operators.joins import salted_join

    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    joined = salted_join(
        c.withColumnRenamed("c_nationkey", "nk"),
        n.select(F.col("n_nationkey").alias("nk"), "n_name"),
        on=["nk"],
        n_salts=16,
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast(DEC)).cast(DEC).cast("double").alias("total_acctbal"),
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS DOUBLE) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated AVG subquery — decorrelated by hand into
    a per-part aggregate joined back (exactly the rewrite Catalyst performs
    on the SQL form), so the fact table is scanned twice but never per-row.
    l_quantity is integer-valued, so the float avg is exact in any
    summation order and the 0.2x threshold compares identically across
    engines."""
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(thresholds, li["l_partkey"] == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q19_disjunctive_filter",
    """
    SELECT count(*) AS n_lines,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)
    """,
)
def q19_disjunctive_filter(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides. Catalyst must
    factor the common subexpressions per side so each scan still receives
    a pushable predicate (the l_quantity range union reaches lineitem, the
    brand/size union reaches part) instead of evaluating the whole
    disjunction post-join."""
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & q.between(1, 11) & (F.col("p_size") <= 5))
        | ((F.col("p_brand") == "Brand#2") & q.between(10, 20) & (F.col("p_size") <= 10))
        | ((F.col("p_brand") == "Brand#3") & q.between(20, 30) & (F.col("p_size") <= 15))
    )
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(rev).cast("double").alias("revenue"),
    )


@register(
    "q16_excluded_suppliers",
    """
    SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
      AND p_type NOT LIKE 'SMALL%'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    """,
)
def q16_excluded_suppliers(spark, sf_dir):
    """TPC-H Q16 shape: NOT IN value list + NOT LIKE + NOT IN subquery
    (planned as an anti join) + distinct aggregation; the excluded-supplier
    side (negative balance, standing in for the reference schema's
    complaints filter) is tiny and broadcasts."""
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").filter(
        ~F.col("p_brand").isin("Brand#1", "Brand#2")
        & ~F.col("p_type").like("SMALL%")
    )
    bad_s = tbl(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(bad_s), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "j6_nullsafe_join",
    """
    WITH a AS (
      SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lang
      FROM documents WHERE doc_id % 2 = 0
    ), b AS (
      SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lang
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT a.lang AS lang, count(*) AS n_pairs
    FROM a JOIN b ON a.lang IS NOT DISTINCT FROM b.lang
    GROUP BY a.lang
    """,
)
def j6_nullsafe_join(spark, sf_dir):
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other — the semantics a plain equi-join silently drops. Still a
    hash join (the null bucket is just another key), never a nested loop.
    Nulls synthesized in-query so the oracle sees identical input."""
    d = tbl(spark, sf_dir, "documents")
    lang = F.when(F.col("doc_id") % 5 == 0, F.lit(None)).otherwise(F.col("lang"))
    a = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("id_a"), lang.alias("lang_a")
    )
    b = d.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("id_b"), lang.alias("lang_b")
    )
    return (
        a.join(b, a["lang_a"].eqNullSafe(b["lang_b"]))
        .groupBy(F.col("lang_a").alias("lang"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "j7_interval_join",
    """
    WITH iv AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             min(ts) AS start_ts,
             min(ts) + INTERVAL 2 HOUR AS end_ts
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    )
    SELECT iv.user_id, iv.day, count(e.event_id) AS n_in_window,
           CAST(sum(CAST(e.props->>'k' AS BIGINT)) AS BIGINT) AS k_in_window
    FROM iv JOIN events e
      ON e.user_id = iv.user_id
     AND e.ts >= iv.start_ts AND e.ts < iv.end_ts
    GROUP BY iv.user_id, iv.day
    """,
)
def j7_interval_join(spark, sf_dir):
    """Range join done the scale way (operators/range_join.py): each
    user-day's first-2-hours window matched to its events by bucketed
    equi-join + exact refine — a plain hash join, never the
    nested-loop/cartesian Spark plans for raw non-equi conditions
    (asserted by plancheck). Oracle is the naive BETWEEN join."""
    from ..operators.range_join import point_in_interval_join

    ev = parse_props(tbl(spark, sf_dir, "events"))
    iv = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.min("ts").alias("start_ts"),
        (F.min("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    pts = ev.select("user_id", "ts", "event_id", "k")
    joined = point_in_interval_join(
        pts, iv, ["user_id"], "ts", "start_ts", "end_ts", bucket_seconds=3600
    )
    return joined.groupBy("user_id", "day").agg(
        F.count("event_id").alias("n_in_window"),
        F.sum(F.col("k").cast("bigint")).cast("bigint").alias("k_in_window"),
    )


@register(
    "c1_correlated_subquery",
    """
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
    FROM orders o
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) =
          (SELECT max(CAST(o2.o_totalprice AS DECIMAL(18,2)))
           FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def c1_correlated_subquery(spark, sf_dir):
    """Correlated scalar subquery (each customer's priciest order),
    written AS SQL so Catalyst's decorrelation does the rewrite: the
    subquery becomes one aggregate per correlation key + an equi-join —
    never a per-row re-execution. The comparison runs on the exact
    DECIMAL; the output rides DOUBLE."""
    prepare(spark)
    o = tbl(spark, sf_dir, "orders")
    o.createOrReplaceTempView("c1_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
        FROM c1_orders o
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) =
              (SELECT max(CAST(o2.o_totalprice AS DECIMAL(18,2)))
               FROM c1_orders o2 WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "c2_lateral_topn",
    """
    SELECT c.c_custkey, t.o_orderkey,
           CAST(t.total AS DOUBLE) AS total, CAST(t.rk AS INTEGER) AS rk
    FROM customer c, LATERAL (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS total,
             row_number() OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
                                DESC, o_orderkey) AS rk
      FROM orders WHERE o_custkey = c.c_custkey
      ORDER BY total DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def c2_lateral_topn(spark, sf_dir):
    """LATERAL correlated table subquery (each BUILDING customer's 2
    priciest orders) — the join-family member c1's scalar form doesn't
    cover. Written as SQL so Catalyst's DecorrelateInnerQuery rewrites the
    per-row subquery into a ranked window + filter over ONE orders scan —
    never a re-execution per customer row. Top-2 membership and rank are
    decided on the exact DECIMAL; DOUBLE rides out."""
    prepare(spark)
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("c2_customer")
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("c2_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               CAST(t.total AS DOUBLE) AS total, CAST(t.rk AS INTEGER) AS rk
        FROM c2_customer c, LATERAL (
          SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS total,
                 row_number() OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2))
                                    DESC, o_orderkey) AS rk
          FROM c2_orders WHERE o_custkey = c.c_custkey
          ORDER BY total DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


@register(
    "a9_approx_distinct",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           1 AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
)
def a9_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — the 100 TB path when exact
    distinct's expand+shuffle is too expensive. Sketch values are
    engine-specific, so the gated output is the EXACT count plus a flag
    asserting the approx answer landed within 5% (HLL++ at default rsd=5%
    is deterministic for fixed data, so the flag is stable)."""
    ev = tbl(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id").alias("_approx"),
    )
    within = (
        F.abs(F.col("_approx") - F.col("exact_users"))
        / F.col("exact_users")
        <= 0.05
    )
    return agg.select(
        "event_type",
        "exact_users",
        F.when(within, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("approx_within_5pct"),
    )


@register(
    "j4_semi_anti_join",
    """
    SELECT c_custkey, c_name, 'no_orders' AS segment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, c_name, 'recent_buyer' AS segment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= DATE '1998-01-01')
    """,
)
def j4_semi_anti_join(spark, sf_dir):
    """Left-anti + left-semi joins (relational completeness): customers who
    never ordered, and customers with a 1998+ order. Both plan as hash
    joins that keep only the probe side's columns — no row multiplication,
    shuffle keyed on the join key (broadcast-eligible when orders' distinct
    keys are small after the pushed date filter)."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    no_orders = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("segment", F.lit("no_orders"))
    )
    recent = (
        c.join(
            o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date")),
            c["c_custkey"] == o["o_custkey"],
            "left_semi",
        )
        .select("c_custkey", "c_name")
        .withColumn("segment", F.lit("recent_buyer"))
    )
    return no_orders.unionByName(recent)


@register(
    "q4_exists_agg",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-07-01' AND o.o_orderdate < DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_exists_agg(spark, sf_dir):
    """TPC-H Q4 shape (EXISTS → semi join → agg): orders in a quarter with
    at least one returned line, counted per priority. The semi join
    deduplicates lineitem matches for free (no distinct), the returnflag
    filter is pushed to the fact scan, and the final agg is O(priorities)."""
    o = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("date"))
    )
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "pipe1_corpus_filter",
    f"""
    WITH feats AS (
      SELECT doc_id, lang,
             {_tx.lang_id_sql('text')} AS lang_pred,
             {_tx.quality_score_sql('text')} AS quality,
             CAST(len({_tx.tokens_sql('text')}) AS INTEGER) AS n_ws_tokens,
             md5({_dd.norm_text_sql('text')}) AS content_hash,
             text
      FROM documents
    ), rep AS (
      {_tx.repetition_stats_sql('documents', 'doc_id', 'text')}
    ), canon AS (
      SELECT md5({_dd.norm_text_sql('text')}) AS content_hash,
             min(doc_id) AS canonical_id
      FROM documents GROUP BY 1
    )
    SELECT f.doc_id, f.lang, f.n_ws_tokens, r.rep_ratio
    FROM feats f
    JOIN rep r USING (doc_id)
    JOIN canon c ON f.content_hash = c.content_hash AND f.doc_id = c.canonical_id
    WHERE f.lang_pred = f.lang
      AND f.quality >= 0.5
      AND (r.rep_ratio IS NULL OR r.rep_ratio <= 0.2)
      AND f.n_ws_tokens >= 5
    """,
)
def pipe1_corpus_filter(spark, sf_dir):
    """END-TO-END training-corpus filter — the composed pipeline a corpus
    team actually runs, as ONE Catalyst plan: language-confidence gate
    (predicted == declared), quality floor, within-doc repetition cap,
    minimum length, and exact-dedup canonical-only keep. Every stage is a
    Column expression over the same scan; the only joins are the per-doc
    repetition stats (equi on doc_id) and the canonical filter (equi on
    content hash, broadcast-eligible: one row per distinct content).
    At 100 TB this composes into: one corpus scan, one O(distinct-content)
    agg, narrow filters. The tokens column is PERSISTED before the feature
    expressions read it — Spark has no CSE and CollapseProject re-inlines
    staged projections, so without the barrier every feature (lang vote,
    stopword ratio, length gate, trigram stats) re-runs the tokenizer
    (measured 1.4x end-to-end on this query at sf0.1: 3.5s -> 2.5s)."""
    d = tbl(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id",
        "lang",
        "text",
        _tx.tokens(F.col("text")).alias("_toks"),
    ).persist()  # cache: caller-owns
    toks = F.col("_toks")
    tri = _tx.word_trigrams(toks)
    n_tri = F.size(tri)
    feats = staged.select(
        "doc_id",
        "lang",
        _tx.lang_id(F.col("text"), toks=toks).alias("lang_pred"),
        _tx.quality_score(F.col("text"), toks=toks).alias("quality"),
        F.size(toks).cast("int").alias("n_ws_tokens"),
        F.md5(_dd.norm_text(F.col("text"))).alias("content_hash"),
        F.try_divide(
            (n_tri - F.size(F.array_distinct(tri))).cast("double"),
            n_tri.cast("double"),
        ).alias("rep_ratio"),
    )
    canon = _dd.exact_dedup(d, "doc_id", "text").select(
        "content_hash", F.col("canonical_id")
    )
    return (
        feats.join(F.broadcast(canon), "content_hash")
        .filter(
            (F.col("doc_id") == F.col("canonical_id"))
            & (F.col("lang_pred") == F.col("lang"))
            & (F.col("quality") >= 0.5)
            & (F.col("rep_ratio").isNull() | (F.col("rep_ratio") <= 0.2))
            & (F.col("n_ws_tokens") >= 5)
        )
        .select("doc_id", "lang", "n_ws_tokens", "rep_ratio")
    )


@register(
    "d6_dedup_incremental",
    f"""
    SELECT * FROM (
      {_dd.minhash_lsh_pairs_sql("documents", "doc_id", "text", threshold=0.5)}
    ) WHERE id_a % 5 = 0 OR id_b % 5 = 0
    """,
)
def d6_dedup_incremental(spark, sf_dir):
    """Incremental minhash dedup (ext/dedup.py:incremental_minhash_pairs):
    docs with doc_id % 5 == 0 arrive as the NEW batch and are sketched +
    band-joined against the stored sketches of the rest — the old corpus is
    never re-tokenized. Because band hashes are deterministic, the result
    must equal the full-corpus LSH run restricted to pairs touching a new
    doc; the oracle states exactly that."""
    d = tbl(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 5 != 0)
    new = d.filter(F.col("doc_id") % 5 == 0)
    old_sk = _dd.minhash_sketches(old, "doc_id", "text")
    return _dd.incremental_minhash_pairs(old_sk, new, "doc_id", "text", threshold=0.5)


@register(
    "d7_dedup_clusters",
    _dd.cluster_pairs_sql(
        _dd.minhash_lsh_pairs_sql("documents", "doc_id", "text", threshold=0.5)
    ),
)
def d7_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTER assignment (ext/dedup.py:cluster_pairs): connected
    components over the minhash-LSH pair graph via min-label propagation —
    the step that turns pairwise output into canonical keep/drop decisions.
    Rounds = cluster diameter (near-dup clusters are near-cliques, so 2-4);
    each round is one shuffle join + hash agg, labels never hit the driver.
    Oracle: DuckDB recursive-CTE transitive closure."""
    pairs = _dd.minhash_lsh_pairs(
        tbl(spark, sf_dir, "documents"), "doc_id", "text", threshold=0.5
    )
    return _dd.cluster_pairs(pairs)


@register(
    "d8_passage_dedup",
    _dd.passage_dedup_sql("documents", "doc_id", "text"),
)
def d8_passage_dedup(spark, sf_dir):
    """Sub-document exact dedup over fixed 16-word passages
    (ext/dedup.py:passage_dedup) — catches boilerplate shared across
    otherwise-distinct documents. One narrow chunking pass (persisted token
    barrier), one hash agg on md5(passage); no joins."""
    return _dd.passage_dedup(tbl(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "d9_fuzzy_prefix_pairs",
    _dd.fuzzy_prefix_pairs_sql("documents", "doc_id", "text"),
)
def d9_fuzzy_prefix_pairs(spark, sf_dir):
    """Blocked Levenshtein near-dup pairs (ext/dedup.py:fuzzy_prefix_pairs):
    typo-level variants of the same leading text that token-set measures
    (d2/d4) are insensitive to. Equi-join on a 12-char prefix block, edit
    distance over 48-char heads — work bounded by block sizes, not corpus
    size."""
    return _dd.fuzzy_prefix_pairs(tbl(spark, sf_dir, "documents"), "doc_id", "text")


from ..ext import export as _ex  # noqa: E402


@register(
    "s9_shuffle_shards",
    f"""
    WITH s AS (
      SELECT doc_id, n_chars, {_ex.shuffle_pos_sql('doc_id')} AS pos
      FROM documents
    )
    SELECT CAST(pos % {_ex.N_SHARDS} AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(pos) AS first_pos,
           max(pos) AS last_pos
    FROM s GROUP BY 1
    """,
)
def s9_shuffle_shards(spark, sf_dir):
    """Deterministic training-export shuffle (ext/export.py:shuffle_shards):
    shard and order are pure hash functions of the doc id — reproducible
    bit-for-bit, no global sort, hash-uniform shard sizes. The entry
    aggregates the per-shard manifest (count / chars / pos range)."""
    d = _ex.shuffle_shards(tbl(spark, sf_dir, "documents"), "doc_id")
    return d.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("pos").alias("first_pos"),
        F.max("pos").alias("last_pos"),
    )


@register(
    "x20_token_packing",
    _ex.pack_manifest_sql(
        "documents", "doc_id", f"len({_tx.tokens_sql('text')})", budget=512
    ),
)
def x20_token_packing(spark, sf_dir):
    """Sequence-packing manifest (ext/export.py:pack_manifest): documents
    in deterministic shuffle order are concatenated per shard and cut
    every 512 tokens (concat-and-chunk); the entry aggregates per
    (shard, pack). Token counts via the proven cross-engine tokenizer
    (ext/text.py). The cumulative window is per-shard, so no global
    single-partition window exists at any scale."""
    d = tbl(spark, sf_dir, "documents").withColumn(
        "tok", F.size(_tx.tokens(F.col("text"))).cast("bigint")
    )
    m = _ex.pack_manifest(d, "doc_id", "tok", budget=512)
    return m.groupBy("shard_id", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").cast("bigint").alias("pack_tokens"),
    )


@register(
    "s4_embedding_quantize",
    _sim.quantize_int8_sql("embeddings"),
)
def s4_embedding_quantize(spark, sf_dir):
    """Symmetric int8 quantization of the embedding column
    (ext/similarity.py:quantize_int8) — 4x storage compression for the
    serving path; integer codes make the oracle exact."""
    return _sim.quantize_int8(tbl(spark, sf_dir, "embeddings"))


_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_URL = "https?://[A-Za-z0-9./_-]+"


@register(
    "x13_pii_redact",
    f"""
    WITH enriched AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN concat(text, ' contact user', doc_id,
                              '@example.com via https://ex.com/d/', doc_id)
                  ELSE text END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_URL}')) AS INTEGER) AS n_urls,
           regexp_replace(regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                          '{_PII_URL}', '<URL>', 'g') AS text_redacted
    FROM enriched
    """,
)
def x13_pii_redact(spark, sf_dir):
    """PII scrubbing for a training corpus: count + redact emails and URLs
    with dialect-portable regexes (Java and RE2 agree on these classes).
    The fixtures carry no PII, so deterministic addresses are synthesized
    onto every 7th doc IN the query — the oracle rebuilds the same input,
    making the redaction parity check non-vacuous. Pure Column regexp
    chain: scan-bound, no UDF."""
    d = tbl(spark, sf_dir, "documents")
    t = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@example.com via https://ex.com/d/"),
            F.col("doc_id"),
        ),
    ).otherwise(F.col("text"))
    base = d.select("doc_id", t.alias("t"))
    return base.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_PII_EMAIL), 0)).cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PII_URL), 0)).cast("int").alias("n_urls"),
        F.regexp_replace(
            F.regexp_replace("t", _PII_EMAIL, "<EMAIL>"), _PII_URL, "<URL>"
        ).alias("text_redacted"),
    )


@register(
    "x15_scalar_battery",
    """
    SELECT doc_id,
           substring(text, 3, 10) AS sub,
           upper(substring(text, 1, 5)) AS up5,
           replace(substring(text, 1, 20), ' ', '_') AS underscored,
           CAST(strpos(text, 'data') AS INTEGER) AS pos_data,
           reverse(substring(text, 1, 8)) AS rev8,
           lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded,
           repeat('ab', CAST(doc_id % 3 AS INTEGER)) AS rep_ab,
           CAST(ascii(substring(text, 1, 1)) AS INTEGER) AS first_cp,
           left(trim(text), 4) AS left4,
           CASE WHEN length(text) > 100 THEN 'long' ELSE 'short' END AS bucket,
           COALESCE(NULLIF(lang, 'en'), 'default') AS lang_or_default,
           greatest(length(text), 50) AS g, least(length(text), 50) AS l
    FROM documents
    """,
)
def x15_scalar_battery(spark, sf_dir):
    """Scalar string/conditional battery — the everyday function surface
    (substr/replace/locate/pad/repeat/reverse/ascii/trim + CASE/NULLIF/
    COALESCE/greatest/least), pinned cross-engine. All pure Column ops in
    codegen; the point is semantic parity (1-based substring indexing,
    empty-match locate=0, NULLIF null-propagation), not plan shape."""
    d = tbl(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        t.substr(3, 10).alias("sub"),
        F.upper(t.substr(1, 5)).alias("up5"),
        F.replace(t.substr(1, 20), F.lit(" "), F.lit("_")).alias("underscored"),
        F.locate("data", t).cast("int").alias("pos_data"),
        F.reverse(t.substr(1, 8)).alias("rev8"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("padded"),
        F.repeat(F.lit("ab"), (F.col("doc_id") % 3).cast("int")).alias("rep_ab"),
        F.ascii(t.substr(1, 1)).cast("int").alias("first_cp"),
        F.left(F.trim(t), F.lit(4)).alias("left4"),
        F.when(F.length(t) > 100, F.lit("long")).otherwise(F.lit("short")).alias("bucket"),
        F.coalesce(F.nullif(F.col("lang"), F.lit("en")), F.lit("default")).alias(
            "lang_or_default"
        ),
        F.greatest(F.length(t), F.lit(50)).alias("g"),
        F.least(F.length(t), F.lit(50)).alias("l"),
    )


@register(
    "x16_datetime_battery",
    """
    SELECT event_id,
           CAST(year(ts) AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS m,
           CAST(day(ts) AS INTEGER) AS d,
           CAST(dayofyear(ts) AS INTEGER) AS doy,
           CAST(isodow(ts) AS INTEGER) AS iso_dow,
           CAST(hour(ts) AS INTEGER) AS h,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
           CAST(CAST(ts AS DATE) + INTERVAL 7 DAY AS DATE) AS next_week,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INTEGER)
             AS days_since_jan1,
           CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s
    FROM events
    """,
)
def x16_datetime_battery(spark, sf_dir):
    """Date/time battery pinned cross-engine: extraction fields, ISO
    day-of-week (Spark's dayofweek is 1=Sunday, so weekday()+1 supplies the
    ISO convention both engines agree on), truncation, date arithmetic,
    day difference, epoch seconds. UTC session timezone makes these
    engine-independent (session.prepare)."""
    ev = tbl(spark, sf_dir, "events")
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.year(ts).cast("int").alias("y"),
        F.month(ts).cast("int").alias("m"),
        F.dayofmonth(ts).cast("int").alias("d"),
        F.dayofyear(ts).cast("int").alias("doy"),
        (F.weekday(ts) + 1).cast("int").alias("iso_dow"),
        F.hour(ts).cast("int").alias("h"),
        F.date_trunc("month", ts).alias("month_start"),
        F.date_add(ts.cast("date"), 7).alias("next_week"),
        F.datediff(ts.cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_since_jan1"),
        F.unix_timestamp(F.date_trunc("second", ts)).cast("bigint").alias("epoch_s"),
    )


@register(
    "x17_array_battery",
    f"""
    WITH t AS (
      SELECT doc_id, {_tx.tokens_sql('text')} AS arr FROM documents
    )
    SELECT doc_id,
           COALESCE(array_to_string(list_sort(arr)[1:3], '|'), '')
             AS first3_sorted,
           CAST(len(list_distinct(arr)) AS INTEGER) AS n_uniq,
           CAST(CASE WHEN list_contains(arr, 'the') THEN 1 ELSE 0 END AS INTEGER)
             AS has_the,
           CAST(COALESCE(list_position(arr, 'the'), 0) AS BIGINT) AS pos_the,
           CAST(COALESCE(length(array_to_string(arr, '')), 0) AS INTEGER)
             AS total_chars,
           COALESCE(array_to_string(list_transform(arr[1:3], x -> upper(x)), '|'),
                    '') AS up3,
           COALESCE(array_to_string(list_filter(arr, x -> length(x) > 6)[1:2], '|'), '')
             AS long2
    FROM t
    """,
)
def x17_array_battery(spark, sf_dir):
    """Array-function battery over the token arrays: sort, slice, distinct,
    contains, position (Spark returns 0 on miss — DuckDB's NULL coalesced
    to match), transform, filter. Array results ride as '|'-joined strings
    so the cross-engine value hash never depends on array rendering. On
    an EMPTY token array DuckDB's array_to_string returns NULL where
    Spark's concat_ws returns '' — every joined column is COALESCE'd
    (r10 fuzz catch: a zero-token document; the fixture has none)."""
    d = tbl(spark, sf_dir, "documents")
    t = d.select("doc_id", _tx.tokens(F.col("text")).alias("arr"))
    arr = F.col("arr")
    return t.select(
        "doc_id",
        F.concat_ws("|", F.slice(F.array_sort(arr), 1, 3)).alias("first3_sorted"),
        F.size(F.array_distinct(arr)).cast("int").alias("n_uniq"),
        F.when(F.array_contains(arr, "the"), F.lit(1)).otherwise(F.lit(0))
        .cast("int")
        .alias("has_the"),
        F.array_position(arr, "the").cast("bigint").alias("pos_the"),
        F.length(F.concat_ws("", arr)).cast("int").alias("total_chars"),
        F.concat_ws("|", F.transform(F.slice(arr, 1, 3), lambda x: F.upper(x))).alias(
            "up3"
        ),
        F.concat_ws(
            "|", F.slice(F.filter(arr, lambda x: F.length(x) > 6), 1, 2)
        ).alias("long2"),
    )


@register(
    "x18_regexp_groups",
    """
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)ing', 1) AS ing_stem,
           regexp_extract(text, '([0-9]+)', 1) AS first_num,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
           CAST(len(regexp_extract_all(text, '[a-z]+ing')) AS INTEGER) AS n_ing
    FROM documents
    """,
)
def x18_regexp_groups(spark, sf_dir):
    """Regexp capture groups: group-indexed extraction (both engines
    return '' on no-match) plus match counting — the everyday structured
    scrape. Dialect-portable patterns only (no lookarounds: RE2 lacks
    them)."""
    d = tbl(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_extract(t, "([a-z]+)ing", 1).alias("ing_stem"),
        F.regexp_extract(t, "([0-9]+)", 1).alias("first_num"),
        F.regexp_extract(t, "([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.size(F.regexp_extract_all(t, F.lit("[a-z]+ing"), 0)).cast("int").alias("n_ing"),
    )


@register(
    "w4_value_window_functions",
    """
    SELECT event_id, user_id,
           first_value(k) OVER w AS first_k,
           last_value(k) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING) AS final_k,
           nth_value(k, 2) OVER w AS second_k
    FROM (SELECT event_id, ts, user_id, CAST(props->>'k' AS BIGINT) AS k FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w4_value_window_functions(spark, sf_dir):
    """Value window functions: first_value over the default running frame,
    last_value over the FULL partition frame (the default frame stops at
    CURRENT ROW — the classic last_value gotcha, made explicit), and
    nth_value. Full (ts, event_id) ordering keeps all three
    deterministic."""
    from pyspark.sql import Window

    ev = parse_props(tbl(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    k = F.col("k").cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        F.first(k).over(w).alias("first_k"),
        F.last(k).over(w_full).alias("final_k"),
        F.nth_value(k, 2).over(w).alias("second_k"),
    )


@register(
    "w5_sessionize",
    """
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 OR
                  lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT user_id, us,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM o
    )
    SELECT user_id, CAST(session_seq AS INTEGER) AS session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           min(us) AS start_us, max(us) AS end_us,
           max(us) - min(us) AS duration_us
    FROM s GROUP BY user_id, session_seq
    """,
)
def w5_sessionize(spark, sf_dir):
    """Batch sessionization (the gap-based session assignment every
    clickstream/behavior pipeline needs; the streaming twin is
    t5_session_window): a 30-minute inactivity gap opens a new session —
    lag + conditional + running sum over one (user_id) window, then one
    hash agg per session. Exactly one shuffle on user_id serves BOTH window
    passes and the final agg (same partitioning). Epoch-microsecond integer
    math end-to-end, so the oracle is exact; (ts, event_id) is a total
    order per user, making session numbering deterministic."""
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = e.select(
        "user_id",
        us.alias("us"),
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    return sess.groupBy(
        "user_id", F.col("session_seq").cast("int").alias("session_seq")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


@register(
    "x19_ngram_freq",
    _tx.ngram_freq_sql("documents", "text", n=2, k=100),
)
def x19_ngram_freq(spark, sf_dir):
    """Corpus bigram frequency, deterministic top-100
    (ext/text.py:ngram_freq): explode -> one map-side-combined hash agg ->
    TakeOrderedAndProject (per-partition heap, k rows to the driver — never
    a global sort)."""
    return _tx.ngram_freq(tbl(spark, sf_dir, "documents"), "text", n=2, k=100)


@register(
    "x14_decontaminate",
    _tx.decontaminate_flags_sql(
        "documents", "doc_id", "text", bench_pred="doc_id % 97 = 0", n=5
    ),
)
def x14_decontaminate(spark, sf_dir):
    """Benchmark decontamination (ext/text.py:decontaminate_flags): flag
    training docs sharing any word 5-gram with the held-out 'benchmark'
    docs (doc_id % 97 == 0 stands in for an eval set) — the overlap scrub
    every pretraining corpus runs before release. Benchmark grams are a
    broadcast set; the corpus side is one scan + explode."""
    return _tx.decontaminate_flags(
        tbl(spark, sf_dir, "documents"), "doc_id", "text",
        bench_pred="doc_id % 97 = 0", n=5,
    )


@register(
    "a7_salted_agg",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           max(value) AS max_v
    FROM events GROUP BY event_type
    """,
)
def a7_salted_agg(spark, sf_dir):
    """Skew-salted two-stage aggregation (operators/aggregate.py:salted_agg):
    stage 1 spreads each (possibly hot) key over 16 salts, stage 2 refolds
    the algebraic partials. The oracle is the plain GROUP BY — salted must
    equal direct by construction."""
    from ..operators.aggregate import salted_agg

    ev = parse_props(tbl(spark, sf_dir, "events")).select(
        "event_type", "event_id", F.col("k").cast("bigint").alias("k"), "value"
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("event_id", "count"),
            "sum_k": ("k", "sum"),
            "max_v": ("value", "max"),
        },
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("sum_k").cast("bigint").alias("sum_k"),
        "max_v",
    )


@register(
    "a12_salted_count_distinct",
    """
    SELECT user_id, CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY user_id
    """,
)
def a12_salted_count_distinct(spark, sf_dir):
    """Skew-robust distinct counting (operators/aggregate.py:
    salted_count_distinct): the one aggregate family where skew genuinely
    stalls a reducer — the final agg receives one row per DISTINCT value of
    a key — solved by value-derived salting (each distinct value lives in
    exactly one salt cell, so per-cell counts add exactly). Oracle is the
    plain COUNT(DISTINCT): salting must be invisible."""
    from ..operators.aggregate import salted_count_distinct

    ev = tbl(spark, sf_dir, "events").select("user_id", "event_id")
    return salted_count_distinct(ev, ["user_id"], "event_id", n_salts=16)


@register(
    "m7_resize_plan",
    """
    WITH m AS (
      SELECT doc_id,
             CAST(doc_id % 64 + 1 AS INTEGER) AS w,
             CAST(doc_id % 48 + 1 AS INTEGER) AS h,
             CAST(doc_id % 16 + 1 AS INTEGER) AS n_frames
      FROM documents
    )
    SELECT doc_id,
           CAST(CASE WHEN w <= 32 AND h <= 24 THEN w
                     WHEN w * 24 >= h * 32 THEN least(w, 32)
                     ELSE greatest(CAST(floor(w * 24.0 / h) AS INTEGER), 1)
                END AS INTEGER) AS width,
           CAST(CASE WHEN w <= 32 AND h <= 24 THEN h
                     WHEN w * 24 >= h * 32 THEN greatest(CAST(floor(h * 32.0 / w) AS INTEGER), 1)
                     ELSE least(h, 24)
                END AS INTEGER) AS height,
           n_frames,
           CAST(16 AS INTEGER) AS byte_len
    FROM m
    """,
)
def m7_resize_plan(spark, sf_dir):
    """Multimodal resize (ext/multimodal.py:resize) to fit 32x24: the
    aspect-preserving integer dimension plan is JVM Column math (Catalyst
    can prune no-op rows before Python starts); the pixel seam runs the
    Arrow-batched fake backend, payload passes through (byte_len pins it)."""
    d = tbl(spark, sf_dir, "documents")
    resized = _mm.resize(_mm.attach_media(d, "doc_id", "text"), 32, 24)
    return resized.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
        F.length("payload").cast("int").alias("byte_len"),
    )


@register(
    "m8_frame_sample",
    """
    SELECT doc_id,
           CAST(doc_id % 16 + 1 AS INTEGER) AS n_frames,
           CAST(unnest(range(0, doc_id % 16 + 1, 4)) AS INTEGER) AS frame_idx
    FROM documents
    """,
)
def m8_frame_sample(spark, sf_dir):
    """Deterministic every-4th frame sampling plan over 'video' rows
    (ext/multimodal.py:sample_frames) — pure sequence+explode, no Python."""
    d = tbl(spark, sf_dir, "documents")
    sampled = _mm.sample_frames(_mm.attach_media(d, "doc_id", "text"), every_n=4)
    return sampled.select(
        "doc_id", "n_frames", F.col("frame_idx").cast("int").alias("frame_idx")
    )


from ..ml import infer as _inf


@register(
    "m9_mlp_inference",
    _inf.mlp_infer_sql("embeddings"),
)
def m9_mlp_inference(spark, sf_dir):
    """M3's model slot exercised with REAL batched tensor math: a 2-layer
    integer MLP (quantize -> matmul -> relu -> matmul -> argmax) over each
    Arrow record batch via mapInPandas (ml/infer.py). Exact-integer model,
    so the DuckDB twin matches bit-for-bit; the Spark path is the genuine
    BLAS-shaped batch workload the FinBERT seam needs proven
    (batchPipeline.py:134-147)."""
    return _inf.mlp_infer(tbl(spark, sf_dir, "embeddings"))


