"""Text analysis over the `documents` table — all pure Column expressions.

Language-ID, quality scoring, token counting, and document fingerprinting as
a 100 TB corpus pipeline needs them. No Python UDFs: every op is a built-in
expression chain (regexp/array/higher-order functions) that stays inside
whole-stage codegen, so throughput is scan-bound. Each builder has a DuckDB
SQL twin generated from the same constants (stopword lists, regexes, hash
parameters) so the driver oracle can verify values exactly.

The reference's only text op is a scalar-Python cleaning UDF
(/root/reference/airflow/dags/Batch_layer/batchPipeline.py:41-62); these
extend that into the analysis battery a training-data pipeline needs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import FP_BASE, FP_MOD, fp_step_mod, fp_step_mod_sql

TOKEN_SPLIT = "[^a-z0-9]+"
# BPE-ish unit: a letter run, a digit run, or one non-alnum non-space symbol
BPE_UNIT = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
PUNCT = "[^a-zA-Z0-9\\s]"

# tiny per-language stopword lists; deterministic priority order on ties
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "and", "is", "of", "to", "in", "it"),
    "es": ("el", "la", "los", "y", "es", "no", "un", "con"),
    "fr": ("le", "la", "les", "et", "est", "ne", "un", "avec"),
    "zh": ("de5", "shi4", "le5", "bu4", "wo3", "you3", "zai4", "he2"),
}
LANG_ORDER = tuple(sorted(LANG_STOPWORDS))


def tokens(col: Column) -> Column:
    """Lowercased alnum tokens (whitespace/punct split), empties dropped."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda x: x != "")


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT}'),"
        " x -> x <> '')"
    )


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def _hits_sql(toks: str, words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks}, x -> x IN ({inlist})))"


def lang_id(col: Column, toks: Column | None = None) -> Column:
    """Heuristic language ID: most stopword hits wins; ties resolve to the
    alphabetically-first language; zero hits everywhere -> 'und'.

    Pass ``toks`` (a PERSISTED tokens column) when composing with other
    token-consuming features: Spark has no CSE and CollapseProject
    re-inlines staged projections, so without a materialization barrier
    every feature re-runs the tokenizer (see ext/dedup.py)."""
    toks = tokens(col) if toks is None else toks
    scores = {lang: _hits(toks, LANG_STOPWORDS[lang]) for lang in LANG_ORDER}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(LANG_ORDER):  # earliest lang wins ties
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


def lang_id_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    scores = {lang: _hits_sql(toks, LANG_STOPWORDS[lang]) for lang in LANG_ORDER}
    best = f"greatest({', '.join(scores.values())})"
    case = "CASE"
    for lang in LANG_ORDER:
        case += f" WHEN {scores[lang]} = best THEN '{lang}'"
    case += " ELSE 'und' END"
    return (
        f"(SELECT CASE WHEN best = 0 THEN 'und' ELSE {case} END "
        f"FROM (SELECT {best} AS best))"
    )


def token_counts(col: Column) -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish unit count)."""
    ws = F.size(tokens(col))
    bpe = F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_UNIT), 0))
    return ws, bpe


def token_counts_sql(expr: str) -> tuple[str, str]:
    ws = f"len({tokens_sql(expr)})"
    bpe = f"len(regexp_extract_all(lower({expr}), '{BPE_UNIT}'))"
    return ws, bpe


def quality_score(col: Column, toks: Column | None = None) -> Column:
    """Deterministic [0,1]-ish quality: alpha ratio minus punct ratio plus a
    stopword-presence bonus, floored at 0. Single IEEE division per ratio so
    Spark and DuckDB agree bit-for-bit. ``toks`` as in :func:`lang_id`."""
    t = tokens(col) if toks is None else toks
    n = F.length(col).cast("double")
    alpha = F.size(F.regexp_extract_all(col, F.lit("[a-zA-Z]"), 0)).cast("double")
    punct = F.size(F.regexp_extract_all(col, F.lit(PUNCT), 0)).cast("double")
    stop = _hits(t, LANG_STOPWORDS["en"]).cast("double")
    ntok = F.size(t).cast("double")
    score = alpha / n - punct / n + F.least(stop / ntok, F.lit(0.2))
    return F.when(n == 0, F.lit(0.0)).otherwise(F.greatest(score, F.lit(0.0)))


def quality_score_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    stop = _hits_sql(toks, LANG_STOPWORDS["en"])
    return f"""(
      SELECT CASE WHEN n = 0 THEN 0.0 ELSE greatest(
        alpha / n - punct / n + least(stop / ntok, 0.2), 0.0) END
      FROM (SELECT
        CAST(length({expr}) AS DOUBLE) AS n,
        CAST(len(regexp_extract_all({expr}, '[a-zA-Z]')) AS DOUBLE) AS alpha,
        CAST(len(regexp_extract_all({expr}, '{PUNCT}')) AS DOUBLE) AS punct,
        CAST({stop} AS DOUBLE) AS stop,
        CAST(len({toks}) AS DOUBLE) AS ntok)
    )"""


def fingerprint(col: Column) -> Column:
    """Order-sensitive rolling hash over the token sequence:
    acc = (acc * 131 + phash60(tok) % p) % p, p = 1e9+7. Left fold in both
    engines; detects token-level reorderings exact-hash dedup misses."""
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * FP_BASE + fp_step_mod(t)) % FP_MOD,
    )


def fingerprint_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    step = fp_step_mod_sql("t")
    # list_reduce has no initial value; seed with a 0 element up front
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({toks}, t -> {step})), "
        f"(acc, t) -> (acc * {FP_BASE} + t) % {FP_MOD})"
    )


def word_ngrams(t: Column, n: int) -> Column:
    """ALL word n-grams (duplicates kept — they are the signal) from a
    staged tokens column. Same slice/zip_with shape as dedup's shingles:
    ``t`` is mentioned only OUTSIDE lambda bodies, so the tokenizer that
    CollapseProject inlines into it runs O(1) times per row, never per
    gram (see ext/dedup.py for the measured 40x trap)."""
    sz = F.size(t)
    parts = [F.slice(t, j + 1, sz - (n - 1)) for j in range(n)]
    joined = reduce(
        lambda acc, p: F.zip_with(acc, p, lambda a, b: F.concat_ws(" ", a, b)),
        parts,
    )
    return F.when(sz >= n, joined).otherwise(F.array().cast("array<string>"))


def word_ngrams_sql(toks: str, n: int) -> str:
    parts = ", ".join(f"t[i + {j}]" for j in range(n))
    return f"""(
      SELECT CASE WHEN len(t) >= {n}
        THEN list_transform(range(1, len(t) - {n - 2}),
               i -> concat_ws(' ', {parts}))
        ELSE [] END
      FROM (SELECT {toks} AS t))"""


def word_trigrams(t: Column) -> Column:
    return word_ngrams(t, 3)


def word_trigrams_sql(toks: str) -> str:
    return word_ngrams_sql(toks, 3)


def repetition_stats_sql(table: str, id_col: str, text_col: str) -> str:
    tri = word_trigrams_sql(tokens_sql(text_col))
    return f"""
    WITH g AS (
      SELECT {id_col} AS doc_id, {tri} AS tri FROM {table}
    )
    SELECT doc_id,
           CAST(len(tri) AS INTEGER) AS n_trigrams,
           CAST(len(list_distinct(tri)) AS INTEGER) AS n_distinct,
           CASE WHEN len(tri) = 0 THEN NULL
                ELSE CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE) / len(tri)
           END AS rep_ratio
    FROM g
    """


def repetition_stats(df, id_col: str, text_col: str):
    """Within-document repetition (the Gopher-style quality signal): the
    fraction of word 3-grams that are duplicates. High rep_ratio marks
    boilerplate/spam for a training-data filter. Pure Column math, one
    narrow pass — scan-bound at 100 TB. Ratio is one int/int IEEE division,
    engine-exact; docs under 3 tokens have no grams (null ratio)."""
    g = df.select(
        F.col(id_col).alias("doc_id"),
        word_trigrams(tokens(F.col(text_col))).alias("_tri"),
    )
    n_tri = F.size("_tri")
    n_uniq = F.size(F.array_distinct("_tri"))
    return g.select(
        "doc_id",
        n_tri.cast("int").alias("n_trigrams"),
        n_uniq.cast("int").alias("n_distinct"),
        F.try_divide((n_tri - n_uniq).cast("double"), n_tri.cast("double")).alias(
            "rep_ratio"
        ),
    )


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 3):
    """Top-k terms per document by smoothed tf-idf:
    score = tf * (ln((N + 1) / (df + 1)) + 1).

    Plan shape: explode tokens -> (doc, term, tf) hash agg -> term document
    frequencies (vocabulary-sized, broadcast-eligible) -> join -> per-doc
    window top-k. Two shuffles (terms, then docs), both map-side combined.

    The OUTPUT carries only integers (tf, df, rank): the float score is used
    solely for ordering, where cross-engine libm ulp differences cannot flip
    a rank (exact ties have identical (tf, df) and break on the term
    string), so the result is engine-independent.
    """
    from pyspark.sql import Window

    raw = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
    # r13 (guide §2.1/§2.2): cluster DOCUMENTS by doc_id before the
    # explode. hash(doc_id) satisfies both the (doc, term) tf agg's and
    # the per-doc top-k window's required clustering, so the old shape's
    # TWO corpus-sized exchanges (token-row (doc, term, tf) pairs into
    # the agg, then the scored table again for the window) collapse into
    # this ONE exchange of text rows — fewer exchanges and fewer bytes
    # (one ~text-sized row per doc vs ~distinct-terms-per-doc pair rows)
    # at any scale. N comes off `raw` (scan only), not the shuffle.
    base = raw.repartition("doc_id")
    terms = base.select(
        "doc_id", F.explode(tokens(F.col("_text"))).alias("term")
    )
    # persist the (doc, term, tf) table: it feeds BOTH the vocabulary
    # aggregation and the scoring join, and without the barrier each
    # consumer re-runs the tokenize+explode+agg lineage from the scan
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).persist()  # cache: caller-owns
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = raw.agg(F.countDistinct("doc_id").alias("_n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "_score",
            F.col("tf")
            * (F.log((F.col("_n") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("_score"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", "tf", "df", F.col("rn").cast("int").alias("rn"))
    )


def tfidf_top_terms_sql(table: str, id_col: str, text_col: str, k: int = 3) -> str:
    toks = tokens_sql(text_col)
    return f"""
    WITH terms AS (
      SELECT {id_col} AS doc_id, unnest({toks}) AS term FROM {table}
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT count(DISTINCT doc_id) AS _n FROM terms
    ), scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             tf.tf * (ln(CAST(_n + 1 AS DOUBLE) / (dfreq.df + 1)) + 1.0) AS _score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, term, tf, df,
             row_number() OVER (PARTITION BY doc_id ORDER BY _score DESC, term) AS rn
      FROM scored
    )
    SELECT doc_id, term, tf, df, CAST(rn AS INTEGER) AS rn
    FROM ranked WHERE rn <= {k}
    """


def decontaminate_flags(
    df, id_col: str, text_col: str, bench_pred: str, n: int = 5
):
    """Benchmark decontamination: flag training docs that share any word
    n-gram with a held-out benchmark set (the overlap rule used to scrub
    eval contamination from pretraining corpora).

    Plan: distinct n-grams per doc -> explode -> semi-shaped inner join
    against the BROADCAST distinct benchmark-gram set -> per-doc overlap
    count -> left-join back so clean docs report 0. The benchmark side is
    tiny by construction (it's an eval set), so the join is map-side; the
    corpus side is one scan + explode, shuffled only on doc_id for the
    count. Benchmark docs themselves are excluded from the output.
    """
    from pyspark.sql import functions as F

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(bench_pred).alias("_is_bench"),
        word_ngrams(tokens(F.col(text_col)), n).alias("_grams"),
    ).persist()  # cache: caller-owns
    bench_grams = (
        base.filter("_is_bench")
        .select(F.explode(F.array_distinct("_grams")).alias("gram"))
        .distinct()
    )
    train = base.filter("NOT _is_bench")
    overlaps = (
        train.select("doc_id", F.explode(F.array_distinct("_grams")).alias("gram"))
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    return (
        train.select("doc_id")
        .join(overlaps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_grams", F.lit(0)).cast("int").alias("n_shared_grams"),
            F.when(F.coalesce("n_shared_grams", F.lit(0)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("contaminated"),
        )
    )


def decontaminate_flags_sql(
    table: str, id_col: str, text_col: str, bench_pred: str, n: int = 5
) -> str:
    grams = word_ngrams_sql(tokens_sql(text_col), n)
    return f"""
    WITH base AS (
      SELECT {id_col} AS doc_id, ({bench_pred}) AS is_bench,
             list_distinct({grams}) AS grams
      FROM {table}
    ), bench_grams AS (
      SELECT DISTINCT unnest(grams) AS gram FROM base WHERE is_bench
    ), shared AS (
      SELECT t.doc_id, count(*) AS n_shared
      FROM (SELECT doc_id, unnest(grams) AS gram FROM base WHERE NOT is_bench) t
      JOIN bench_grams USING (gram)
      GROUP BY t.doc_id
    )
    SELECT b.doc_id,
           CAST(COALESCE(o.n_shared, 0) AS INTEGER) AS n_shared_grams,
           CAST(CASE WHEN COALESCE(o.n_shared, 0) > 0 THEN 1 ELSE 0 END AS INTEGER)
             AS contaminated
    FROM base b LEFT JOIN shared o ON b.doc_id = o.doc_id
    WHERE NOT b.is_bench
    """


def ngram_freq(df, text_col: str, n: int = 2, k: int = 100):
    """Corpus-wide word n-gram frequency, deterministic top-k — the LM-stats
    / decontamination-index primer (what a benchmark-gram table is built
    from at corpus scale).

    Plan shape: tokenize -> gram (both O(1) per row, see word_ngrams) ->
    explode -> ONE map-side-combined hash agg on gram -> TakeOrderedAndProject
    for the top-k (per-partition heap + driver merge of k rows, never a
    global sort). Shuffle volume is the distinct-gram table; the (count
    DESC, gram ASC) key is a total order, so the top-k SET is deterministic
    under any partitioning — safe for the order-insensitive driver compare."""
    g = df.select(word_ngrams(tokens(F.col(text_col)), n).alias("_g"))
    counts = (
        g.select(F.explode("_g").alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return counts.orderBy(F.desc("n_occurrences"), F.asc("gram")).limit(k)


def ngram_freq_sql(table: str, text_col: str, n: int = 2, k: int = 100) -> str:
    grams = word_ngrams_sql(tokens_sql(text_col), n)
    return f"""
    WITH g AS (SELECT {grams} AS grams FROM {table}),
    ex AS (SELECT unnest(grams) AS gram FROM g)
    SELECT gram, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM ex GROUP BY gram
    ORDER BY n_occurrences DESC, gram ASC LIMIT {k}
    """


def pmi_collocations(df, text_col: str, k: int = 50, min_count: int = 5):
    """Top-k collocations by QUANTIZED pointwise mutual information —
    the association-strength complement to ngram_freq's raw counts
    (frequent pairs are often just frequent words; PMI surfaces pairs
    that co-occur far more than their unigram rates predict — the
    multiword-expression / named-entity primer of a corpus pipeline).

    PMI = log2(N * c(a,b) / (c(a) * c(b))) is quantized to integer math
    with the x26 trick — ``length(bin(x)) = floor(log2 x) + 1`` — so the
    score is ``len(bin(N * cab)) - len(bin(ca * cb))``: floor-log2 of
    the numerator minus floor-log2 of the denominator, exact integers in
    both engines, no transcendental libm in any output column. Products
    stay within BIGINT (counts <= corpus grams ~ 1e9 at 100 TB shard
    granularity; re-shard the stats beyond that).

    Plan shape: one tokenize pass persisted (feeds unigram AND bigram
    counts), two map-side-combined hash aggs, two broadcast-sized joins
    of the bigram table to unigram counts, one 1-row total crossJoin
    (broadcast), TakeOrderedAndProject top-k — no global sort. The
    (score, count, gram) ordering is total, so the top-k set is
    deterministic under any partitioning."""
    base = df.select(tokens(F.col(text_col)).alias("t")).persist()  # cache: caller-owns
    uni = (
        base.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cw"))
    )
    big = (
        base.select(F.explode(word_ngrams(F.col("t"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cab"))
        .filter(F.col("cab") >= min_count)
        .withColumn("a", F.split(F.col("gram"), " ")[0])
        .withColumn("b", F.split(F.col("gram"), " ")[1])
    )
    total = base.select(
        F.sum(F.greatest(F.size("t") - 1, F.lit(0))).cast("bigint").alias("n_total")
    )
    ua = uni.select(F.col("w").alias("a"), F.col("cw").alias("ca"))
    ub = uni.select(F.col("w").alias("b"), F.col("cw").alias("cb"))
    scored = (
        big.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(total))
        .select(
            "gram",
            "cab",
            (
                F.length(F.bin(F.col("n_total") * F.col("cab")))
                - F.length(F.bin(F.col("ca") * F.col("cb")))
            ).cast("bigint").alias("pmi_q"),
        )
    )
    return scored.orderBy(
        F.desc("pmi_q"), F.desc("cab"), F.asc("gram")
    ).limit(k)


def pmi_collocations_sql(table: str, text_col: str, k: int = 50, min_count: int = 5) -> str:
    grams = word_ngrams_sql(tokens_sql(text_col), 2)
    return f"""
    WITH tok AS MATERIALIZED (
      SELECT {tokens_sql(text_col)} AS tk FROM {table}
    ), uni AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS cw
      FROM (SELECT unnest(tk) AS w FROM tok) GROUP BY w
    ), big AS (
      SELECT gram, CAST(count(*) AS BIGINT) AS cab,
             string_split(gram, ' ')[1] AS a,
             string_split(gram, ' ')[2] AS b
      FROM (
        SELECT unnest({word_ngrams_sql('tk', 2)}) AS gram
        FROM tok
      ) GROUP BY gram HAVING count(*) >= {min_count}
    ), tot AS (
      SELECT CAST(sum(greatest(len(tk) - 1, 0)) AS BIGINT) AS n_total FROM tok
    )
    SELECT big.gram, big.cab,
           CAST(length(bin(tot.n_total * big.cab))
                - length(bin(uni_a.cw * uni_b.cw)) AS BIGINT) AS pmi_q
    FROM big
    JOIN uni uni_a ON big.a = uni_a.w
    JOIN uni uni_b ON big.b = uni_b.w
    CROSS JOIN tot
    ORDER BY pmi_q DESC, cab DESC, gram ASC LIMIT {k}
    """
