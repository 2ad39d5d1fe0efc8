"""Similarity search over the `embeddings` table (array<float>, 64-dim).

Two query paths plus a near-dup pass:

  brute-force top-k   broadcast the (small) query set, score every corpus
                      vector, per-query top-k window. O(Q*N) — exact
                      baseline; at 100 TB this is the recall yardstick run
                      on samples, not the serving path.
  IVF top-k           coarse-quantize every vector into a sign-bit cell
                      (first IVF_DIMS dimensions), probe only the query's
                      cell: equi-join on cell id, O(Q*N/cells) expected.
                      Cells are data-independent (no training step) so the
                      same SQL is the oracle; a learned k-means coarse
                      quantizer drops in by replacing `ivf_cell`.
  near-dup pairs      cosine >= tau inside a coarse cell (here the fixture
                      `label`) — the embedding leg of dedup.

Float determinism: cosine is computed as explicit left-fold dot/norm over
float->double casts (`F.aggregate` in Spark, `list_reduce` in DuckDB, both
sequential), so both engines produce bit-identical doubles and the driver's
value-hash compare holds. Built-in reducers (DuckDB list_dot_product etc.)
are NOT used in oracles because their summation order is unspecified.

All expressions are JVM-side higher-order functions — no Python worker in
the scoring loop. At 64 dims the fold is ~128 fused ops/row inside codegen;
for much wider vectors switch to a pandas_udf with numpy dot (Arrow-batched).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

IVF_DIMS = 6  # 2^6 = 64 cells


def _spread_corpus(df: DataFrame) -> DataFrame:
    """Round-robin repartition for under-partitioned (single-file) corpora —
    same rationale as dedup._spread; no-op when the source has real files."""
    slots = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(slots, 8):
        return df.repartition(min(slots, 32))
    return df


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _fold_sum_sql(list_expr: str) -> str:
    # seed the fold with 0.0 via prepend: matches F.aggregate's zero term
    return f"list_reduce(list_prepend(0.0, {list_expr}), (acc, x) -> acc + x)"


def dot_sql(a: str, b: str) -> str:
    # index-based zip: DuckDB's list_zip yields structs whose field access
    # is clunky in lambdas; range indexing matches Spark's zip_with order
    return _fold_sum_sql(
        f"list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))"
    )


def norm_sql(a: str) -> str:
    return f"sqrt({_fold_sum_sql(f'list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))')})"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def ivf_cell(emb: Column, dims: int = IVF_DIMS) -> Column:
    """Data-independent coarse cell: sign bits of the first `dims` dims."""
    cell = F.lit(0)
    for i in range(dims):
        cell = cell + F.when(F.element_at(emb, i + 1) > 0, F.lit(2**i)).otherwise(F.lit(0))
    return cell


def ivf_cell_sql(emb: str, dims: int = IVF_DIMS) -> str:
    return " + ".join(
        f"CASE WHEN {emb}[{i + 1}] > 0 THEN {2**i} ELSE 0 END" for i in range(dims)
    )


def topk_bruteforce(
    corpus: DataFrame, queries: DataFrame, k: int, id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x full corpus scan.

    The query side is explicitly broadcast, so the plan is a single pass
    over the corpus with no shuffle of the big side; the window top-k then
    shuffles only Q*N score rows — at scale, pre-aggregate with a partial
    top-k per partition before the window if Q*N is large."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"),
            norm(F.col(emb_col)).alias("q_norm"),
        )
    )
    c = _spread_corpus(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb"))
    ).withColumn("c_norm", norm(F.col("c_emb")))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # norms are computed once per input row BELOW the join (not once per
        # pair); dot/(q_norm*c_norm) is value-identical to dot/(|a|*|b|)
        .withColumn("score", dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def topk_bruteforce_sql(
    table: str, query_pred: str, k: int, id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    cos = cosine_sql("q.q_emb", "c.c_emb")
    return f"""
    WITH q AS (
      SELECT {id_col} AS query_id, {emb_col} AS q_emb FROM {table} WHERE {query_pred}
    ), c AS (
      SELECT {id_col} AS neighbor_id, {emb_col} AS c_emb FROM {table}
    ), scored AS (
      SELECT q.query_id, c.neighbor_id, {cos} AS score
      FROM q CROSS JOIN c WHERE q.query_id <> c.neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, score, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {k}
    """


def topk_ivf(
    corpus: DataFrame, queries: DataFrame, k: int, id_col: str = "vec_id",
    emb_col: str = "embedding", dims: int = IVF_DIMS,
) -> DataFrame:
    """Approximate top-k probing only the query's coarse cell. The join is
    an equi-join on cell id, so Catalyst broadcasts the (small) query side
    and the corpus shuffles at most once on cell — skewed cells are AQE's
    problem, empty candidate sets mean fewer than k results (expected ANN
    behavior, measured as recall vs. topk_bruteforce)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).alias("q_emb"),
            norm(F.col(emb_col)).alias("q_norm"),
            ivf_cell(F.col(emb_col), dims).alias("cell"),
        )
    )
    c = _spread_corpus(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("c_emb"))
    ).select(
        "neighbor_id",
        "c_emb",
        norm(F.col("c_emb")).alias("c_norm"),
        ivf_cell(F.col("c_emb"), dims).alias("cell"),
    )
    scored = (
        q.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def topk_ivf_sql(
    table: str, query_pred: str, k: int, id_col: str = "vec_id",
    emb_col: str = "embedding", dims: int = IVF_DIMS,
) -> str:
    cos = cosine_sql("q.q_emb", "c.c_emb")
    return f"""
    WITH q AS (
      SELECT {id_col} AS query_id, {emb_col} AS q_emb,
             {ivf_cell_sql(emb_col, dims)} AS cell
      FROM {table} WHERE {query_pred}
    ), c AS (
      SELECT {id_col} AS neighbor_id, {emb_col} AS c_emb,
             {ivf_cell_sql(emb_col, dims)} AS cell
      FROM {table}
    ), scored AS (
      SELECT q.query_id, c.neighbor_id, {cos} AS score
      FROM q JOIN c ON q.cell = c.cell AND q.query_id <> c.neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, score, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= {k}
    """


def embedding_near_dup(
    df: DataFrame, threshold: float, cell_col: str = "label",
    id_col: str = "vec_id", emb_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a coarse cell (blocked like
    the text dedup passes: the self-join key is the cell)."""
    base = _spread_corpus(
        df.select(
            F.col(id_col).alias("vid"), F.col(cell_col).alias("cell"),
            F.col(emb_col).alias("emb"),
        )
    ).withColumn("nrm", norm(F.col("emb")))
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, "cell")
        .filter(F.col("a.vid") < F.col("b.vid"))
        .withColumn(
            "score",
            dot(F.col("a.emb"), F.col("b.emb")) / (F.col("a.nrm") * F.col("b.nrm")),
        )
        .filter(F.col("score") >= threshold)
        .select(
            F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"),
            F.col("score"),
        )
    )


def embedding_near_dup_sql(
    table: str, threshold: float, cell_col: str = "label",
    id_col: str = "vec_id", emb_col: str = "embedding",
) -> str:
    cos = cosine_sql("a.emb", "b.emb")
    return f"""
    WITH base AS (
      SELECT {id_col} AS vid, {cell_col} AS cell, {emb_col} AS emb FROM {table}
    )
    SELECT a.vid AS id_a, b.vid AS id_b, {cos} AS score
    FROM base a JOIN base b ON a.cell = b.cell AND a.vid < b.vid
    WHERE {cos} >= {threshold}
    """


# --- int8 quantization ------------------------------------------------------


def quantize_int8(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization: code_i = floor(x_i/m*127+0.5)
    with m = max|x| — the storage/serving compression step of an embedding
    pipeline (4x smaller than float32, SIMD-friendly dot products).

    Shape: ZERO-shuffle, zero-join single pass. The per-vector max is an
    `array_max(transform(...))` column staged in the projection BELOW the
    posexplode — the Generate keeps it as a plain attribute, so it is
    evaluated once per VECTOR, never per element (mentioning the max
    expression inside the per-element arithmetic would re-run it once per
    element — the measured lambda-inlining trap, see ext/dedup.py). An
    earlier shape computed the max as a groupBy + `F.broadcast` join-back:
    correct, but the "small" side has one row per corpus vector, and at
    billions of vectors that broadcast pins the whole corpus into every
    executor — the projected-column form removes the shuffle AND the OOM.
    floor(+0.5) not round(): Spark rounds HALF_UP, DuckDB rounds half away
    from zero — floor is the same function in both engines. Zero vectors
    (m = 0) are dropped.
    """
    base = df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("e"),
        F.array_max(
            F.transform(F.col(vec_col), lambda v: F.abs(v.cast("double")))
        ).alias("m"),
    ).filter(F.col("m") > 0)
    return base.select("vec_id", "m", F.posexplode("e")).select(
        "vec_id",
        (F.col("pos") + 1).cast("int").alias("pos"),
        F.floor(F.col("col").cast("double") / F.col("m") * 127 + F.lit(0.5))
        .cast("int")
        .alias("code"),
    )


def quantize_int8_sql(table: str, id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    return f"""
    WITH base AS (
      SELECT {id_col} AS vec_id,
             list_transform({vec_col}, v -> CAST(v AS DOUBLE)) AS e
      FROM {table}
    ), withm AS (
      SELECT vec_id, e, list_max(list_transform(e, v -> abs(v))) AS m FROM base
    )
    SELECT vec_id, CAST(i AS INTEGER) AS pos,
           CAST(floor(e[i] / m * 127 + 0.5) AS INTEGER) AS code
    FROM withm, unnest(range(1, len(e) + 1)) AS t(i)
    WHERE m > 0
    """
