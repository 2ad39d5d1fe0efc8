"""Deduplication strategies over the `documents` table.

Five strategies a corpus pipeline needs, ordered by cost:

  exact          md5 of normalized text, hash groupBy          1 shuffle
  minhash+LSH    shingle -> k minhashes -> b bands -> bucket   explode + 1
                 self-join -> exact-Jaccard verify               shuffle/join
  simhash        32-bit sign-of-weighted-bit-sums sketch,      1 shuffle +
                 byte-banded candidate join, hamming verify      band join
  n-gram Jaccard char-4-gram sets, blocked all-pairs verify    bounded by
                                                                 block size
  embedding      cosine >= tau within a coarse cell            bounded by
                                                                 cell size

Scale notes (100 TB): nothing here is all-pairs over the corpus — candidate
generation is always a bucket equi-join (LSH band, simhash byte, block key,
IVF cell), so the shuffle keys are the buckets and the worst case is the
largest true duplicate cluster, not n^2. Sketches are plain integer columns
(groupable, writable to parquet) so incremental dedup = sketch new data,
join against the stored sketch table.

All hash math is the portable md5-60bit from .hashing, so the DuckDB oracle
twins (generated from the SAME parameters) produce identical candidates and
survive the driver's value-hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import phash60, phash60_sql
from .text import tokens, tokens_sql

# minhash/LSH parameters: k = bands * rows
MH_BANDS = 4
MH_ROWS = 4
MH_K = MH_BANDS * MH_ROWS
SHINGLE = 3  # words per shingle

SIM_BITS = 32
SIM_BANDS = 4  # 8 bits per band


def norm_text(col):
    """Lowercase, collapse whitespace, trim — the canonical form hashed by
    exact dedup (reference's cleaning UDF normalizes similarly,
    batchPipeline.py:41-52)."""
    return F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))


def norm_text_sql(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup groups: content hash -> canonical (min) id + group size.
    One hash-aggregate; at scale this is the cheapest pass and runs first."""
    h = F.md5(norm_text(F.col(text_col))).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --- minhash + LSH ---------------------------------------------------------


def shingles(col):
    """Distinct SHINGLE-word shingles of the token sequence (1-based slice).
    Docs with < SHINGLE tokens yield an empty array and are dropped by the
    signature step (can't sketch them)."""
    t = tokens(col)
    n = F.size(t)
    idx = F.sequence(F.lit(1), n - (SHINGLE - 1))
    parts = lambda i: [F.element_at(t, i + j) for j in range(SHINGLE)]
    return F.when(
        n >= SHINGLE,
        F.array_distinct(F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(expr: str) -> str:
    t = tokens_sql(expr)
    parts = ", ".join(f"t[i + {j}]" for j in range(SHINGLE))
    return f"""(
      SELECT CASE WHEN len(t) >= {SHINGLE}
        THEN list_distinct(list_transform(
               range(1, len(t) - {SHINGLE - 2}), i -> concat_ws(' ', {parts})))
        ELSE [] END
      FROM (SELECT {t} AS t))"""


def minhash_signature(col):
    """k=MH_K minhash values: min over shingles of seeded phash60."""
    sh = shingles(col)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s: phash60(s, seed=f"mh{i}")))
            for i in range(MH_K)
        ]
    )


def minhash_signature_sql(expr: str) -> str:
    sh = shingles_sql(expr)
    mins = ", ".join(
        f"list_min(list_transform(sh, s -> {phash60_sql('s', seed=f'mh{i}')}))"
        for i in range(MH_K)
    )
    return f"(SELECT [{mins}] FROM (SELECT {sh} AS sh))"


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float
) -> DataFrame:
    """Near-dup pairs via banded minhash, verified by exact shingle Jaccard.

    Plan shape: project sketch -> explode MH_BANDS band hashes -> self-join
    on (band, band_hash) -> distinct candidate pairs -> exact verify. The
    self-join is an equi-join on the band hash, so Catalyst shuffles both
    sides on the bucket key — never a cartesian. Band hash = phash60 of the
    row-concatenated signature slice (classic b/r banding: P[candidate] =
    1-(1-j^r)^b, here r=4 b=4 -> s-curve around j~0.7)."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(F.col(text_col)).alias("sig"),
        shingles(F.col(text_col)).alias("sh"),
    ).filter(F.size("sh") > 0)

    bands = base.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        phash60(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig").getItem(b * MH_ROWS + r)
                                    for r in range(MH_ROWS)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for b in range(MH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sh", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs_sql(table: str, id_col: str, text_col: str, threshold: float) -> str:
    def band_hash(b: int) -> str:
        cat = ", ".join(f"sig[{b * MH_ROWS + r + 1}]" for r in range(MH_ROWS))
        return phash60_sql(f"concat_ws(',', {cat})")

    band_union = "\n      UNION ALL ".join(
        f"SELECT doc_id, sh, {b} AS band, {band_hash(b)} AS bh FROM nonempty"
        for b in range(MH_BANDS)
    )
    return f"""
    WITH base AS (
      SELECT {id_col} AS doc_id,
             {minhash_signature_sql(text_col)} AS sig,
             {shingles_sql(text_col)} AS sh
      FROM {table}
    ), nonempty AS (
      SELECT * FROM base WHERE len(sh) > 0
    ), bands AS (
      {band_union}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
             / len(list_distinct(list_concat(sh_a, sh_b))) AS jaccard
    FROM cand
    WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
             / len(list_distinct(list_concat(sh_a, sh_b))) >= {threshold}
    """


# --- simhash ---------------------------------------------------------------


def simhash_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit simhash per doc: bit i of the sketch is 1 iff the sum over the
    token MULTISET of (2*bit_i(phash60(tok)) - 1) is positive. Explode +
    single groupBy with 32 conditional sums (map-side partial agg), then the
    bits recombine into one bigint — no Python, one shuffle."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).withColumn("th", phash60(F.col("tok")))
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright("th", i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{i}")
            for i in range(SIM_BITS)
        ]
    )
    sim = None
    for i in range(SIM_BITS):
        term = F.when(F.col(f"s{i}") > 0, F.lit(2**i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sim = term if sim is None else sim + term
    return sums.select("doc_id", sim.alias("simhash"))


def simhash_sql(table: str, id_col: str, text_col: str) -> str:
    th = phash60_sql("tok")
    sums = ", ".join(
        f"sum(((th >> {i}) & 1) * 2 - 1) AS s{i}" for i in range(SIM_BITS)
    )
    recomb = " + ".join(
        f"CASE WHEN s{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END"
        for i in range(SIM_BITS)
    )
    return f"""
    WITH toks AS (
      SELECT {id_col} AS doc_id, {th} AS th
      FROM (SELECT {id_col}, unnest({tokens_sql(text_col)}) AS tok FROM {table})
    ), sums AS (
      SELECT doc_id, {sums} FROM toks GROUP BY doc_id
    )
    SELECT doc_id, {recomb} AS simhash FROM sums
    """


def simhash_pairs(df: DataFrame, id_col: str, text_col: str, max_hamming: int) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming. Candidates via
    byte banding (pigeonhole: hamming <= 3 ⇒ at least one of 4 bytes equal),
    verified with bit_count(xor). Equi-join on (band, byte) — LSH-shaped."""
    sh = simhash_df(df, id_col, text_col)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * 8).bitwiseAND(F.lit(255)).alias("byte"),
                    )
                    for b in range(SIM_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.byte")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band", "byte"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("int").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs_sql(table: str, id_col: str, text_col: str, max_hamming: int) -> str:
    band_union = "\n      UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * 8}) & 255 AS byte FROM sh"
        for b in range(SIM_BANDS)
    )
    return f"""
    WITH sh AS ({simhash_sql(table, id_col, text_col)}),
    bands AS (
      {band_union}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM bands a JOIN bands b ON a.band = b.band AND a.byte = b.byte
    WHERE a.doc_id < b.doc_id
      AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


# --- n-gram Jaccard (character level, blocked) -----------------------------

NGRAM_N = 4


def char_ngrams(col, n: int = NGRAM_N):
    """Distinct character n-grams of the normalized text."""
    norm = norm_text(col)
    ln = F.length(norm)
    idx = F.sequence(F.lit(1), ln - (n - 1))
    return F.when(
        ln >= n,
        F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(n)))),
    ).otherwise(F.array().cast("array<string>"))


def char_ngrams_sql(expr: str, n: int = NGRAM_N) -> str:
    norm = norm_text_sql(expr)
    return f"""(
      SELECT CASE WHEN length(s) >= {n}
        THEN list_distinct(list_transform(
               range(1, length(s) - {n - 2}), i -> s[i : i + {n - 1}]))
        ELSE [] END
      FROM (SELECT {norm} AS s))"""


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, block_cols: list[str], threshold: float
) -> DataFrame:
    """Blocked all-pairs char-n-gram Jaccard. The self-join key is the block
    (e.g. (lang, source)); cost is sum over blocks of |block|^2, so block
    choice — not corpus size — bounds the work. Use for the final high-
    precision pass after LSH has shrunk candidates, or on naturally small
    blocks."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in block_cols],
        char_ngrams(F.col(text_col)).alias("ng"),
    ).filter(F.size("ng") > 0)
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(F.array_intersect("a.ng", "b.ng")).cast("double")
    union = F.size(F.array_union("a.ng", "b.ng")).cast("double")
    return (
        a.join(b, block_cols)
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("jaccard"),
        )
    )


def ngram_jaccard_pairs_sql(
    table: str, id_col: str, text_col: str, block_cols: list[str], threshold: float
) -> str:
    on = " AND ".join(f"a.{c} = b.{c}" for c in block_cols)
    jac = (
        "CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)"
        " / len(list_distinct(list_concat(a.ng, b.ng)))"
    )
    return f"""
    WITH base AS (
      SELECT {id_col} AS doc_id, {', '.join(block_cols)},
             {char_ngrams_sql(text_col)} AS ng
      FROM {table}
    ), nonempty AS (SELECT * FROM base WHERE len(ng) > 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, {jac} AS jaccard
    FROM nonempty a JOIN nonempty b ON {on} AND a.doc_id < b.doc_id
    WHERE {jac} >= {threshold}
    """
