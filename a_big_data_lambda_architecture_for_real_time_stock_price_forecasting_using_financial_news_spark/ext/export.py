"""Training-data EXPORT: deterministic shuffle-sharding and sequence
packing — the last mile of a corpus pipeline, where the cleaned/deduped
corpus becomes the shard files a trainer actually reads.

Why not ``df.orderBy(rand())``: a trainer needs the shuffle to be
REPRODUCIBLE (rebuild shard 17 bit-for-bit after a node loss, resume an
incremental export, audit which shard a document landed in) and
SCALE-OBLIVIOUS (no global sort). Both come from the same trick as hash
sampling (ext/sampling.py): position = portable hash of the document id.

  shuffle_shards   shard_id = pos % n_shards, pos = phash60(seed|id).
                   One narrow projection — membership and order are pure
                   row functions. The physical export is then ONE hash
                   shuffle on shard_id + sortWithinPartitions(pos): no
                   global sort, no skew (hash-uniform shards), 100 TB safe.
  pack_manifest    within-shard greedy concat-and-chunk packing: documents
                   in shuffle order are concatenated and cut every
                   ``budget`` tokens (the GPT-style "pack sequences, split
                   at the boundary" layout). pack_id = floor(cum_tokens
                   before doc / budget). The window is partitioned BY SHARD
                   — each shard is bounded, so no single-partition global
                   window exists anywhere (the scale trap this module is
                   designed around).
  write_shards     the physical writer: repartition(shard) +
                   sortWithinPartitions(pos) + partitioned parquet.

Reference anchor: the reference exports its batch view as one
Elasticsearch index write (Batch_layer/batchView.py) — no sharding story;
this module is the corpus-scale generalization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import phash60, phash60_sql

N_SHARDS = 32


def shuffle_pos(id_col: str, seed: str = "shard") -> Column:
    """Deterministic 60-bit shuffle position of a document."""
    return phash60(F.col(id_col).cast("string"), seed=seed)


def shuffle_pos_sql(id_col: str, seed: str = "shard") -> str:
    return phash60_sql(f"CAST({id_col} AS VARCHAR)", seed=seed)


def shuffle_shards(
    df: DataFrame, id_col: str, n_shards: int = N_SHARDS, seed: str = "shard"
) -> DataFrame:
    """Add (pos, shard_id): a reproducible global shuffle assignment.

    Membership and order are pure functions of the id — stable across
    partitioning, runs, Spark versions, and supersets of the input (an
    incremental export re-derives identical placements for old docs)."""
    pos = shuffle_pos(id_col, seed)
    return df.withColumn("pos", pos).withColumn(
        "shard_id", (pos % n_shards).cast("bigint")
    )


def pack_manifest(
    df: DataFrame,
    id_col: str,
    tok_col: str,
    budget: int,
    n_shards: int = N_SHARDS,
    seed: str = "shard",
) -> DataFrame:
    """Packing manifest: which pack of which shard each document starts in.

    Documents are laid out in shuffle order within their shard and the
    concatenated token stream is cut every ``budget`` tokens, so
    ``pack_id = floor(tokens_before_doc / budget)`` — the concat-and-chunk
    layout. Ties in ``pos`` (two ids hashing equal in 60 bits) are broken
    by id, so the manifest is total-order deterministic, not just
    probabilistically so. The cumulative window is per-shard: state is
    bounded by shard size, never by corpus size."""
    s = shuffle_shards(df, id_col, n_shards, seed)
    w = (
        Window.partitionBy("shard_id")
        .orderBy("pos", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tok_col).over(w), F.lit(0))
    return s.withColumn(
        "pack_id", F.floor(cum_before / F.lit(budget)).cast("bigint")
    )


def pack_manifest_sql(
    table: str,
    id_col: str,
    tok_expr: str,
    budget: int,
    n_shards: int = N_SHARDS,
    seed: str = "shard",
) -> str:
    """DuckDB twin of :func:`pack_manifest` (aggregated per pack — the
    registry entry's shape)."""
    pos = shuffle_pos_sql(id_col, seed)
    return f"""
    WITH s AS (
      SELECT {id_col}, {tok_expr} AS tok, {pos} AS pos,
             CAST({pos} % {n_shards} AS BIGINT) AS shard_id
      FROM {table}
    ), c AS (
      SELECT shard_id, tok,
             CAST(floor(coalesce(sum(tok) OVER (
               PARTITION BY shard_id ORDER BY pos, {id_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) / {budget}) AS BIGINT) AS pack_id
      FROM s
    )
    SELECT shard_id, pack_id,
           count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS pack_tokens
    FROM c GROUP BY shard_id, pack_id
    """


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int = N_SHARDS,
    seed: str = "shard",
) -> None:
    """Physical export: one hash shuffle on shard_id, shuffle-order sort
    inside each shard, one parquet directory per shard. No global sort;
    shard sizes are hash-uniform so no writer is a straggler."""
    s = shuffle_shards(df, id_col, n_shards, seed)
    (
        s.repartition(n_shards, "shard_id")
        # shard_id leads the sort: the partitioned-file writer requires its
        # input sorted by the partition columns and would otherwise insert
        # its own Sort(shard_id), destroying the pos order inside each file
        .sortWithinPartitions("shard_id", "pos", id_col)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
