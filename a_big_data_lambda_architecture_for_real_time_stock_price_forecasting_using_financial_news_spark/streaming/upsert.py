"""Keyed view maintenance: the engine-internal replacement for the
reference's Elasticsearch painless-script upserts (SURVEY §2.2 K1/K4/K5,
§2.5 A3/A4, §2.4 J2).

Reference behavior being replaced:
- K1: ``es.mapping.id=Date`` → doc overwrite per key (yfConsumer.py:52-65);
- K4: painless script sets the stock column-half from the newest row,
  preserving sentiment fields (yfConsumerStream.py:57-87);
- K5: painless script merges the sentiment column-half with an incremental
  average (twitterConsumerStream.py:94-127);
- J2: the two scripts racing on the same doc = a cross-stream keyed merge.

Design: a :class:`KeyedParquetView` is a versioned parquet directory
(``v=N`` subdirs + ``_CURRENT`` pointer). Each merge writes a NEW version
and flips the pointer — readers never see partial writes, and a crashed
merge leaves the previous version intact. ``foreachBatch`` sinks record the
last applied ``batch_id`` per version, making replays after checkpoint
recovery no-ops (exactly-once effect on an at-least-once channel).

Scale: merges are DataFrame full-outer joins on the key — shuffle on the
key only, no driver collect. On a real deployment the same merge functions
drive Delta/Iceberg ``MERGE INTO``; plain parquet versioning keeps this
repo dependency-free. For date-keyed views the rewrite cost is bounded by
partitioning the view on the key and merging only touched partitions.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import last_write_wins


def merge_halves(
    cur: DataFrame, batch: DataFrame, key_cols: list[str], half_cols: list[str]
) -> DataFrame:
    """Pure K4/J2 merge: ``batch`` owns ``half_cols`` (newest wins), every
    other non-key column is preserved from ``cur``; unmatched keys insert
    with nulls for the absent half. One full-outer shuffle join on the key."""
    other_cols = [c for c in cur.columns if c not in half_cols and c not in key_cols]

    def half(h):
        # a column may exist on only one side (the view may predate this
        # half, or the batch may carry a partial half)
        if h in batch.columns and h in cur.columns:
            return F.coalesce(F.col(f"b.{h}"), F.col(f"c.{h}")).alias(h)
        if h in batch.columns:
            return F.col(f"b.{h}").alias(h)
        return F.col(f"c.{h}").alias(h)

    b, c = batch.alias("b"), cur.alias("c")
    cond = [F.col(f"b.{k}") == F.col(f"c.{k}") for k in key_cols]
    return c.join(b, cond, "full_outer").select(
        *[F.coalesce(F.col(f"b.{k}"), F.col(f"c.{k}")).alias(k) for k in key_cols],
        *[half(h) for h in half_cols],
        *[F.col(f"c.{o}").alias(o) for o in other_cols],
    )


def merge_mean_states(
    cur: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    sum_col: str = "sum_v",
    cnt_col: str = "cnt_v",
    mean_col: str = "mean_v",
) -> DataFrame:
    """Pure K5 merge with correct semantics: (sum, count) states add;
    mean = merged_sum / merged_count. Non-state columns of ``cur`` (e.g.
    the stock column-half sharing the speed-view row, reference
    twitterConsumerStream.py:94-107 'keep stock fields') pass through."""
    state_cols = {sum_col, cnt_col, mean_col, *key_cols}
    other_cols = [c for c in cur.columns if c not in state_cols]
    # the view may not have the state half yet (first sentiment batch into a
    # stock-only speed view): absent state reads as zero
    cur_state = lambda col: (
        F.coalesce(F.col(f"c.{col}"), F.lit(0)) if col in cur.columns else F.lit(0)
    )
    b, c = batch.alias("b"), cur.alias("c")
    cond = [F.col(f"b.{k}") == F.col(f"c.{k}") for k in key_cols]
    merged = c.join(b, cond, "full_outer").select(
        *[F.coalesce(F.col(f"b.{k}"), F.col(f"c.{k}")).alias(k) for k in key_cols],
        (F.coalesce(F.col(f"b.{sum_col}"), F.lit(0)) + cur_state(sum_col)).alias(sum_col),
        (F.coalesce(F.col(f"b.{cnt_col}"), F.lit(0)) + cur_state(cnt_col)).alias(cnt_col),
        *[F.col(f"c.{o}").alias(o) for o in other_cols],
    )
    # try_divide: a key with an empty (0, 0) state has no mean (ANSI-safe)
    return merged.withColumn(mean_col, F.try_divide(F.col(sum_col), F.col(cnt_col)))


class KeyedParquetView:
    """A keyed materialized view over versioned parquet."""

    def __init__(self, spark: SparkSession, path: str, key_cols: list[str]):
        self.spark = spark
        self.path = path
        self.key_cols = key_cols
        os.makedirs(path, exist_ok=True)

    # -- version bookkeeping ------------------------------------------------
    def _pointer(self) -> dict:
        p = os.path.join(self.path, "_CURRENT")
        if not os.path.exists(p):
            return {"version": 0, "batch_ids": {}}
        with open(p) as fh:
            return json.load(fh)

    def _flip(self, version: int, batch_id: int, writer: str) -> None:
        cur = self._pointer()
        ids = dict(cur.get("batch_ids", {}))
        ids[writer] = batch_id
        tmp = os.path.join(self.path, "_CURRENT.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": version, "batch_ids": ids, "ts": time.time()}, fh)
        os.replace(tmp, os.path.join(self.path, "_CURRENT"))

    def last_batch_id(self, writer: str = "default") -> int:
        """Replay watermark PER WRITER: each StreamingQuery numbers its own
        micro-batches from 0, so two streams merging into one view (the J2
        speed-view scenario) must not dedupe each other's batch ids."""
        return self._pointer().get("batch_ids", {}).get(writer, -1)

    def read(self) -> DataFrame | None:
        cur = self._pointer()
        if cur["version"] == 0:
            return None
        return self.spark.read.parquet(os.path.join(self.path, f"v={cur['version']}"))

    def _write_version(self, df: DataFrame, batch_id: int, writer: str) -> None:
        cur = self._pointer()
        nxt = cur["version"] + 1
        df.write.mode("overwrite").parquet(os.path.join(self.path, f"v={nxt}"))
        self._flip(nxt, batch_id, writer)

    # -- merge strategies ---------------------------------------------------
    def merge_overwrite_by_key(
        self, batch: DataFrame, order_col, batch_id: int = -1, writer: str = "default"
    ) -> None:
        """K1/A3: keyed last-write-wins. Dedup the batch per key (latest
        wins), union with current, LWW again. Idempotent: replaying the same
        batch reproduces the same version content."""
        if batch_id >= 0 and batch_id <= self.last_batch_id(writer):
            return  # replay after checkpoint recovery
        fresh = last_write_wins(batch, *self._kc(), order_col)
        cur = self.read()
        merged = fresh if cur is None else last_write_wins(
            cur.unionByName(fresh), *self._kc(), order_col
        )
        self._write_version(merged, batch_id, writer)

    def merge_column_halves(
        self,
        batch: DataFrame,
        half_cols: list[str],
        batch_id: int = -1,
        writer: str = "default",
    ) -> None:
        """K4/J2: the incoming batch owns ``half_cols``; other columns are
        preserved from the current view (painless 'set stock fields, keep
        sentiment fields'). Missing keys insert with nulls for the other
        half (the reference's upsert-as-is branch)."""
        if batch_id >= 0 and batch_id <= self.last_batch_id(writer):
            return
        cur = self.read()
        merged = batch if cur is None else merge_halves(cur, batch, self.key_cols, half_cols)
        self._write_version(merged, batch_id, writer)

    def merge_incremental_mean(
        self,
        batch: DataFrame,
        sum_col: str = "sum_v",
        cnt_col: str = "cnt_v",
        mean_col: str = "mean_v",
        batch_id: int = -1,
        writer: str = "default",
    ) -> None:
        """K5/A4 — the *correct* incremental mean: state is (sum, count) per
        key; merged mean = (s1+s2)/(c1+c2). Non-state columns of the current
        view (e.g. the stock half living in the same speed-view row) are
        preserved. The reference's pairwise ``(avg_old+avg_new)/2``
        recurrence (twitterConsumerStream.py:100-106) is order-sensitive and
        biased; see ``operators.aggregate.pairwise_mean_compat`` for the
        bug-compat fold."""
        if batch_id >= 0 and batch_id <= self.last_batch_id(writer):
            return
        cur = self.read()
        if cur is None:
            merged = batch.withColumn(mean_col, F.col(sum_col) / F.col(cnt_col))
        else:
            merged = merge_mean_states(
                cur.drop(mean_col), batch, self.key_cols, sum_col, cnt_col, mean_col
            )
        self._write_version(merged, batch_id, writer)

    def _kc(self):
        if len(self.key_cols) == 1:
            return [self.key_cols[0]]
        return [F.struct(*self.key_cols)]


def foreach_batch_lww(view: KeyedParquetView, order_col: str, writer: str = "default"):
    """K1 sink: streaming keyed append with last-write-wins semantics."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        view.merge_overwrite_by_key(batch_df, order_col, batch_id=batch_id, writer=writer)

    return fn


def foreach_batch_halves(
    view: KeyedParquetView, half_cols: list[str], writer: str = "default"
):
    """K4/K5 sink: column-half upsert."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        view.merge_column_halves(batch_df, half_cols, batch_id=batch_id, writer=writer)

    return fn
