"""As-of (most-recent-prior) join — the time-series operator Spark lacks.

The natural query of a market/news engine: attach to every event the most
recent quote at or before its timestamp, per key. Spark has no ASOF JOIN;
the naive formulations are a non-equi range join (O(n*m) BroadcastNestedLoop
or cartesian — dead at scale) or a per-key collect (driver-bound).

Implemented as the union-sort trick, which is one shuffle on the key:

    union(right tagged 1, left tagged 0)
    -> window per key ordered by (ts, tag DESC)
    -> last non-null right value seen so far (ignoreNulls last_value)
    -> keep left rows

Cost = one hash exchange + one per-key sort — the same plan shape as any
windowed aggregation, linear in |left| + |right| and skew-bounded by the
hottest key (salt the key if one instrument dominates). tag DESC makes a
right row at exactly left.ts visible to that left row (ASOF >= semantics,
matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` which verifies this as an
oracle).

Right rows must be unique per (key, ts) for determinism — pre-reduce with
max_by if they are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Left rows + the most recent `value_cols` from `right` with
    right.ts <= left.ts, per key. Left columns pass through; value columns
    are null when no prior right row exists."""
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_r_{v}") for v in value_cols],
    )
    r = right.select(
        *[
            F.col(c) if c in key_cols or c == ts_col else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(1).alias("_tag"),
        *[F.col(v).alias(f"_r_{v}") for v in value_cols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_tag").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        "_tag",
        *[
            F.last(F.col(f"_r_{v}"), ignorenulls=True).over(w).alias(v)
            for v in value_cols
        ],
    )
    return filled.filter(F.col("_tag") == 0).drop("_tag")
