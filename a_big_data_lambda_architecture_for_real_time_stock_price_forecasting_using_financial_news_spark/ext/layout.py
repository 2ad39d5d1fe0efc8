"""Multi-dimensional data LAYOUT: Z-order (Morton) clustering keys.

At 100 TB the scan is the cost, and the scan is only cheap if the files'
min/max statistics prune. Sorting by ONE column clusters that column and
destroys the other: a query filtering on `supplier` after a layout sorted
by `part` reads everything. The Z-order key interleaves the bits of both
dimensions, so files cover small RECTANGLES of the key space and parquet
row-group stats prune on EITHER predicate column.

This is a pure bit-arithmetic column (whole-stage codegen, no shuffle to
COMPUTE; the physical re-layout is one `repartitionByRange` on the key —
a range shuffle that replaces, not adds to, the write's existing
partitioning pass). The same expression is generated for DuckDB so the
key — and therefore the bucket assignment the oracle checks — is
bit-identical cross-engine.

Reference anchor: the reference writes its batch view as one unsorted
Elasticsearch bulk index (Batch_layer/batchView.py) — no layout story;
this module is what a parquet lake at corpus scale needs instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 8  # each dimension is reduced mod 2^BITS before interleaving


def morton_key(d1: Column, d2: Column, bits: int = BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: d1's bit b
    lands at position 2b+1, d2's at 2b — the classic Morton curve."""
    acc: Column | None = None
    for b in range(bits):
        hi = F.shiftleft(F.shiftright(d1, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        lo = F.shiftleft(F.shiftright(d2, b).bitwiseAND(F.lit(1)), 2 * b)
        part = hi + lo
        acc = part if acc is None else acc + part
    assert acc is not None
    return acc


def morton_key_sql(d1: str, d2: str, bits: int = BITS) -> str:
    """DuckDB twin of :func:`morton_key` (same bit ops, same order)."""
    parts = []
    for b in range(bits):
        parts.append(f"((({d1} >> {b}) & 1) << {2 * b + 1})")
        parts.append(f"((({d2} >> {b}) & 1) << {2 * b})")
    return " + ".join(parts)


def zorder_bucket(d1: Column, d2: Column, n_bucket_bits: int = 8, bits: int = BITS) -> Column:
    """Bucket = the Morton key's top ``n_bucket_bits`` bits: contiguous
    key ranges, i.e. the file boundaries a range-partitioned writer would
    produce. Each bucket covers a 2^(bits - n_bucket_bits/2)-sided square
    of (d1, d2) space — the locality the per-bucket min/max stats prove."""
    return F.shiftright(morton_key(d1, d2, bits), 2 * bits - n_bucket_bits)


def zorder_bucket_sql(d1: str, d2: str, n_bucket_bits: int = 8, bits: int = BITS) -> str:
    return f"(({morton_key_sql(d1, d2, bits)}) >> {2 * bits - n_bucket_bits})"


def write_zordered(
    df: DataFrame,
    path: str,
    d1: str,
    d2: str,
    n_files: int = 64,
    bits: int = BITS,
) -> None:
    """Physical Z-ordered export: range-partition on the Morton key (one
    range shuffle — sampled split points, so skewed key densities still
    yield even files), sort within each file by the key, write parquet.
    Row-group min/max stats of d1 AND d2 are then both tight, so scans
    filtering either column prune files."""
    keyed = df.withColumn(
        "_zkey", morton_key(F.col(d1), F.col(d2), bits)
    )
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
