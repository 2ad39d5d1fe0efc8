"""Join strategies for skewed and co-located data (SURVEY §2.4 at 100 TB).

Catalyst + AQE already handle the common cases: broadcast for small sides,
`spark.sql.adaptive.skewJoin` splits oversized sort-merge partitions at
runtime. The gap is a HOT KEY on a join where the other side is too big to
broadcast but AQE's split still leaves one straggler: salting fixes it
structurally. `salted_join` replicates the NON-skewed side ``n_salts``
times (one copy per salt) and scatters the skewed side's rows uniformly
over the salts, so the hot key's rows land on ``n_salts`` reducers instead
of one. Cost: the non-skewed side's shuffle volume × n_salts — use it only
when profiling shows a straggler (AQE first, salt second).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys in ``skewed``: scatter ``skewed`` over
    ``n_salts`` sub-keys, replicate ``other`` across all salts, join on
    (key, salt). Result equals the plain join exactly (every (key, salt)
    pair exists on the replicated side). Supported ``how``: inner / left —
    semantics where replication cannot duplicate unmatched rows."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # Deterministic per-row salt: monotonically_increasing_id() is evaluated
    # before the shuffle and changes across task retries, which can duplicate
    # or drop rows when only part of a stage is recomputed. Hashing the row's
    # own values reproduces the same salt on every recomputation.
    salt_s = F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts)).cast("int")
    s = skewed.withColumn("_salt", salt_s)
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = s.join(o, on + ["_salt"], how)
    return out.drop("_salt")
