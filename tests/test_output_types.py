"""Suite-wide output-boundary invariant (VERDICT r1): no registered query
may emit a DECIMAL column — decimal trailing-zero rendering differs across
engines and flaps the driver's value hash even when values are exact.
DECIMAL stays internal; outputs pin DOUBLE (plans/registry.py:dec2dbl)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import DecimalType

import __spark_entry__ as entrymod


# t6 executes a real streaming query inside its builder; its output schema
# is pinned by its own test and it emits no decimals by construction.
SKIP_EXEC = {"t6_stream_running_mean"}


def test_no_query_outputs_decimal(spark, sf_dir):
    qs = entrymod.queries()
    offenders = {}
    for name, fn in qs.items():
        if name in SKIP_EXEC:
            continue
        schema = fn(spark, sf_dir).schema
        decs = [f.name for f in schema.fields if isinstance(f.dataType, DecimalType)]
        if decs:
            offenders[name] = decs
    assert not offenders, f"DECIMAL output columns: {offenders}"
