"""Robustness tests for the late-r5 registry entries: failure semantics,
idempotence, and definition cross-checks that the oracle compare alone
doesn't exercise."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.plans import (
    registry,
)


def test_p8_failfast_raises_on_malformed_row(spark, tmp_path):
    """p8 reads back its own export with mode=FAILFAST; prove that mode
    actually rejects a malformed row instead of silently nulling it (the
    PERMISSIVE default) — silent drops would corrupt the oracle compare."""
    path = str(tmp_path / "bad_csv")
    good = spark.createDataFrame(
        [(1, 10, "2024-01-01", 100)],
        "o_orderkey BIGINT, o_custkey BIGINT, order_date STRING, total_cents BIGINT",
    )
    good.coalesce(1).write.option("header", True).option("delimiter", "|").csv(path)
    # append a malformed part file (non-numeric key)
    with open(f"{path}/part-corrupt.csv", "w") as f:
        f.write("o_orderkey|o_custkey|order_date|total_cents\n")
        f.write("NOT_A_NUMBER|2|2024-01-02|200\n")
    schema = "o_orderkey BIGINT, o_custkey BIGINT, order_date DATE, total_cents BIGINT"
    bad = (
        spark.read.schema(schema)
        .option("header", True)
        .option("delimiter", "|")
        .option("mode", "FAILFAST")
        .csv(path)
    )
    with pytest.raises(Exception, match="Malformed|FAILFAST|BadRecord"):
        bad.collect()


def test_j8_repeated_invocation_idempotent(spark, sf_dir):
    """j8 drops + rewrites its bucketed scratch tables per call; two calls
    in one session must agree (no half-overwritten table state)."""
    q = registry.QUERIES["j8_bucketed_colocated_join"]
    first = {r.o_orderpriority: (r.n_items, r.revenue) for r in q(spark, sf_dir).collect()}
    second = {r.o_orderpriority: (r.n_items, r.revenue) for r in q(spark, sf_dir).collect()}
    assert first == second and len(first) > 0


def test_a14_quantile_definition_matches_reference(spark):
    """a14's composed discrete quantile (value at row ceil(p*n)) against a
    plain Python reference on an awkward group size — including n where
    p*(n-1) is an integer, the case engine builtins disagree on."""
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]  # n=11
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "doc_id LONG, lang STRING, n_chars LONG"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    r = df.select(
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    out = {}
    for p in (0.25, 0.75):
        target = F.ceil(F.lit(p) * F.col("n")).cast("bigint")
        out[p] = (
            r.filter(F.col("rn") == target).select("n_chars").first()[0]
        )
    s = sorted(vals)
    for p in (0.25, 0.75):
        assert out[p] == s[math.ceil(p * len(s)) - 1]


def test_g7_pagerank_mass_sane(spark, sf_dir):
    """Fixed-point PageRank invariants: every rank >= the base term, and
    total mass stays within the damped envelope (leak only from integer
    floors, bounded by nodes + edges in 1e-9 units)."""
    df = registry.QUERIES["g7_pagerank_fixedpoint"](spark, sf_dir)
    rows = df.collect()
    n = len(rows)
    base = 150_000_000
    assert n > 0
    assert all(r.pagerank >= base for r in rows)
    total = sum(r.pagerank for r in rows)
    assert total <= n * 1_000_000_000
    # floors lose < 1 unit per edge-contribution per iteration; with
    # symmetric edges bounded by 2*distinct pairs, the loss stays tiny
    assert total >= n * 1_000_000_000 * 0.9


def test_u11_zonemap_empty_prune_returns_empty_with_schema(spark, sf_dir, monkeypatch):
    """If NO file's zone intersects the probe, the entry's manifest-first
    scan must take the empty-path arm (limit(0)) and return zero rows
    with the declared schema — never throw on an empty path list."""
    # patch the DEFINING module (post-r12 split the facade re-exports a
    # copy of the name; the entry body reads its own module's global)
    import importlib

    u11_mod = importlib.import_module(
        registry.QUERIES["u11_zonemap_skipping"].__module__
    )
    monkeypatch.setattr(u11_mod, "U11_THRESHOLD", 10**9)
    out = registry.QUERIES["u11_zonemap_skipping"](spark, sf_dir)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["event_type", "n", "sum_c"]
