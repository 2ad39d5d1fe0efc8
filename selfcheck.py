"""Local correctness harness: run every registry query against its DuckDB
oracle and report row-count / schema / value equality, mimicking the driver's
order-insensitive compare. Usage: python selfcheck.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
from decimal import Decimal

import duckdb

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm_cell(v):
    # RAW representation, no normalize(): the driver's hasher is sensitive to
    # decimal trailing-fractional-zero rendering (r1: 16 value-exact queries
    # hashed red). Decimal outputs are additionally hard-failed below —
    # every query must final-cast DECIMAL to DOUBLE on both sides.
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(norm_cell(x) for x in v))
    return (type(v).__name__, v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def approx_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for ca, cb in zip(ra, rb):
            if ca == cb:
                continue
            if ca[0] == "f" and cb[0] == "f":
                if math.isclose(ca[1], cb[1], rel_tol=1e-9, abs_tol=1e-12):
                    continue
            return False
    return True


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else SF_DIR
    only = [a for a in args if "/" not in a]

    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    from a_big_data_lambda_architecture_for_real_time_stock_price_forecasting_using_financial_news_spark.session import (
        configure,
    )

    spark = configure(
        SparkSession.builder.appName("selfcheck").master("local[8]")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        # fixture tables are single files; generated sets (tools/gen_sf1.py)
        # are Spark-style directories of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(qs)
    failures = []
    for name in names:
        try:
            # sketch/token tables persist() as their in-session
            # materialization barrier; drop them between entries so a long
            # multi-entry run doesn't accumulate cached blocks
            spark.catalog.clearCache()
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            dec_cols = [
                f.name for f in sdf.schema.fields if isinstance(f.dataType, DecimalType)
            ]
            if dec_cols:
                # representation hazard, independent of values being right
                failures.append(name)
                print(f"{name:35s} FAIL   DECIMAL output columns {dec_cols} "
                      f"(cast to DOUBLE on both sides — see dec2dbl)")
                continue
            # Nested-type gate (r9 driver finding): the driver canonicalizes
            # result frames through pandas sort_values, which raises
            # "unhashable type: 'list'" on array cells — d16 shipped an
            # array<bigint> column that was value-exact locally yet red at
            # the driver. Hard-fail ANY nested top-level output column;
            # render arrays to space-joined strings on both sides instead.
            nested_cols = [
                f.name for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if nested_cols:
                failures.append(name)
                print(f"{name:35s} FAIL   nested-typed output columns "
                      f"{nested_cols} (driver's pandas hasher cannot "
                      f"factorize list cells — concat_ws to a string)")
                continue
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name:35s} rows-only: {len(srows)} rows  [no oracle]")
                continue
            # Type gate (r5 judge finding): DuckDB's fetchall() converts
            # HUGEINT to plain int so the Decimal hard-fail above never sees
            # it — but the DRIVER reads the oracle through Arrow, where
            # HUGEINT becomes decimal128(38,0) and hash-mismatches a
            # value-exact answer (g7/m10, r5). DESCRIBE the oracle (plans
            # only, no execution) and hard-fail any HUGEINT/DECIMAL output:
            # e.g. a bare sum(BIGINT) must be CAST(... AS BIGINT).
            otypes = con.execute(
                f"DESCRIBE SELECT * FROM ({oracles[name]}) __q"
            ).fetchall()
            bad_types = [
                (c, t) for c, t, *_ in otypes
                if "HUGEINT" in t.upper() or "DECIMAL" in t.upper()
            ]
            if bad_types:
                failures.append(name)
                print(f"{name:35s} FAIL   oracle emits HUGEINT/DECIMAL "
                      f"{bad_types} (Arrow renders decimal128 in the driver "
                      f"hasher — CAST to BIGINT/DOUBLE in the oracle SQL)")
                continue
            nested_oracle = [
                (c, t) for c, t, *_ in otypes
                if "[]" in t or "STRUCT" in t.upper() or "MAP(" in t.upper()
            ]
            if nested_oracle:
                failures.append(name)
                print(f"{name:35s} FAIL   oracle emits nested types "
                      f"{nested_oracle} (driver's pandas hasher cannot "
                      f"factorize list cells — string_agg to a string)")
                continue
            dres = con.execute(oracles[name])
            dcols = [d[0] for d in dres.description]
            drows = dres.fetchall()
            sc, sr = norm_rows(scols, srows)
            dc, dr = norm_rows(dcols, drows)
            schema_ok = sc == dc
            count_ok = len(sr) == len(dr)
            exact = sr == dr
            approx = exact or approx_equal(sr, dr)
            status = "OK" if (schema_ok and count_ok and exact) else (
                "APPROX" if (schema_ok and count_ok and approx) else "FAIL"
            )
            print(
                f"{name:35s} {status:6s} rows={len(sr)}/{len(dr)} "
                f"schema={'ok' if schema_ok else f'{sc} vs {dc}'}"
            )
            if status == "FAIL":
                failures.append(name)
                for i, (a, b) in enumerate(zip(sr, dr)):
                    if a != b:
                        print(f"   first diff row {i}:\n    spark={a}\n    duck ={b}")
                        break
                if len(sr) != len(dr):
                    print(f"   spark sample: {sr[:2]}\n   duck sample:  {dr[:2]}")
        except Exception as e:
            failures.append(name)
            print(f"{name:35s} ERROR  {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
