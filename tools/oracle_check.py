"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query's Spark DataFrame AND its oracle SQL via
DuckDB over the same parquet views, then compares row count, schema
(column names), and an order-insensitive multiset of normalized row
values. Use while iterating so CORRECTNESS_r{N}.json holds no surprises.

Usage: python tools/oracle_check.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import decimal
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, (int,)):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return str(v)


def sortable(row):
    return tuple((str(type(v)), str(v)) for v in row)


def rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=sortable), [columns[i] for i in order]


def approx_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(approx_equal(x, y) for x, y in zip(a, b))
    return a == b


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    from etl_generator_demo_spark.registry import load_all
    from etl_generator_demo_spark.session import get_spark
    from etl_generator_demo_spark.catalog import TABLES

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{args.sf}/{name}.parquet')"
        )

    registry = load_all()
    names = args.names or list(registry)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        rq = registry[name]
        t0 = time.time()
        try:
            sdf = rq.fn(spark, args.sf)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        spark_t = time.time() - t0
        if rq.oracle is None:
            print(f"rows-only {name}: {len(s_rows)} rows ({spark_t:.1f}s)")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(rq.oracle)
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        s_ms, s_sorted_cols = rows_to_multiset(s_cols, s_rows)
        d_ms, d_sorted_cols = rows_to_multiset(d_cols, d_rows)
        problems = []
        if s_sorted_cols != d_sorted_cols:
            problems.append(f"schema: spark={s_sorted_cols} duck={d_sorted_cols}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
        if not problems and s_ms != d_ms:
            exact_diffs = [(a, b) for a, b in zip(s_ms, d_ms) if a != b]
            hard = [(a, b) for a, b in exact_diffs if not approx_equal(a, b)]
            if hard:
                problems.append(f"values: {len(hard)} hard diffs, first: {hard[0]}")
            else:
                problems.append(
                    f"values: {len(exact_diffs)} float-epsilon-only diffs "
                    f"(HASH WILL MISMATCH), first: {exact_diffs[0]}"
                )
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s_rows)} rows ({spark_t:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
