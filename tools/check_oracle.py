"""Local replica of the driver's correctness gate: run every
queries()/oracle_sql() pair at a given SF and compare row count, column
names, and order-insensitive values. Stricter than the driver: exact
equality (floats included — both sides round explicitly).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from sandcrawler_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    if only:
        queries = {n: f for n, f in queries.items() if n in only}
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        sql = oracles.get(name)
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            continue
        spark_sec = time.perf_counter() - t0
        if sql is None:
            print(f"ok?  {name}: rows={len(s_rows)} ({spark_sec:.1f}s, rows-only check, no oracle)")
            continue
        try:
            rel = con.sql(sql)
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            ns, nd = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
            mism = [
                (a, b) for a, b in zip(ns, nd) if repr(a) != repr(b)
            ]
            if mism:
                problems.append(f"{len(mism)} value mismatches; first: {mism[0]}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + " | ".join(problems))
        else:
            print(f"PASS {name} ({len(s_rows)} rows, {spark_sec:.1f}s)")
    print(f"\n{len(queries) - len(failures)}/{len(queries)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
