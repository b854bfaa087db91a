#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the given sf dir,
compare row counts, schemas (column names), and order-insensitive
values (floats rounded upstream).  Usage:

    python scripts/check_oracle.py [sf_dir] [name ...]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            vals.append((c, v))
        out.append(tuple(sorted(vals)))
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from mdq_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sf_dir.rstrip('/')}/{t}.parquet'")

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    failures = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [r.asDict() for r in sdf.collect()]
            spark_cols = sdf.columns
        except Exception as e:  # noqa
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(spark_rows)} rows")
            if not spark_rows and not name.startswith("xq_empty"):
                print(f"  WARNING: zero rows from {name}")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:  # noqa
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error: {e}")
            continue
        duck_cols = list(ddf.columns)
        if sorted(duck_cols) != sorted(spark_cols):
            failures.append((name, f"schema: {spark_cols} vs {duck_cols}"))
            print(f"[FAIL] {name}: schema {spark_cols} vs {duck_cols}")
            continue
        duck_rows = ddf.to_dict("records")
        if len(duck_rows) != len(spark_rows):
            failures.append(
                (name, f"rows: spark={len(spark_rows)} duck={len(duck_rows)}"))
            print(f"[FAIL] {name}: rowcount spark={len(spark_rows)} "
                  f"duck={len(duck_rows)}")
            continue
        a = norm(spark_rows, spark_cols)
        b = norm(duck_rows, spark_cols)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"[FAIL] {name}: values differ, e.g. {diff}")
            continue
        print(f"[ OK ] {name}: {len(spark_rows)} rows match")

    print()
    # self-audit (VERDICT r05 #2): a full run must have exercised EVERY
    # registered queries() key — a silent truncation (two entries had
    # no CORRECTNESS_r05 row) fails loudly here instead of passing by
    # omission
    if not only and ran != len(qs):
        print(f"AUDIT FAILURE: ran {ran} of {len(qs)} registered "
              f"queries() entries")
        sys.exit(2)
    print(f"ran {ran}/{len(qs)} registered entries"
          + (" (subset requested)" if only else ""))
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg[:200]}")
        sys.exit(1)
    print("all checked entries match")


if __name__ == "__main__":
    main()
