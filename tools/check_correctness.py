"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet (default sf0.01),
then compares row count, column names, and an order-insensitive value
hash (rows sorted, columns sorted by name, values canonicalized).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from data_pipeline_who_gho_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    body = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return sorted_cols, body


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    only = set(args)

    spark = get_spark(app_name="check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passed, skipped = [], 0, 0

    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        sql = oracles.get(name)
        if not sql:
            print(f"skip  {name}: no oracle (rows-only) rows={len(srows)} [{time.time()-t0:.1f}s]")
            skipped += 1
            continue
        try:
            res = con.sql(sql)
            dcols = [c.lower() for c in res.columns]
            drows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue

        sc, sb = table_sig([c.lower() for c in scols], srows)
        dc, db_ = table_sig(dcols, drows)
        if sc != dc:
            failures.append((name, f"columns differ: spark={sc} duck={dc}"))
            print(f"FAIL  {name}: columns {sc} vs {dc}")
        elif len(sb) != len(db_):
            failures.append((name, f"row count: spark={len(sb)} duck={len(db_)}"))
            print(f"FAIL  {name}: rows {len(sb)} vs {len(db_)}")
        elif sb != db_:
            diff = [(a, b) for a, b in zip(sb, db_) if a != b][:3]
            failures.append((name, f"values differ, first diffs: {diff}"))
            print(f"FAIL  {name}: values differ; e.g. {diff[:1]}")
        else:
            passed += 1
            print(f"ok    {name}: rows={len(sb)} [{time.time()-t0:.1f}s]")

    print(f"\n{passed} passed, {skipped} rows-only, {len(failures)} failed")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
