"""Self-check harness replicating the driver's correctness gate:
runs every queries() entry on Spark and its oracle_sql() on DuckDB over
the same parquet tables, compares row count, column names, and
order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            if isinstance(v, list):
                v = tuple(round(x, 9) if isinstance(x, float) else x for x in v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from pda_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        sdf = fn(spark, sf_dir)
        cols = sorted(sdf.columns)
        srows = normalize([r.asDict() for r in sdf.collect()], cols)
        t1 = time.time()
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):7d} (no oracle) spark={t1-t0:5.1f}s")
            continue
        orc = con.sql(oracles[name])
        ocols = sorted(orc.columns)
        odata = orc.fetchall()
        orows = normalize([dict(zip(orc.columns, row)) for row in odata], ocols)
        status = "OK"
        detail = ""
        if cols != ocols:
            status, detail = "SCHEMA-MISMATCH", f"spark={cols} duck={ocols}"
        elif len(srows) != len(orows):
            status, detail = "ROWCOUNT-MISMATCH", f"spark={len(srows)} duck={len(orows)}"
        elif srows != orows:
            status = "VALUE-MISMATCH"
            for a, b in zip(srows, orows):
                if a != b:
                    detail = f"first diff: spark={a} duck={b}"
                    break
        if status != "OK":
            failures.append(name)
        print(f"{name:24s} rows={len(srows):7d} {status} spark={t1-t0:5.1f}s {detail[:160]}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracles OK")


if __name__ == "__main__":
    main()
