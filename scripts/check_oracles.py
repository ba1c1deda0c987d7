"""Self-check harness replicating the driver's correctness gate:
runs every queries() entry on Spark and its oracle_sql() on DuckDB over
the same parquet tables and compares row count, column names, and
order-insensitive values.

DRIVER-FAITHFUL comparison (round-3 fix): both sides are materialized
as *pandas* frames — `sdf.toPandas()` vs `rel.df()` — because that is
what the driver's canonicalizer hashes. DuckDB's sum(BIGINT) returns
HUGEINT, which pandas coerces to float64, so the driver hashes `5.0`
against Spark's `5` and fails even though fetchall() values compare
equal in Python (the round-2 q10/q13/q14 failure class). The
canonical cell value therefore embeds the numeric *kind*: an int64 `5`
canonicalizes to ('i', 5) and a float64 `5.0` to ('f', 5.0) — never
equal. Temporal values are unified (datetime.date vs Timestamp
midnight hash equal at the driver, evidenced by q13's green
rows/schema in CORRECTNESS_r02).

Usage: python scripts/check_oracles.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_cell(v):
    """Canonical value preserving the int-vs-float distinction the
    driver's pandas-based hasher sees."""
    if v is None or v is pd.NaT:
        # NaT FIRST: NaTType subclasses datetime.datetime, so the
        # datetime branches below would otherwise swallow it as
        # ('t', 'NaT') on one side vs ('null',) on the other (ADVICE r3)
        return ("null",)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return ("null",)
        return ("f", round(f, 9))
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (np.integer, int)):
        return ("i", int(v))
    if isinstance(v, decimal.Decimal):
        return ("f", round(float(v), 9))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return ("null",)
        return ("t", v.isoformat())
    if isinstance(v, datetime.datetime):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, datetime.date):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(canon_cell(x) for x in v))
    if isinstance(v, bytes):
        return ("y", v)
    return ("s", str(v))


def canon_frame(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    kinds = {c: pdf[c].dtype.kind for c in cols}
    rows = []
    for row in pdf.itertuples(index=False, name=None):
        rows.append(tuple(canon_cell(v) for v in row))
    return cols, kinds, sorted(rows, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not os.path.isdir(sf_dir):
        sys.exit(f"usage: check_oracles.py [sf_dir] [query ...] — not a dir: {sf_dir}")

    import __spark_entry__ as e
    from pda_spark.session import get_spark

    if only:
        unknown = only - set(e.queries())
        if unknown:
            # a typo'd filter must fail loudly, not pass vacuously
            sys.exit(f"unknown query names: {sorted(unknown)}")

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
        scols, skinds, srows = canon_frame(sdf.toPandas())
        t1 = time.time()
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):7d} (no oracle) spark={t1-t0:5.1f}s")
            continue
        orc = con.sql(oracles[name])
        ocols, okinds, orows = canon_frame(orc.df())
        status = "OK"
        detail = ""
        if scols != ocols:
            status, detail = "SCHEMA-MISMATCH", f"spark={scols} duck={ocols}"
        elif len(srows) != len(orows):
            status, detail = "ROWCOUNT-MISMATCH", f"spark={len(srows)} duck={len(orows)}"
        elif srows != orows:
            status = "VALUE-MISMATCH"
            for a, b in zip(srows, orows):
                if a != b:
                    detail = f"first diff: spark={a} duck={b}"
                    break
        # dtype-kind divergence on numeric columns is the exact class the
        # driver gate fails on even when fetchall() values match — surface
        # it even if the canonical values happened to collide.
        if status == "OK":
            for c in scols:
                sk, ok = skinds[c], okinds[c]
                if {sk, ok} == {"i", "f"}:
                    status, detail = "DTYPE-MISMATCH", f"col {c}: spark kind {sk} vs duck kind {ok}"
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
