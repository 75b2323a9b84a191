"""Local mirror of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet tables, compares
row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr: None/mixed-type cells stay orderable
    return sorted((tuple(_norm(r[i]) for i in idx) for r in rows), key=repr)


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from dexspark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check", master="local[4]", shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table dir (tools/sf1_suite)
            con.sql(f"create view {t} as select * from read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"create view {t} as select * from read_parquet('{p}')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?   {name}: rows-only ({len(s_rows)} rows) — no oracle")
            continue
        try:
            rel = con.sql(sql)
            d_cols = [c.lower() for c in rel.columns]
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        s_cols_l = [c.lower() for c in s_cols]
        if sorted(s_cols_l) != sorted(d_cols):
            failures.append((name, f"columns {sorted(s_cols_l)} != {sorted(d_cols)}"))
            print(f"FAIL  {name}: column mismatch {sorted(s_cols_l)} vs {sorted(d_cols)}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append((name, f"rowcount {len(s_rows)} != {len(d_rows)}"))
            print(f"FAIL  {name}: rowcount {len(s_rows)} != {len(d_rows)}")
            continue
        a = _rowset(s_cols_l, s_rows)
        b = _rowset(d_cols, d_rows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL  {name}: values differ e.g. {diff}")
            continue
        print(f"OK    {name}: {len(s_rows)} rows")
    print(f"\n{len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
