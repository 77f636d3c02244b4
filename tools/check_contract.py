"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01; compare
row count, column names, and order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from hsearch_spark.session import build_session

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return int(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except ImportError:
        pass
    return v


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(app_name="contract_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sorted(sdf.columns)
        srows = sdf.collect()
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows, cols={scols}")
            continue
        res = con.sql(oracles[name])
        dcols = sorted(res.columns)
        drows = res.fetchall()
        status = []
        if scols != dcols:
            status.append(f"SCHEMA spark={scols} duck={dcols}")
        if len(srows) != len(drows):
            status.append(f"COUNT spark={len(srows)} duck={len(drows)}")
        if not status:
            sk = rows_key(sdf.columns, [tuple(r) for r in srows])
            dk = rows_key(res.columns, drows)
            if sk != dk:
                diff = [
                    (a, b) for a, b in zip(sk, dk) if a != b
                ][:3]
                status.append(f"VALUES first diffs: {diff}")
        if status:
            failures.append(name)
            print(f"{name:28s} FAIL  " + " | ".join(status))
        else:
            print(f"{name:28s} OK    {len(srows)} rows")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
