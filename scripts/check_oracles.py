#!/usr/bin/env python
"""Local stand-in for the driver's DuckDB correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir and
compares against ``oracle_sql()`` via DuckDB: row count, column names,
and an order-insensitive value comparison (columns sorted by name, rows
sorted, NaN/None normalized, floats rounded to 9 significant digits).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return float(f"{v:.9g}")
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


def compare(name: str, spark_df, sql: str, con) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    sp_cols, du_cols = sorted(sp.columns), sorted(du.columns)
    if sp_cols != du_cols:
        return False, f"columns differ: spark={sp_cols} duck={du_cols}"
    if len(sp) != len(du):
        return False, f"row count differs: spark={len(sp)} duck={len(du)}"
    sp_rows = sorted(
        (tuple(_norm(v) for v in row) for row in sp[sp_cols].itertuples(index=False)),
        key=_key,
    )
    du_rows = sorted(
        (tuple(_norm(v) for v in row) for row in du[du_cols].itertuples(index=False)),
        key=_key,
    )
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        if a != b:
            return False, f"first diff at sorted row {i}:\n  spark={a}\n  duck ={b}"
    return True, f"OK ({len(sp)} rows)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from dstlr_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    t_total = time.monotonic()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"{name:35s} rows-only ({n} rows)  [{time.monotonic() - t0:6.2f}s]")
            continue
        try:
            ok, msg = compare(name, fn(spark, sf_dir), oracles[name], con)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {e}"
        print(
            f"{name:35s} {'PASS' if ok else 'FAIL'} {msg}  [{time.monotonic() - t0:6.2f}s]"
        )
        if not ok:
            failures.append(name)
    print(f"total gate wall time: {time.monotonic() - t_total:.1f}s")
    spark.stop()
    if failures:
        print(f"\nFAILED: {failures}")
        return 1
    print("\nall oracle checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
