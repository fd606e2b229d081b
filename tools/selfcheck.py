#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify) and the
oracle SQL from <verifyOutDir>/oracle_sql.json, runs the SQL in DuckDB with
views over <sfDir>/*.parquet, and compares values with columns sorted by
name (the driver's documented compare). Exit code 1 if any query mismatches.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            mine = canon(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            failures.append((name, f"error: {e}"))
            continue
        if list(mine.columns) != list(want.columns):
            failures.append((name, f"columns {list(mine.columns)} != {list(want.columns)}"))
            continue
        if len(mine) != len(want):
            failures.append((name, f"rows {len(mine)} != {len(want)}"))
            continue
        diffs = []
        for c in mine.columns:
            a, b = mine[c], want[c]
            try:
                eq = (a.astype(str).values == b.astype(str).values)
            except Exception as e:
                diffs.append(f"{c}: cmp error {e}")
                continue
            if not eq.all():
                i = int((~eq).argmax())
                diffs.append(f"{c}@row{i}: {a.iloc[i]!r} != {b.iloc[i]!r} "
                             f"({int((~eq).sum())} diffs)")
        if diffs:
            failures.append((name, "; ".join(diffs)))
        else:
            print(f"PASS {name} ({len(mine)} rows)")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
