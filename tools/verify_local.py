#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
Scala library has no Python dependency).

Usage:
  python3 tools/verify_local.py <sfDir> <outDir>

Assumes `graft.Verify` has already dumped <outDir>/<query>/ parquet and
<outDir>/oracle_sql.json (run via tools/run_verify.sh). Creates DuckDB
views for every table in sfDir, runs each oracle SQL, and compares
against the Spark result: schema (column names sorted), row count, and
values in order.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    """Column-name-sorted, float-normalized row tuples."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        return v

    return [tuple(norm(r[i]) for i in order) for r in rows]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    passed, failed = [], []
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = spark_rel.columns
            spark_rows = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            duck_cols = duck_rel.columns
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            failed.append((name, f"EXEC: {e}"))
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            failed.append(
                (name, f"SCHEMA: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"))
            continue
        if len(spark_rows) != len(duck_rows):
            failed.append(
                (name, f"ROWS: spark={len(spark_rows)} duck={len(duck_rows)}"))
            continue
        s, d = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
        if s != d:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(s, d)) if a != b]
            failed.append((name, f"VALUES: {len(diffs)} diffs, first={diffs[:2]}"))
            continue
        passed.append((name, len(spark_rows)))
    for name, n in passed:
        print(f"PASS {name} ({n} rows)")
    for name, why in failed:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(passed)} passed, {len(failed)} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
