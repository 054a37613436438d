#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
Scala library has no Python dependency).

Usage:
  python3 tools/verify_local.py <sfDir> <outDir>

Assumes `graft.Verify` has already dumped <outDir>/<query>/ parquet and
<outDir>/oracle_sql.json (run via tools/run_verify.sh). Creates DuckDB
views for every table in sfDir, runs each oracle SQL, and compares
against the Spark result: schema (column names sorted), row count,
per-column RESULT TYPES, and values in order.

The type check exists because the driver hashes *serialized* values:
DuckDB `sum(CASE WHEN ... THEN 1 ELSE 0 END)` returns HUGEINT (int128)
while Spark's `sum` writes int64 parquet — equal Python values, different
hash. A pure value-compare (what this tool did before round 7) is
structurally blind to that, and it cost a round twice (q137_tpch_q12 in
r6; an earlier decimal case before that). We compare the DuckDB type of
each oracle result column against the DuckDB type of the same column in
the Spark parquet dump — any width/family mismatch the hash would see
shows up as a TYPE failure here.
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


# Families calibrated against the DRIVER's observed hash behavior
# (CORRECTNESS_r06.json): int widths <= 64 canonicalize together and
# DOUBLE vs DECIMAL canonicalizes together (both classes were
# driver-GREEN across rounds 1-6: q30's int32 `rn` vs DuckDB BIGINT,
# q90's double `mean_level` vs DECIMAL(2,1)), while HUGEINT (int128,
# which DuckDB's arrow conversion turns into a different value family)
# is what actually failed q137's hash. So: int-vs-int fine,
# fraction-vs-fraction fine, anything crossing families — INT vs
# FRACTIONAL, INT vs HUGEINT, numeric vs VARCHAR — fails here exactly
# like it fails the driver.
# UBIGINT is NOT in _INTS deliberately: DuckDB serializes uint64 to
# arrow as its own 64-bit-unsigned family, and a value above 2^63-1
# cannot round-trip the driver's int64 path — treating it as INT would
# hide exactly the HUGEINT class of miss. An oracle that produces
# UBIGINT (e.g. bit ops) must CAST ... AS BIGINT, same as HUGEINT sums.
_INTS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
         "UTINYINT", "USMALLINT", "UINTEGER"}
_FRACTIONAL = {"FLOAT", "REAL", "DOUBLE"}
_ALIASES = {"TEXT": "VARCHAR", "STRING": "VARCHAR",
            "TIMESTAMP_S": "TIMESTAMP",
            "TIMESTAMP_NS": "TIMESTAMP", "TIMESTAMP_MS": "TIMESTAMP"}


def canon_type(t):
    s = str(t).upper()
    if s in _INTS:
        return "INT"
    if s in _FRACTIONAL:
        return "FRACTIONAL"
    if s.startswith("DECIMAL"):
        # scale-0 decimal serializes as an integer, fractional otherwise
        return "INT" if s.rstrip(")").endswith(",0") else "FRACTIONAL"
    return _ALIASES.get(s, s)


def types_by_col(rel):
    return {c: canon_type(t) for c, t in zip(rel.columns, rel.types)}


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
        st, dt = types_by_col(spark_rel), types_by_col(duck_rel)
        type_diffs = {c: (st[c], dt[c]) for c in st if st[c] != dt[c]}
        if type_diffs:
            failed.append((name, f"TYPES: {type_diffs}"))
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
