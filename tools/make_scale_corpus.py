#!/usr/bin/env python3
"""Derived scaling corpora (dev tool; the Scala library has no Python
dependency). Replicates the sf0.1 tables k times:

- documents: per-replica word suffixes (regexp: every non-space token
  gets 'r<i>') so replicas are shingle-DISJOINT — each replica is an
  independent copy of the sf0.1 near-dup workload; candidate structure
  scales linearly and nothing degenerates into one giant dup cluster.
  Replica 0 keeps the original text.
- embeddings: offset vec_ids (same direction set repeated — the
  documented round-3..5 methodology, comparable across rounds).
- events: offset event/user ids, timestamps preserved (per-user stream
  structure intact; per-minute count mass grows k×).

Usage: python3 tools/make_scale_corpus.py <outDir> <k> [table ...]
"""
import os
import sys

import duckdb

SF = "/root/testdata/sf0.1"


DIMS = ["region", "nation", "customer", "supplier", "part"]


def main(out, k, tables):
    con = duckdb.connect()
    # Dims are never replicated (FK values stay valid against sf0.1),
    # but queries resolve them from the SAME corpus dir — copy them
    # through so a derived corpus is self-contained (r18: the x10
    # heavy-slice bench runs dim-joining queries like q139/q140).
    import shutil
    os.makedirs(out, exist_ok=True)
    for d in DIMS:
        src = f"{SF}/{d}.parquet"
        dst = f"{out}/{d}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)
    for t in tables:
        os.makedirs(f"{out}/{t}.parquet", exist_ok=True)
        for i in range(k):
            if t == "documents":
                text = ("text" if i == 0 else
                        f"regexp_replace(text, '(\\S+)', '\\1r{i}', 'g')")
                sel = (f"SELECT doc_id + {i * 5000} AS doc_id, {text} AS text,"
                       f" lang, source, n_chars"
                       f" FROM read_parquet('{SF}/documents.parquet')")
            elif t == "embeddings":
                sel = (f"SELECT vec_id + {i * 2000} AS vec_id, embedding, label"
                       f" FROM read_parquet('{SF}/embeddings.parquet')")
            elif t == "events":
                # Write ts as int64 NANOS deliberately: Tables.events is
                # encoding-adaptive (ns-as-long / NTZ / UTC micros), and
                # the driver fixture now covers the µs path — deriving the
                # scale corpora in the LONG encoding keeps the nanos branch
                # exercised at scale (round-9 methodology).
                sel = (f"SELECT event_id + {i * 100000} AS event_id, epoch_ns(ts) AS ts,"
                       f" user_id + {i * 1500} AS user_id, event_type, value, props"
                       f" FROM read_parquet('{SF}/events.parquet')")
            elif t in ("lineitem", "orders"):
                # TPC-H fact pair for the layout/skipping family
                # (q152-q157): replicas offset the SHARED orderkey space
                # by the same stride so the join stays consistent and
                # replicas are key-disjoint; ship/order dates are
                # preserved so a date slice selects the same FRACTION of
                # every replica (per-year file mass grows k-fold, which
                # is exactly what the manifest-skipping curve must
                # absorb). Dims (customer/part/supplier) are not
                # replicated: FK values stay valid against sf0.1 dims.
                off = i * 150000  # > max orderkey at sf0.1 (149999)
                if t == "lineitem":
                    sel = (f"SELECT l_orderkey + {off} AS l_orderkey, l_partkey,"
                           f" l_suppkey, l_linenumber, l_quantity, l_extendedprice,"
                           f" l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"
                           f" FROM read_parquet('{SF}/lineitem.parquet')")
                else:
                    sel = (f"SELECT o_orderkey + {off} AS o_orderkey, o_custkey,"
                           f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
                           f" FROM read_parquet('{SF}/orders.parquet')")
            else:
                raise SystemExit(f"unknown table {t}")
            con.sql(f"COPY ({sel}) TO '{out}/{t}.parquet/part-{i:03d}.parquet'"
                    f" (FORMAT PARQUET)")
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet/*.parquet')"
        ).fetchone()[0]
        print(f"{out}/{t}.parquet: {n} rows ({k} replicas)")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]),
         sys.argv[3:] or ["documents", "embeddings", "events"])
