#!/usr/bin/env python3
"""Replicate a driver testdata sf directory Nx with disjoint key spaces,
for the full-suite cross-query bench leg (SCALE.md round-13): each replica
offsets every primary/foreign key by i*1e9, so joins behave like N disjoint
copies of the corpus while the tiny dims (region/nation, referenced by
unoffset nationkeys) stay shared. 1e9 clears every fixture offset the
queries add themselves (v22's +1e5 vec_id re-adds, w6's +1e7 doc_ids).

Usage: python3 tools/make_4x_corpus.py SRC_SF_DIR DST_DIR [N]
"""
import os
import sys

import duckdb

KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
OFFSET = 1_000_000_000


def main():
    src, dst = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYS.items():
        src_path = f"{src}/{table}.parquet"
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src_path}'").fetchall()]
        reps = 1 if not keys else n
        selects = []
        for i in range(reps):
            exprs = ", ".join(
                f"({c} + {i * OFFSET})::BIGINT AS {c}" if c in keys else c
                for c in cols)
            selects.append(f"SELECT {exprs} FROM '{src_path}'")
        sql = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        rows = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {rows} rows ({reps}x)")


if __name__ == "__main__":
    main()
