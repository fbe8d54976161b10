#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes per-query parquet + oracle_sql.json to OUTDIR), then this script
executes each oracle SQL in DuckDB over the same sf tables and compares.

Usage: python3 tools/check_oracle.py OUTDIR SFDIR
"""
import json
import os
import sys

import duckdb


def norm_cell(v):
    if isinstance(v, float):
        # mirror a hash over rounded reprs; queries already round(4)
        return repr(round(v, 6))
    return repr(v)


def table(con, q):
    # Route BOTH sides through a pandas DataFrame, like the driver's checker:
    # this surfaces representation bugs fetchall() hides — DuckDB HUGEINT
    # (sum of BIGINT) becoming float64 ("500000.0" vs "500000"), and the
    # unhashable-ndarray crash when sorting frames with raw array columns.
    df = con.execute(q).df()
    cols = list(df.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    df = df[cols_sorted]
    df = df.sort_values(by=cols_sorted).reset_index(drop=True)
    data = sorted(
        tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return cols_sorted, data


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path):
            continue
        spark_q = f"SELECT * FROM '{path}/*.parquet'"
        if name not in oracle:
            try:
                cols, rows = table(con, spark_q)
                results[name] = {"status": "rows_only", "rows": len(rows)}
            except Exception as e:
                results[name] = {"status": "error", "error": str(e)[:200]}
            continue
        try:
            scols, srows = table(con, spark_q)
            ocols, orows = table(con, oracle[name])
            ok_schema = scols == ocols
            ok_rows = len(srows) == len(orows)
            ok_hash = srows == orows
            results[name] = {
                "status": "pass" if (ok_schema and ok_rows and ok_hash) else "FAIL",
                "schema_match": ok_schema, "rows_match": ok_rows,
                "hash_match": ok_hash,
                "spark_rows": len(srows), "oracle_rows": len(orows),
            }
            if not ok_schema:
                results[name]["spark_cols"] = scols
                results[name]["oracle_cols"] = ocols
            if ok_rows and not ok_hash:
                diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
                results[name]["first_diffs"] = diffs
            if results[name]["status"] == "pass":
                n_pass += 1
            else:
                n_fail += 1
        except Exception as e:
            results[name] = {"status": "error", "error": str(e)[:300]}
            n_fail += 1
    for name, r in sorted(results.items()):
        line = f"{name:24s} {r['status']}"
        if r["status"] not in ("pass", "rows_only"):
            line += "  " + json.dumps(
                {k: v for k, v in r.items() if k != "status"}, default=str)[:500]
        elif r["status"] == "rows_only":
            line += f"  rows={r.get('rows')}"
        print(line)
    print(f"\n{n_pass} pass / {n_fail} fail "
          f"/ {sum(1 for r in results.values() if r['status'] == 'rows_only')} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
