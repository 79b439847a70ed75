#!/usr/bin/env python3
"""Show full spark-vs-duck rows for one query against an existing Verify dump.

Usage: python3 tools/qdiff.py <name> [sfDir] [verifyDir] [--sql FILE]
With --sql, run the candidate SQL from FILE instead of oracle_sql.json's
entry (fast oracle-iteration without re-running Verify).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return out


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "target/nullsalt/data"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "target/nullsalt/verify"
    sql = None
    if "--sql" in sys.argv:
        with open(sys.argv[sys.argv.index("--sql") + 1]) as f:
            sql = f.read()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    if sql is None:
        with open(f"{out_dir}/oracle_sql.json") as f:
            sql = json.load(f)[name]
    got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    got_cols = got.columns
    got_rows = got.fetchall()
    want = con.sql(sql)
    want_cols = want.columns
    want_rows = want.fetchall()
    gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
    wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
    print("cols:", sorted(got_cols), "vs", sorted(want_cols))
    g = canon([[r[i] for i in gi] for r in got_rows])
    w = canon([[r[i] for i in wi] for r in want_rows])
    ndiff = 0
    for k in range(max(len(g), len(w))):
        a = g[k] if k < len(g) else "<missing>"
        b = w[k] if k < len(w) else "<missing>"
        if a != b:
            ndiff += 1
            print(f"[{k}] spark={a}\n     duck ={b}")
            if ndiff > 20:
                print("...")
                break
    if ndiff == 0:
        print(f"MATCH ({len(g)} rows)")


if __name__ == "__main__":
    main()
