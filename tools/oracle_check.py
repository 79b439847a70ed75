#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not library code).

Reads the parquet results written by `graft.Verify` plus `oracle_sql.json`,
runs each oracle query in DuckDB over the same test tables, and compares
schema + rows (values rounded like a hash-compare would need).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
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
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols, got_all_types = got.columns, [str(t) for t in got.types]
            got_rows = got.fetchall()
            want = con.sql(sql)
            want_cols, want_all_types = want.columns, [str(t) for t in want.types]
            want_rows = want.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            failures += 1
            continue
        # driver sorts columns by name before hashing values
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(want_cols)}")
            failures += 1
            continue
        # The driver's hash is TYPED: DuckDB SUM(BIGINT) -> HUGEINT fails
        # against a Spark BIGINT even when values stringify identically.
        # Int widths up to 64-bit are interchangeable (q22 r01 evidence:
        # rank INTEGER vs BIGINT passed); HUGEINT/DECIMAL are not.
        def norm(t):
            return "INT" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else t
        got_types = [norm(got_all_types[i]) for i in gi]
        want_types = [norm(want_all_types[i]) for i in wi]
        if got_types != want_types:
            print(f"FAIL {name}: result types differ (CAST the oracle!)")
            print(f"   spark={list(zip(sorted(got_cols), got_types))}")
            print(f"   duck ={list(zip(sorted(want_cols), want_types))}")
            failures += 1
            continue
        g = canon([[r[i] for i in gi] for r in got_rows])
        w = canon([[r[i] for i in wi] for r in want_rows])
        if g != w:
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            for a, b in list(zip(g, w))[:8]:
                if a != b:
                    print(f"   spark={a}\n   duck ={b}")
            if len(g) != len(w):
                print(f"   spark head: {g[:3]}\n   duck head : {w[:3]}")
            failures += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
