#!/usr/bin/env python3
"""Null-salt differential check (dev tool, not library code).

Round-7/8 found a recurring latent-bug class: a Spark-side null filter paired
with an oracle CTE that lacks the matching `IS NOT NULL` (q217, q228/q229,
q254, q260). The stock testdata can't catch it — the driver's generator never
emits NULLs in the salted columns — so both engines agree by luck.

This tool makes the class testable at authoring time:
  1. copies sf0.001 to <outBase>/data, appending K rows per table whose id
     column(s) are fresh (max+1..max+K) and every OTHER column is NULL —
     ids stay non-null because the dedup/join families document a
     non-null-id contract (DedupOps numeric-id contract), and embeddings'
     vector column stays non-null-free on the salt rows' *absence* — i.e.
     the embeddings table gets NO salt rows, because a NULL embedding is
     not a state the pipeline admits (vectors are machine-generated;
     upstream encoders fail the row, they don't emit NULL).
  2. runs `graft.Verify` over the salted copy,
  3. runs the DuckDB oracle compare (tools/oracle_check.py) over it.

Any FAIL is a null-asymmetry between a query and its oracle. Zero diffs is
the gate.

Usage: python3 tools/nullsalt_check.py [sfDir] [outBase] [k]
       (defaults: /root/testdata/sf0.001 target/nullsalt 7)
"""
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> id columns kept non-null on salt rows (every other column NULL)
TABLES = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    # embeddings: copied verbatim, no salt rows (see module docstring)
    "embeddings": [],
}


def salt_table(src, dst, id_cols, k):
    t = pq.read_table(src)
    if not id_cols:
        pq.write_table(t, dst)
        return 0
    cols = []
    for field in t.schema:
        if field.name in id_cols:
            mx = pc.max(t.column(field.name)).as_py() or 0
            vals = pa.array([mx + 1 + i for i in range(k)], type=field.type)
        else:
            vals = pa.nulls(k, type=field.type)
        cols.append(vals)
    salt = pa.Table.from_arrays(cols, schema=t.schema)
    pq.write_table(pa.concat_tables([t, salt]), dst)
    return k


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_base = sys.argv[2] if len(sys.argv) > 2 else "target/nullsalt"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    data_dir = f"{out_base}/data"
    verify_dir = f"{out_base}/verify"
    import os
    os.makedirs(data_dir, exist_ok=True)
    for tname, id_cols in TABLES.items():
        n = salt_table(f"{sf_dir}/{tname}.parquet",
                       f"{data_dir}/{tname}.parquet", id_cols, k)
        print(f"salted {tname}: +{n} null rows")
    print("running graft.Verify over the salted copy ...")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {data_dir} {verify_dir}"],
        capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit(1)
    # verify logs per-query failures to stderr without failing the run —
    # surface them here (a null-row crash is a finding, not noise)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)
    print("running the DuckDB oracle compare ...")
    sys.exit(subprocess.call(
        [sys.executable, "tools/oracle_check.py", data_dir, verify_dir]))


if __name__ == "__main__":
    main()
