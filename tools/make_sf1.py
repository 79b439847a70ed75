#!/usr/bin/env python3
"""Synthesize an sf1-shaped dataset from sf0.1 (dev tool, not library code).

The driver generates sf{0.001,0.01,0.1} only; the scale-slope spot-check
(VERDICT r8 item 6) needs one decade more. Each table is replicated 10x
with id-space offsets chosen so every FK keeps referential integrity within
its replica (o_custkey moves with c_custkey, l_orderkey with o_orderkey,
l_partkey/l_suppkey with part/supplier, events.user_id with its own space).
That preserves join fan-outs and group sizes per key while growing key
cardinality 10x — the shape a real sf1 would have, which is what slope
measurement needs (pure row duplication would instead deepen per-key groups
and quietly change window/dedup complexity).

documents.text is salted with the replica index (prefix token) so
exact/near-dup pipelines keep their duplicate RATE instead of gaining 10
exact copies of every doc; embeddings get a tiny deterministic per-replica
vector nudge for the same reason.

Usage: python3 tools/make_sf1.py [srcDir] [dstDir] [replicas]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: key-space} ; every column in the same key space gets the
# same offset (max+1 of that space's base column) per replica
SPACES = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    "nation": {},
    "region": {},
}
# key space -> (table, column) that defines its width
SPACE_BASE = {
    "cust": ("customer", "c_custkey"), "order": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"), "supp": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"), "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"), "vec": ("embeddings", "vec_id"),
}


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(dst, exist_ok=True)
    tables = {t: pq.read_table(f"{src}/{t}.parquet") for t in SPACES}
    width = {s: pc.max(tables[t].column(c)).as_py() + 1
             for s, (t, c) in SPACE_BASE.items()}
    for tname, cols in SPACES.items():
        t = tables[tname]
        if not cols and tname in ("nation", "region"):
            pq.write_table(t, f"{dst}/{tname}.parquet")
            print(f"{tname}: copied ({t.num_rows} rows)")
            continue
        parts = []
        for r in range(reps):
            rep = t
            for cname, space in cols.items():
                idx = rep.schema.get_field_index(cname)
                col = rep.column(cname)
                shifted = pc.add(col, r * width[space]).cast(col.type)
                rep = rep.set_column(idx, cname, shifted)
            if tname == "documents" and r > 0:
                idx = rep.schema.get_field_index("text")
                txt = pc.binary_join_element_wise(
                    f"v{r}", rep.column("text"), " ")
                rep = rep.set_column(idx, "text", txt)
            if tname == "embeddings" and r > 0:
                # nudge: add r*1e-3 to the first component, preserving norms
                # closely enough that cosine/cluster structure survives
                emb = rep.column("embedding").combine_chunks()
                flat = emb.values
                dim = len(emb[0])
                import numpy as np
                vals = flat.to_numpy(zero_copy_only=False).copy()
                vals[::dim] += r * 1e-3
                nudged = pa.ListArray.from_arrays(emb.offsets,
                                                 pa.array(vals, type=flat.type))
                rep = rep.set_column(rep.schema.get_field_index("embedding"),
                                     "embedding", nudged)
            parts.append(rep)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{tname}.parquet")
        print(f"{tname}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
