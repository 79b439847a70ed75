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

Three per-replica transforms keep DERIVED content consistent with the
shifted keys — each one closed a real slope-measurement artifact:
 - customer/supplier NAME strings are regenerated from the shifted key
   ("Customer#%09d"): byte-identical names across replicas made every
   prefix-blocked entity-match block 10x deep, a 100x pair blowup that
   read as a 24x/decade slope (round-10 q134/q192 flags) when a real
   sf1's names are distinct;
 - documents.text gets every 3rd token TAGGED with the replica index
   ("tok" -> "v3.tok"): every cross-replica 3-token shingle and ~every
   24-char gram crosses a tagged position, so cross-replica similarity
   collapses, while within-replica similarity is preserved EXACTLY (the
   transform is a position-keyed token bijection — two docs agree on a
   tagged position after tagging iff they agreed before). The two
   rejected designs both distorted slopes: one prefix salt token left
   cross-replica copies ~0.97 Jaccard near-dups (quadratic pair
   inflation reading 14-17x/decade on q55/q182/q246), and REPLACING the
   token with bare salt made template-sharing docs within a replica MORE
   similar (killing 1/3 of their distinguishing tokens pushed many over
   LSH thresholds — q55 read 60x/decade). Char volume stays ~flat;
 - embeddings are multiplied by a replica-specific deterministic +-1
   SIGN PATTERN: norms and all within-replica cosines are preserved
   bit-for-bit (cos(Dx, Dy) = cos(x, y) for diagonal +-1 D) while
   cross-replica cosines collapse toward 0 — the additive 1e-3 nudge it
   replaces left cross-replica cosine at ~1, so every vector had 9
   near-identical copies.
Replica 0 is always the untouched base data.

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
            # key-derived NAME strings must follow their key, or replicas
            # carry byte-identical names (see module docstring)
            if tname == "customer":
                names = pa.array(["Customer#%09d" % k for k in
                                  rep.column("c_custkey").to_pylist()])
                rep = rep.set_column(
                    rep.schema.get_field_index("c_name"), "c_name", names)
            if tname == "supplier":
                names = pa.array(["Supplier#%09d" % k for k in
                                  rep.column("s_suppkey").to_pylist()])
                rep = rep.set_column(
                    rep.schema.get_field_index("s_name"), "s_name", names)
            if tname == "documents" and r > 0:
                # TAG every 3rd token with the replica index (see the
                # module docstring: a position-keyed token bijection —
                # cross-replica shingles/grams break, within-replica
                # similarity is preserved exactly, char volume ~flat).
                idx = rep.schema.get_field_index("text")
                tag = f"v{r}."

                def resalt(s):
                    if s is None:
                        return None
                    toks = s.split(" ")
                    # tag positions 0,3,6,… — starting at the FIRST token
                    # so prefix-blocked operators (q221's text-prefix
                    # block) see replica-distinct prefixes, as a real
                    # corpus' diverse openings would
                    return " ".join(tag + tok if i % 3 == 0 else tok
                                    for i, tok in enumerate(toks))

                txt = pa.array([resalt(s)
                                for s in rep.column("text").to_pylist()])
                rep = rep.set_column(idx, "text", txt)
            if tname == "embeddings" and r > 0:
                # replica-specific deterministic +-1 sign pattern: norms
                # and within-replica cosines preserved exactly, cross-
                # replica cosines collapse toward 0 (see module docstring)
                emb = rep.column("embedding").combine_chunks()
                flat = emb.values
                dim = len(emb[0])
                import numpy as np
                vals = flat.to_numpy(zero_copy_only=False).copy()
                n = len(vals) // dim
                # deterministic pattern: sign = +1 iff bit-parity of
                # (r * 2654435761 + i * 40503) is even — no RNG state
                idxs = np.arange(dim, dtype=np.uint64)
                mix = (np.uint64(r) * np.uint64(2654435761)
                       + idxs * np.uint64(40503)) & np.uint64(0xFFFFFFFF)
                bits = mix ^ (mix >> np.uint64(16))
                bits = bits ^ (bits >> np.uint64(8))
                bits = bits ^ (bits >> np.uint64(4))
                bits = bits ^ (bits >> np.uint64(2))
                bits = bits ^ (bits >> np.uint64(1))
                signs = np.where((bits & np.uint64(1)).astype(bool),
                                 -1.0, 1.0).astype(vals.dtype)
                vals = (vals.reshape(n, dim) * signs).reshape(-1)
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
