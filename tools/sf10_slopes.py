#!/usr/bin/env python3
"""Second-decade slope table: t_sf10 (BENCH_SF10.json) over the ADJUDICATED
t_sf1 (BENCH_SF1_ADJUDICATION.json where present, else BENCH_SF1.json).
Linear scaling = 10.0 per decade; flag > 12."""
import json, sys

sf10 = json.load(open("BENCH_SF10.json"))["sf1_seconds"]
sf1 = json.load(open("BENCH_SF1.json"))["sf1_seconds"]
adj = json.load(open("BENCH_SF1_ADJUDICATION.json"))["sf1_seconds"]
rows = []
for q, t10 in sorted(sf10.items()):
    t1 = adj.get(q, sf1.get(q))
    rows.append((q, t1, t10, t10 / t1))
print(f"{'query':34} {'sf1_s':>8} {'sf10_s':>9} {'slope2 x/decade':>16}")
for q, t1, t10, s in rows:
    flag = "  <-- FLAG >12" if s > 12 else ""
    print(f"{q:34} {t1:8.1f} {t10:9.1f} {s:16.2f}{flag}")
