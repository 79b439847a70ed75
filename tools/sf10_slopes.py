#!/usr/bin/env python3
"""Second-decade slope table: t_sf10 (BENCH_SF10.json) over t_sf1 measured
AT THE SAME CODE VERSION (BENCH_SF1_R11_RETIME.json where present — the
round-11 re-time of the spread-guard-affected queries — else the r10
BENCH_SF1_ADJUDICATION.json / BENCH_SF1.json series). Mixing code versions
across the two decades would fold the one-time constant improvement into
the slope and misread it as super/sub-linearity.
Linear scaling = 10.0 per decade; flag > 12."""
import json, os

sf10 = json.load(open("BENCH_SF10.json"))["sf1_seconds"]
sf1 = json.load(open("BENCH_SF1.json"))["sf1_seconds"]
adj = json.load(open("BENCH_SF1_ADJUDICATION.json"))["sf1_seconds"]
retime = {}
if os.path.exists("BENCH_SF1_R11_RETIME.json"):
    retime = json.load(open("BENCH_SF1_R11_RETIME.json"))["sf1_seconds"]
rows = []
for q, t10 in sorted(sf10.items()):
    t1 = retime.get(q, adj.get(q, sf1.get(q)))
    rows.append((q, t1, t10, t10 / t1, q in retime))
print(f"{'query':34} {'sf1_s':>8} {'sf10_s':>9} {'slope2 x/decade':>16}")
for q, t1, t10, s, fresh in rows:
    flag = "  <-- FLAG >12" if s > 12 else ""
    src = "" if fresh else "  (stale sf1 basis)"
    print(f"{q:34} {t1:8.1f} {t10:9.1f} {s:16.2f}{flag}{src}")
