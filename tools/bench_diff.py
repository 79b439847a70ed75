#!/usr/bin/env python3
"""Round-over-round same-action bench regression check (dev tool).

Compares two graft.Bench JSON artifacts per-query and emits the movers
that clear BOTH the 1.5x ratio AND the 0.25 s absolute floor (the
Bench.scala offender discipline). Exists because re-pinning at a code
-change boundary bakes same-action regressions into the new pins —
round 12's q127 read +1.01 s vs round 11 under the identical count
action yet an innocent 1.10 against its freshly re-derived noop pin;
only the previous round's same-action artifact can catch that class.

Usage: bench_diff.py <current.json> <previous.json> [ratio] [floor_sec]

Refuses mixed-action pairs (per-query cross-action comparison is invalid
by construction — see BENCH_ACTION_AUDIT). Driver-mode artifacts carry
only headline queries; the common-key count is emitted so a shrunken
comparison is visible, never silent.
"""
import json
import math
import sys


def load(path: str) -> dict:
    """Accepts either a raw graft.Bench stdout capture (the one JSON line)
    or the driver's BENCH_r{N}.json wrapper (metric line inside "tail")."""
    with open(path) as f:
        txt = f.read()
    line = next(
        (l for l in txt.splitlines() if l.startswith('{"metric"')), None)
    if line is None:
        try:
            wrapper = json.loads(txt)
        except json.JSONDecodeError:
            wrapper = None
        if isinstance(wrapper, dict) and "tail" in wrapper:
            tail = wrapper["tail"]
            idx = tail.rfind('{"metric"')
            if idx >= 0:
                line = tail[idx:].splitlines()[0]
    if line is None:
        sys.exit(f"{path}: no Bench JSON line found")
    return json.loads(line)


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    cur, prev = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.25
    ca, pa = cur.get("action", "count"), prev.get("action", "count")
    if ca != pa:
        sys.exit(f"refusing cross-action comparison: {ca} vs {pa} "
                 "(per-query numbers are incomparable by construction)")
    cq, pq = cur["queries"], prev["queries"]
    common = sorted(set(cq) & set(pq))
    if not common:
        sys.exit("no common queries between the two artifacts")
    pairs = [(k, float(cq[k]), float(pq[k])) for k in common
             if float(cq[k]) > 0 and float(pq[k]) > 0]
    if not pairs:
        sys.exit("no positive-time common queries to compare")
    regressions = {k: {"cur": c, "prev": p, "ratio": round(c / p, 3)}
                   for k, c, p in pairs
                   if c / p > ratio and c - p > floor}
    improvements = {k: {"cur": c, "prev": p, "ratio": round(c / p, 3)}
                    for k, c, p in pairs
                    if p / c > ratio and p - c > floor}
    geo = math.exp(sum(math.log(c / p) for _, c, p in pairs) / len(pairs))
    out = {
        "action": ca,
        "ratio_gate": ratio,
        "floor_sec": floor,
        "n_common": len(common),
        "n_current": len(cq),
        "n_previous": len(pq),
        "geomean_cur_over_prev": round(geo, 3),
        "regressions": dict(
            sorted(regressions.items(), key=lambda kv: -kv[1]["ratio"])),
        "improvements": dict(
            sorted(improvements.items(), key=lambda kv: kv[1]["ratio"])),
    }
    print(json.dumps(out, indent=1))
    # non-zero exit on regressions so CI / the round script can gate on it
    sys.exit(2 if regressions else 0)


if __name__ == "__main__":
    main()
