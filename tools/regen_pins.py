#!/usr/bin/env python3
"""Regenerate the BenchPins.values literal from one or more graft.Bench
dev-mode runs (full per-query detail: `runMain graft.Bench q`).

Usage: regen_pins.py run1.json [run2.json ...] > pins_body.txt

Each input file holds the ONE JSON line Bench prints. The pin for a query
is the MIN across runs (warm-min of warm-mins). Output is the Scala map
body to paste into BenchPins.scala.
"""
import json
import sys


def main() -> None:
    pins: dict[str, float] = {}
    actions = set()
    counts: dict[str, int] = {}
    for path in sys.argv[1:]:
        with open(path) as f:
            txt = f.read()
        line = next(
            (l for l in txt.splitlines() if l.startswith('{"metric"')), None)
        if line is None:
            sys.exit(f"{path}: no Bench JSON line found (truncated or "
                     "error-only run?) — refusing to regenerate pins")
        d = json.loads(line)
        actions.add(d.get("action", "count"))
        counts[path] = len(d["queries"])
        for k, v in d["queries"].items():
            pins[k] = min(pins.get(k, float("inf")), float(v))
    if len(actions) != 1:
        sys.exit(f"refusing to merge runs with mixed actions: {actions}")
    # A driver-mode (no-arg) run carries only headline queries; merging one
    # would silently shrink the pin set to the intersection's superset and
    # under-represent most of the registry. Require every input to carry
    # the full union of queries seen across inputs.
    full = len(pins)
    short = {p: c for p, c in counts.items() if c < full}
    if short:
        sys.exit("refusing headline-only / partial run(s) — each input "
                 f"must carry all {full} queries: " +
                 ", ".join(f"{p} has {c}" for p, c in short.items()))
    print(f"// regenerated from {len(sys.argv) - 1} run(s), "
          f"action={actions.pop()}, {len(pins)} queries")
    items = sorted(pins.items())
    for i in range(0, len(items), 2):
        pair = items[i:i + 2]
        row = ", ".join(f'"{k}" -> {v:.3f}' for k, v in pair)
        sep = "," if i + 2 < len(items) else ")"
        print(f"    {row}{sep}")


if __name__ == "__main__":
    main()
