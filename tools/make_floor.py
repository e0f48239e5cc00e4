#!/usr/bin/env python3
"""Derive BENCH_FLOOR.json from a CLEAN bench draw.

Usage: python3 tools/make_floor.py <bench_out.json> [round]

Takes the per-query minimums of a bench artifact drawn on a QUIET box
(run Verify/tests first, bench LAST, nothing else on the machine —
the PLANS bench protocol) and writes the committed floor the Bench
tripwire compares every later draw against (BenchUtil.loadFloor).

Refuses a contaminated input: a draw whose own dispersion exceeds the
1.5x agreement band, or that Bench itself labeled contaminated, must
not become the floor — a poisoned floor would launder every future
poisoned draw.
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
rnd = int(sys.argv[2]) if len(sys.argv) > 2 else 0

with open(src) as f:
    d = json.load(f)

if d.get("contaminated"):
    sys.exit("refusing: the input draw is labeled contaminated")
if "dispersion" not in d:
    sys.exit("refusing: the input draw carries no dispersion field — "
             "a draw whose pass agreement was never measured cannot "
             "become the floor")
if d["dispersion"] > 1.5:
    sys.exit(f"refusing: input dispersion {d['dispersion']} exceeds 1.5 "
             "— draw the floor on a quiet box")
if d.get("failed"):
    sys.exit(f"refusing: the input draw has failed gates: {d['failed']}")

floor = {
    "metric": "floor",
    "sf": d["sf"],
    "recorded_round": rnd,
    "dispersion": d.get("dispersion"),
    "total": round(sum(d["queries"].values()), 3),
    "queries": {k: round(v, 3) for k, v in sorted(d["queries"].items())},
}
with open("BENCH_FLOOR.json", "w") as f:
    json.dump(floor, f, indent=1)
print(f"BENCH_FLOOR.json: {len(floor['queries'])} gates, "
      f"total {floor['total']} s, sf {floor['sf']}")
