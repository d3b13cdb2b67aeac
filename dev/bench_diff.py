#!/usr/bin/env python3
"""Round-over-round bench regression diff: compare two full per-query
bench artifacts and print every query whose reading moved >= RATIO x
over the baseline, above a FLOOR that filters sub-second jitter.
Usage:
    python3 dev/bench_diff.py <baseline.json> <current.json> [ratio] [floor_sec]
Exit code 1 when regressions print (so the closing chain can gate on it).
The artifacts are graft.Bench's committable full-suite files
(bench_full_latest.json / bench_full_rN.json) or any JSON with a
top-level {"queries": {name: seconds}}.
"""
import sys, json

base_p, cur_p = sys.argv[1], sys.argv[2]
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0


def load(p):
    with open(p) as f:
        d = json.load(f)
    return d.get("queries", d)


base, cur = load(base_p), load(cur_p)
common = sorted(set(base) & set(cur))
regs = []
for q in common:
    b, c = float(base[q]), float(cur[q])
    if c >= floor and b > 0 and c / b >= ratio:
        regs.append((c / b, q, b, c))
print(f"compared {len(common)} common queries "
      f"({len(cur) - len(common)} new in current, "
      f"{len(base) - len(common)} dropped from baseline); "
      f"ratio>={ratio} floor={floor}s")
for r, q, b, c in sorted(regs, reverse=True):
    print(f"REG {q}: {b:.2f}s -> {c:.2f}s ({r:.2f}x)")
if not regs:
    print("no regressions over threshold")
sys.exit(1 if regs else 0)
