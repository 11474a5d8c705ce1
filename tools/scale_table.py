#!/usr/bin/env python3
"""Whole-pack scale table: per-query ratio between two Bench dumps
(baseline SF vs a ScaleUp-amplified tier). Emits the PERF.md markdown
rows for every query at or above the ratio threshold plus summary
stats. Usage: scale_table.py <base.json> <scaled.json> [ratio_floor]
(Dev tool only — not part of the shipped Scala library.)"""
import json, sys

base = json.load(open(sys.argv[1]))["queries"]
scaled = json.load(open(sys.argv[2]))["queries"]
floor = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

rows = []
for q in sorted(base):
    if q not in scaled:
        print(f"MISSING in scaled run: {q}")
        continue
    b, s = base[q], scaled[q]
    rows.append((s / b if b > 0 else float("inf"), b, s, q))

rows.sort(reverse=True)
n = len(rows)
sub2 = sum(1 for r, *_ in rows if r < 2.0)
subl = sum(1 for r, *_ in rows if r < 10.0)
print(f"queries={n} sub-2x={sub2} ({100*sub2/n:.1f}%) sub-linear(<10x)={subl} ({100*subl/n:.1f}%)")
print(f"total base={sum(b for _, b, _, _ in rows):.1f}s scaled={sum(s for _, _, s, _ in rows):.1f}s "
      f"pack-ratio={sum(s for _, _, s, _ in rows)/sum(b for _, b, _, _ in rows):.2f}x")
print(f"\n| query | sf0.1 (s) | 10x (s) | ratio |\n|---|---|---|---|")
for r, b, s, q in rows:
    if r >= floor:
        print(f"| {q} | {b:.2f} | {s:.2f} | {r:.1f}x |")
