#!/usr/bin/env python3
"""Fold bench runs into a per-query MIN envelope (dev tool).

Usage: fold_baseline.py OUT.json NOTE IN1.json [IN2.json ...]

Each input is a Bench.scala output object ({"queries": {...}}) or a
prior fold. The output keeps, per query, the MINIMUM wall across every
input that measured it — the least-co-tenant-noise estimate the round's
regression gate diffs against (see PERF.md's envelope discipline).
"""
import json, sys

out_path, note = sys.argv[1], sys.argv[2]
queries = {}
for p in sys.argv[3:]:
    d = json.load(open(p))
    q = d.get("queries") or (d.get("parsed") or {}).get("queries")
    if not q:
        raise SystemExit(f"{p}: no queries object")
    for k, v in q.items():
        queries[k] = min(queries.get(k, float("inf")), v)

fold = {
    "metric": "total",
    "value": round(sum(queries.values()), 3),
    "unit": "sec",
    "n": len(queries),
    "queries": dict(sorted(queries.items())),
    "sf": "/root/testdata/sf0.1",
    "note": note,
}
json.dump(fold, open(out_path, "w"), indent=1)
print(f"{out_path}: {fold['value']} s over {fold['n']} queries")
