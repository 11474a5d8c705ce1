#!/usr/bin/env python3
"""Per-query bench regression diff (dev tool, not part of the library).

Usage: bench_diff.py OLD.json NEW.json [ratio_threshold]

Accepts either format:
  - Bench.scala's own output line/file: {"metric":..., "queries":{...}}
  - the driver's BENCH_r{N}.json wrapper: {"parsed": {...}|null, "tail": "..."}
    (when "parsed" is null, the JSON line is recovered from "tail")

A query is flagged when new/old exceeds the threshold (default 1.5x) AND
the absolute delta is > 0.3 s — local[32] runs are noisy (+-50% under
concurrent JVMs), so small absolute swings are not signal. Exit code 1 on
any flagged regression, so this can gate a round.
"""
import json, re, sys


def load(path):
    d = json.load(open(path))
    if "queries" in d:
        return d
    if d.get("parsed"):
        return d["parsed"]
    # recover the JSON line from the captured tail (sbt [info] prefixes)
    for line in reversed(d.get("tail", "").splitlines()):
        m = re.search(r'\{"metric".*\}', line)
        if m:
            return json.loads(m.group(0))
    raise SystemExit(f"{path}: no bench JSON found")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    oq, nq = old["queries"], new["queries"]
    flagged = []
    for name in sorted(set(oq) | set(nq)):
        if name not in oq:
            print(f"NEW      {name}: {nq[name]:.2f}s")
            continue
        if name not in nq:
            print(f"DROPPED  {name} (was {oq[name]:.2f}s)")
            continue
        a, b = oq[name], nq[name]
        ratio = b / a if a > 0 else float("inf")
        tag = "ok"
        if ratio > thresh and b - a > 0.3:
            tag = "REGRESSED"
            flagged.append(name)
        elif ratio < 1 / thresh and a - b > 0.3:
            tag = "improved"
        if tag != "ok":
            print(f"{tag:9s}{name}: {a:.2f}s -> {b:.2f}s ({ratio:.2f}x)")
    print(f"total: {old.get('value', 0):.1f}s -> {new.get('value', 0):.1f}s; "
          f"{len(flagged)} regression(s) past {thresh}x+0.3s")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
