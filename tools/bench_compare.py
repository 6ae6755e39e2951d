#!/usr/bin/env python3
"""Compare two graft bench artifacts query by query.

Accepts either format per side:
  - a raw Bench output line / bench_latest.json ({"metric": "total", ...})
  - a driver BENCH_r{N}.json wrapper ({"tail": "...", "parsed": ...}) —
    the truncated tail is salvaged: any complete "name":[s1,s2,...]
    sample groups found in it are used (medians of |samples|), so even a
    clipped artifact contributes its visible queries.

Usage: bench_compare.py OLD.json NEW.json [--top N]
Prints per-query new/old ratios (worst first) and the shared-set median.
"""
import json
import re
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return {k: abs(v) for k, v in d["queries"].items()}
    if d.get("parsed") and "queries" in (d["parsed"] or {}):
        return {k: abs(v) for k, v in d["parsed"]["queries"].items()}
    # salvage sample groups from a truncated tail
    tail = d.get("tail", "")
    out = {}
    for m in re.finditer(r'"(\w+)":\[([0-9.eE+,-]+)\]', tail):
        try:
            samples = [abs(float(x)) for x in m.group(2).split(",")]
        except ValueError:
            continue
        if samples:
            out[m.group(1)] = statistics.median(samples)
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 15
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1]) if "=" in a else top
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load(args[0]), load(args[1])
    shared = sorted(set(old) & set(new))
    if not shared:
        sys.exit("no shared queries between the two artifacts")
    rows = [(new[q] / old[q] if old[q] > 0 else float("inf"), q) for q in shared]
    rows.sort(reverse=True)
    print(f"{len(shared)} shared queries "
          f"({len(new) - len(shared)} only-new, {len(old) - len(shared)} only-old)")
    print(f"median ratio new/old: {statistics.median(r for r, _ in rows):.3f}")
    print(f"{'ratio':>7}  {'old_s':>8}  {'new_s':>8}  query")
    for r, q in rows[:top]:
        print(f"{r:7.2f}  {old[q]:8.3f}  {new[q]:8.3f}  {q}")


if __name__ == "__main__":
    main()
