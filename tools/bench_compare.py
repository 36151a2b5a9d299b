#!/usr/bin/env python
"""Diff two bench results (BENCH_r*.json or raw bench.py output lines):
per-query deltas, regressions, and totals over the common query set.

Run: python tools/bench_compare.py OLD.json NEW.json [threshold_sec]
"""

from __future__ import annotations

import json
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        data = json.loads(fh.readline() if path.endswith(".out") else fh.read())
    # driver round files wrap the parsed bench line under "parsed"
    if "parsed" in data:
        data = data["parsed"]
    return data["queries"]


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    old, new = load_queries(old_path), load_queries(new_path)
    common = sorted(set(old) & set(new))
    tot_old = sum(old[k] for k in common)
    tot_new = sum(new[k] for k in common)
    print(
        f"common {len(common)} queries: {tot_old:.2f}s -> {tot_new:.2f}s "
        f"({tot_new / tot_old:.2f}x)"
    )
    only_new = sorted(set(new) - set(old))
    if only_new:
        added = sum(new[k] for k in only_new)
        print(f"new-only {len(only_new)} queries: {added:.2f}s")
    print(f"\nper-query deltas beyond {threshold}s:")
    for k in sorted(common, key=lambda k: old[k] - new[k]):
        d = new[k] - old[k]
        if abs(d) > threshold:
            print(f"  {old[k]:7.3f} -> {new[k]:7.3f} ({d:+.2f})  {k}")


if __name__ == "__main__":
    main()
