#!/usr/bin/env python
"""Diff registry keys vs the union of all CORRECTNESS_r*.json driver rows.

Prints, per key: how many driver rounds have checked it, whether its
latest driver row was a FAIL (stale red), and whether it is in the
upcoming first-50 driver sample (``registry.all_queries()`` order, which
sorts stale-reds first, then never-checked, then least-checked). Run
after each round to confirm the rotation is covering the tail.

Usage:  python tools/driver_rotation.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_batch_processor_spark.registry import (  # noqa: E402
    _driver_check_history,
    all_queries,
)


def main() -> None:
    from go_batch_processor_spark.registry import REGISTRY

    counts, latest_fail, latest_rows_only = _driver_check_history()
    ordered = list(all_queries())
    sample = set(ordered[:50])
    never = [k for k in ordered if counts.get(k, 0) == 0]
    reds = [k for k in ordered if latest_fail.get(k, False)]
    upgraded = [
        k
        for k in ordered
        if counts.get(k, 0)
        and latest_rows_only.get(k, False)
        and REGISTRY[k].oracle is not None
    ]
    print(f"registered: {len(ordered)}")
    print(f"ever driver-checked: {sum(1 for k in ordered if counts.get(k, 0))}")
    print(f"never driver-checked: {len(never)}")
    print(f"stale-red (latest driver row FAIL): {len(reds)}")
    print(f"oracle-upgraded awaiting driver hash gate: {len(upgraded)}")
    uncovered = [k for k in never + reds + upgraded if k not in sample]
    print(
        "red/never-checked/oracle-upgraded NOT in next first-50 sample: "
        f"{len(uncovered)}"
    )
    print()
    print(f"{'key':<36} {'checks':>6} {'red':>4} {'upg':>4}  in-next-sample")
    for k in ordered:
        red = "RED" if latest_fail.get(k, False) else ""
        upg = "UPG" if k in upgraded else ""
        print(
            f"{k:<36} {counts.get(k, 0):>6} {red:>4} {upg:>4}  "
            f"{'yes' if k in sample else ''}"
        )


if __name__ == "__main__":
    main()
