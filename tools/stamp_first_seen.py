#!/usr/bin/env python
"""Record the first-registered round of every registry key in
tools/key_first_seen.json (the never-checked tiebreak data for
registry.driver_sample_order — oldest unverified keys sample first).

Run once per round after adding operators:
    python tools/stamp_first_seen.py <round-number>
Existing entries are never modified; only missing keys are added.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "key_first_seen.json")


def main(round_no: int) -> None:
    _ensure_loaded()
    try:
        with open(PATH) as f:
            seen = {k: int(v) for k, v in json.load(f).items()}
    except (OSError, ValueError):
        seen = {}
    added = [k for k in REGISTRY if k not in seen]
    for k in added:
        seen[k] = round_no
    with open(PATH, "w") as f:
        json.dump(seen, f, indent=0, sort_keys=True)
    print(f"stamped {len(added)} new keys at round {round_no}; total {len(seen)}")


if __name__ == "__main__":
    main(int(sys.argv[1]))
