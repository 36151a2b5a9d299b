"""Audit version-sensitive DuckDB oracle constructs for driver-green
precedent (r9 verdict item 3).

The kaplan_meier saga (rounds 6-9) showed the right unit of driver-red
risk is the ORACLE CONSTRUCT, not the key: a DuckDB construct the
driver's DuckDB build has never evaluated green is an unbounded risk,
while a construct with even one driver-green precedent is proven to
parse, evaluate, and materialize identically there. This audit makes
that check mechanical:

1. The green set: every key whose LATEST driver CORRECTNESS row has
   hash_match (CORRECTNESS_r*.json in the repo root).
2. For every key that has never been driver-hash-checked, extract the
   version-sensitive constructs its oracle uses (regex table below —
   lambdas, list folds, recursive CTEs, quantile interpolation, FILTER
   clauses, materialized CTEs).
3. Flag any (key, construct) where NO green key's oracle uses the same
   construct.

Current precedent base (r09): WITH RECURSIVE (kalman pair, KM),
list_reduce + list_transform + lambdas (stats_welch_anova,
timeseries_stl_loess — both green r09), quantile_cont (15+ keys),
FILTER (many). A flag here means: rewrite the oracle to a proven
construct BEFORE the driver samples it, or add a diag-style probe.

Usage: python tools/oracle_construct_audit.py   (exit 1 on any flag)
Importable: audit() -> list[str] for the default pytest suite.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Version-sensitive DuckDB constructs. Plain SQL-92 surface (joins,
# windows, CASE, arithmetic) is deliberately absent: it has hundreds of
# green precedents and no plausible driver-version sensitivity.
CONSTRUCTS: dict[str, str] = {
    "WITH RECURSIVE": r"\bWITH\s+RECURSIVE\b",
    "AS MATERIALIZED": r"\bAS\s+MATERIALIZED\b",
    "lambda ->": r"->",
    "list_reduce": r"\blist_reduce\s*\(",
    "list_transform": r"\blist_transform\s*\(",
    "list_zip": r"\blist_zip\s*\(",
    "list_sort": r"\blist_sort\s*\(",
    "list_aggregate": r"\blist_aggregate\s*\(",
    "list(ORDER BY) agg": r"\blist\s*\(.+ORDER\s+BY",
    "quantile_cont": r"\bquantile_cont\s*\(",
    "quantile_disc": r"\bquantile_disc\s*\(",
    "FILTER clause": r"\bFILTER\s*\(",
    "HUGEINT cast": r"\bHUGEINT\b",
    "unnest": r"\bunnest\s*\(",
    "generate_series": r"\bgenerate_series\s*\(",
    "string_split/regexp": r"\b(string_split|regexp_extract|regexp_replace|regexp_matches)\s*\(",
}


def _constructs_of(sql: str) -> set[str]:
    return {
        name
        for name, pat in CONSTRUCTS.items()
        if re.search(pat, sql, flags=re.IGNORECASE | re.DOTALL)
    }


def latest_driver_status() -> dict[str, bool]:
    """key -> hash_match of its LATEST driver row (absent = never
    hash-checked; rows-only samples record no hash and stay absent)."""
    status: dict[str, bool] = {}
    for path in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    ):
        with open(path) as f:
            data = json.load(f)
        for key, row in data.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            hm = row.get("hash_match")
            if hm is not None:
                status[key] = bool(hm)
    return status


def audit() -> list[str]:
    """Return one message per zero-precedent (key, construct) pair."""
    _ensure_loaded()
    status = latest_driver_status()
    green_constructs: set[str] = set()
    for key, ok in status.items():
        spec = REGISTRY.get(key)
        if ok and spec is not None and spec.oracle:
            green_constructs |= _constructs_of(spec.oracle)
    problems: list[str] = []
    unchecked = 0
    for key, spec in sorted(REGISTRY.items()):
        if spec.oracle is None or status.get(key):
            continue
        unchecked += 1
        for c in sorted(_constructs_of(spec.oracle) - green_constructs):
            problems.append(
                f"{key}: oracle construct {c!r} has NO driver-green "
                f"precedent — rewrite to a proven construct before the "
                f"driver samples this key"
            )
    print(
        f"{len(green_constructs)} constructs with green precedent; "
        f"{unchecked} not-yet-green oracled keys audited; "
        f"{len(problems)} zero-precedent uses",
        file=sys.stderr,
    )
    return problems


def main() -> int:
    problems = audit()
    for p in problems:
        print(p)
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
