#!/usr/bin/env python
"""Drive the full driver contract exactly as the round driver does, in
THIS process: entry() smoke at sf0.001, then every queries() entry at the
gate scale with a row-count check against its oracle_sql() twin.

This is the verify surface (.claude/skills/verify/SKILL.md). Value-level
parity is pytest's job (tests/test_oracle_parity*.py); this script is the
fresh-process end-to-end check that catches pickle-by-value gaps, session
conf drift, and anything else pytest's long-lived session masks.

Usage:  python tools/contract_drive.py [sf_dir]      (default sf0.01)
Env:    SPARK_GRAFT_DRIVE_MASTER (default local[8])
Exit:   0 all green; 1 any failure (failures listed on stdout).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from go_batch_processor_spark.catalog import TABLE_NAMES  # noqa: E402
from go_batch_processor_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    master = os.environ.get("SPARK_GRAFT_DRIVE_MASTER", "local[8]")
    spark = get_spark(app_name="contract-drive", master=master, shuffle_partitions=8)
    print("entry rows:", len(E.entry(spark).collect()))

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, osql = E.queries(), E.oracle_sql()
    fails: list[tuple[str, str]] = []
    for name, fn in sorted(qs.items()):
        try:
            n = fn(spark, sf).count()
            if name in osql:
                on = con.sql(f"SELECT count(*) FROM ({osql[name]})").fetchone()[0]
                assert n == on, f"rowcount {n} != oracle {on}"
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append((name, str(e)[:200]))
            print("FAIL", name, str(e)[:200])
    print(f"total: {len(qs)} fails: {len(fails)}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
