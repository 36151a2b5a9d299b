"""Quick single-key parity check outside pytest: python tools/check_keys.py key1 key2 ...

Runs each named registry key against its DuckDB oracle at sf0.001 (or
$SPARK_GRAFT_TEST_SF) with the same comparison the parity suite uses.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from go_batch_processor_spark.catalog import TABLE_NAMES
from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded
from go_batch_processor_spark.session import get_spark
from tests.parity import assert_frames_match

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def main(keys: list[str]) -> int:
    _ensure_loaded()
    spark = get_spark(app_name="gbp-check", master="local[4]", shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    rc = 0
    for k in keys:
        spec = REGISTRY[k]
        spdf = spec.fn(spark, SF_DIR).toPandas()
        if spec.oracle is None:
            print(f"{k}: rows-only, {len(spdf)} rows, cols={list(spdf.columns)}")
            continue
        odf = con.sql(spec.oracle).df()
        try:
            assert_frames_match(spdf, odf, name=k)
            print(f"{k}: OK ({len(spdf)} rows)")
        except AssertionError as e:
            rc = 1
            print(f"{k}: FAIL — {e}")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
