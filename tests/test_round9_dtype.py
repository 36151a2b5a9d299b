"""Round-9 regression gates for the output-dtype-KIND doctrine.

The stats_kaplan_meier / stats_nelson_aalen r06-r08 driver-only hash reds
were an output-dtype divergence (oracle HUGEINT -> pandas float64 vs Spark
int64 — identical values, different hash), invisible to the old
float-coercing local compare. These tests keep the whole class dead:

- the static whole-registry audit (DuckDB DESCRIBE vs Spark lazy schema)
  must report zero kind mismatches;
- tests/parity.assert_frames_match must REJECT an int/float dtype split
  even when values are numerically equal (the driver-faithful behavior),
  while tolerating the decimal/float split the driver demonstrably
  accepts (agg_decimal_exact driver-green r04).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from go_batch_processor_spark.catalog import TABLE_NAMES
from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded
from tests.parity import assert_frames_match

_ensure_loaded()


def test_registry_oracle_output_dtype_kinds_match(spark, sf_dir):
    from oracle_dtype_audit import duck_kind, spark_kind

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = []
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None:
            continue
        dkinds = {
            r[0]: duck_kind(r[1])
            for r in con.sql(f"DESCRIBE ({spec.oracle})").fetchall()
        }
        skinds = {
            f.name: spark_kind(f.dataType)
            for f in spec.fn(spark, sf_dir).schema.fields
        }
        for c in sorted(set(dkinds) | set(skinds)):
            dk, sk = dkinds.get(c), skinds.get(c)
            # decimal<->float materializes identically (duckdb .df() maps
            # DECIMAL to float64) — allowed, same rule as tests/parity.py.
            if dk == "decimal":
                dk = "float"
            if sk == "decimal":
                sk = "float"
            if dk != sk:
                bad.append((name, c, sk, dk))
    assert not bad, f"oracle output dtype-kind mismatches: {bad}"


def test_parity_compare_rejects_int_float_split():
    a = pd.DataFrame({"k": [1, 2], "v": [10, 20]})  # int64
    b = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})  # float64: equal values
    with pytest.raises(AssertionError, match="dtype-kind"):
        assert_frames_match(a, b, name="int_float_split")


def test_parity_compare_tolerates_decimal_float_split():
    import decimal

    a = pd.DataFrame(
        {"k": [1, 2], "v": [decimal.Decimal("1.50"), decimal.Decimal("2.25")]}
    )
    b = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.25]})
    assert_frames_match(a, b, name="decimal_float_split")
