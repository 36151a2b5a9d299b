"""Run every registered query against its DuckDB oracle at sf0.001 —
a local, stricter mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded
from tests.parity import assert_frames_match

_ensure_loaded()

WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.sql(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
