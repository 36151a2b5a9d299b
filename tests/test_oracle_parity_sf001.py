"""Full oracle-parity sweep pinned at sf0.01 — the EXACT scale the round
driver's CORRECTNESS gate runs at.

The regular suite runs at $SPARK_GRAFT_TEST_SF (default sf0.001); the r3
red round was a fixture-SCALE artifact (the events.ts unit bug produced
plausible output at sf0.001 spans but collapsed 30 days at driver scale),
so scale-sensitive parity gets its own marked job that cannot drift from
the driver's setup. Deselected by default (see pytest.ini); run with

    python -m pytest -m sf001 --override-ini="addopts=" -q
"""

from __future__ import annotations

import duckdb
import pytest

from go_batch_processor_spark.catalog import TABLE_NAMES
from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded
from tests.parity import assert_frames_match

_ensure_loaded()

pytestmark = pytest.mark.sf001

SF01 = "/root/testdata/sf0.01"

WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF01}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle_sf001(spark, duck01, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, SF01).toPandas()
    oracle_pdf = duck01.sql(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs_sf001(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF01)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
