"""Regression tests for events.ts parquet physical-unit detection.

Fixture regenerations have flipped events.ts between TIMESTAMP(NANOS) and
TIMESTAMP(MICROS); round 3 ended red because the catalog hard-coded the
nanos path and a micros fixture was divided by 1000 twice (a 30-day stream
collapsed to ~43 minutes). These tests pin the unit-detection branch with
one on-disk fixture file of EACH unit so the next regeneration can't
silently break the events family again.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from go_batch_processor_spark.catalog import events_ts_unit, load_table

TS = [
    dt.datetime(2024, 1, 1, 0, 0, 7, 179575),
    dt.datetime(2024, 1, 15, 12, 30, 0, 500001),
    dt.datetime(2024, 1, 30, 23, 57, 12, 194062),
]


def _write_events(dirpath: str, unit: str) -> None:
    os.makedirs(f"{dirpath}/events.parquet", exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS, pa.timestamp(unit)),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, f"{dirpath}/events.parquet/part-0.parquet")


@pytest.fixture(scope="module")
def unit_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("tsunit")
    us_dir, ns_dir = str(base / "us"), str(base / "ns")
    _write_events(us_dir, "us")
    _write_events(ns_dir, "ns")
    return us_dir, ns_dir


def test_unit_detection(unit_dirs):
    us_dir, ns_dir = unit_dirs
    assert events_ts_unit(f"{us_dir}/events.parquet") == "us"
    assert events_ts_unit(f"{ns_dir}/events.parquet") == "ns"


def test_load_table_identical_across_units(spark, unit_dirs):
    us_dir, ns_dir = unit_dirs
    rows_us = {
        r["event_id"]: r["ts"]
        for r in load_table(spark, us_dir, "events").collect()
    }
    rows_ns = {
        r["event_id"]: r["ts"]
        for r in load_table(spark, ns_dir, "events").collect()
    }
    assert rows_us == rows_ns
    assert rows_us[1] == TS[0]
    assert rows_us[3] == TS[2]
    span = rows_us[3] - rows_us[1]
    assert span > dt.timedelta(days=29)


def test_inplace_regen_invalidates_cache(tmp_path):
    """A fixture regenerated in-place with a different unit must NOT hit a
    stale cache entry — that would be silent 1000x time scaling."""
    d = str(tmp_path / "regen")
    _write_events(d, "us")
    assert events_ts_unit(f"{d}/events.parquet") == "us"
    _write_events(d, "ns")
    # force an mtime difference even on coarse-resolution filesystems
    part = f"{d}/events.parquet/part-0.parquet"
    st = os.stat(part)
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert events_ts_unit(f"{d}/events.parquet") == "ns"


def test_empty_dataset_dir_raises(tmp_path):
    d = str(tmp_path / "empty" / "events.parquet")
    os.makedirs(d)
    with pytest.raises(FileNotFoundError, match="no parquet part file"):
        events_ts_unit(d)


def test_current_fixture_spans_days(spark, sf_dir):
    """The live fixture must read as a multi-day stream, whatever its unit."""
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "events")
    r = df.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).collect()[0]
    assert (r["mx"] - r["mn"]) > dt.timedelta(days=7)
