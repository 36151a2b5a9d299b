"""The driver hands queries its OWN SparkSession — queries must produce
oracle-correct results even when that session starts with hostile confs."""

from __future__ import annotations

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded
from tests.parity import assert_frames_match

_ensure_loaded()


def test_query_correct_under_non_utc_session(spark, duck, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        spec = REGISTRY["scalar_date"]  # timestamp-heavy query
        spark_pdf = spec.fn(spark, sf_dir).toPandas()
        oracle_pdf = duck.sql(spec.oracle).df()
        assert_frames_match(spark_pdf, oracle_pdf, name="scalar_date/non-utc")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_events_readable_without_prior_nanos_conf(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try:
        df = REGISTRY["stream_tumbling_window"].fn(spark, sf_dir)
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
