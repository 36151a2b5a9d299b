"""Bucketed-table joins: the zero-shuffle co-location strategy SCALE.md
promises for repeated join keys — verified on a real saveAsTable round trip
(plan must contain no Exchange on the bucketed join path)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    (
        o.write.bucketBy(N_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("orders_bkt")
    )
    (
        c.write.bucketBy(N_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable("customer_bkt")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ob = spark.table("orders_bkt")
    cb = spark.table("customer_bkt")
    joined = ob.join(cb, ob.o_custkey == cb.c_custkey).select(
        "o_orderkey", "c_custkey", "o_totalprice"
    )
    # Broadcast would also avoid the shuffle trivially — disable it so the
    # plan proves bucket co-location, not small-table luck.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_table_format_stub_raises_clearly(spark):
    from go_batch_processor_spark.sources.table_formats import read_table_format

    with pytest.raises(NotImplementedError, match="jars"):
        read_table_format(spark, "delta", "/tmp/nowhere")
    with pytest.raises(ValueError, match="unknown table format"):
        read_table_format(spark, "parquetx", "/tmp/nowhere")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    ob = spark.table("orders_bkt")
    cb = spark.table("customer_bkt")
    got = (
        ob.join(cb, ob.o_custkey == cb.c_custkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        .first()
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    want = (
        o.join(c, o.o_custkey == c.c_custkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        .first()
    )
    assert (got.n, got.s) == (want.n, want.s)


def test_compaction_collapses_file_count(spark, sf_dir):
    """sink_compact_small_files must actually fix the small-files problem:
    the fragmented write produces many files (maxRecordsPerFile=50), the
    compacted rewrite exactly COMPACT_TARGET_FILES — and content survives."""
    import glob
    import os

    from go_batch_processor_spark.operators.scans import (
        COMPACT_TARGET_FILES,
        _sink_path,
    )
    from go_batch_processor_spark.registry import REGISTRY

    out = REGISTRY["sink_compact_small_files"].fn(spark, sf_dir)
    n_rows = out.count()
    frag = glob.glob(os.path.join(_sink_path(spark, "gbp_spark_sink_fragmented"), "*.parquet"))
    comp = glob.glob(os.path.join(_sink_path(spark, "gbp_spark_sink_compacted"), "*.parquet"))
    assert len(frag) >= n_rows // 50  # truly fragmented
    assert len(comp) == COMPACT_TARGET_FILES
    assert len(comp) < len(frag) / 2
