"""Bloom-prefilter semi-join: the filter must never drop a true match
(no false negatives) and must actually prune non-matching fact rows at
the fixture's selectivity (the whole point of the operator).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_table
from tests.conftest import SF_DIR


def _bloom_candidates(spark, sf_dir):
    """Re-derive the candidate set the operator's Bloom stage produces
    (same constants as operators/joins.py::join_bloom_prefilter)."""
    n_blocks = 8192
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    build = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("_k"))
        .distinct()
    )

    def with_bloom_cols(df, key):
        return (
            df.withColumn("_blk", F.pmod(F.xxhash64(F.col(key)), F.lit(n_blocks)))
            .withColumn(
                "_b1", F.pmod(F.xxhash64(F.col(key), F.lit(1)), F.lit(64)).cast("int")
            )
            .withColumn(
                "_b2", F.pmod(F.xxhash64(F.col(key), F.lit(2)), F.lit(64)).cast("int")
            )
            .withColumn("_mask", F.expr("shiftleft(1L, _b1) | shiftleft(1L, _b2)"))
            .drop("_b1", "_b2")
        )

    bloom = (
        with_bloom_cols(build, "_k")
        .groupBy("_blk")
        .agg(F.bit_or("_mask").alias("_bits"))
    )
    candidates = (
        with_bloom_cols(li, "l_orderkey")
        .join(F.broadcast(bloom), "_blk", "inner")
        .filter(F.col("_bits").bitwiseAND(F.col("_mask")) == F.col("_mask"))
    )
    return li, build, candidates


def test_bloom_no_false_negatives(spark):
    li, build, candidates = _bloom_candidates(spark, SF_DIR)
    true_matches = li.join(
        build, li.l_orderkey == F.col("_k"), "left_semi"
    ).count()
    # every true match must survive the Bloom stage
    surviving_true = candidates.join(
        build, candidates.l_orderkey == F.col("_k"), "left_semi"
    ).count()
    assert surviving_true == true_matches


def test_bloom_actually_prunes(spark):
    li, build, candidates = _bloom_candidates(spark, SF_DIR)
    total = li.count()
    n_candidates = candidates.count()
    true_matches = li.join(
        build, li.l_orderkey == F.col("_k"), "left_semi"
    ).count()
    # candidates is a (possibly strict) superset of true matches...
    assert true_matches <= n_candidates
    # ...and the filter removed a large share of the non-matching fact rows.
    # With 2 bits/key over 8192*64 bits and <=~300 build keys at sf0.001,
    # FPR is well under 1%; demand at least a 2x reduction to stay robust
    # across fixture regens and sf0.01 runs.
    assert n_candidates <= max(true_matches * 2, total // 2)


def test_bloom_filter_is_broadcast_sized(spark):
    _, _, candidates = _bloom_candidates(spark, SF_DIR)
    plan = candidates._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
