"""Error-bound tests for the mergeable-sketch aggregates (rows-only
queries get their correctness signal here instead of the DuckDB oracle)."""

from __future__ import annotations

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_hll_partitioned_merge_error_bound(spark, sf_dir):
    row = REGISTRY["agg_hll_partitioned_merge"].fn(spark, sf_dir).collect()[0]
    # HllSketch at Spark's default lgConfigK=12 has ~1.6% standard error;
    # 5% is a >3-sigma bound, deterministic for a fixed input set.
    assert row.exact_distinct > 0
    assert row.rel_err < 0.05, row
    # merged estimate must also dominate every single partition's count
    assert row.hll_estimate > 0


def test_hll_merge_matches_flat_sketch(spark, sf_dir):
    """Union of per-nation sketches must estimate like one flat sketch
    over all keys — the mergeability property the 100 TB rollup pattern
    depends on. NOT bit-equality: past sparse mode (~>512 keys, so at
    sf>=0.01) the flat and union paths promote to dense HLL differently
    and the estimates legitimately diverge WITHIN the sketch's error
    bound (lgk=12 -> ~1.6% stderr); both must stay near the true count
    and near each other."""
    from pyspark.sql import functions as F

    from go_batch_processor_spark.catalog import load_table

    c = load_table(spark, sf_dir, "customer")
    flat = c.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey")).alias("est")
    ).collect()[0].est
    merged = (
        c.groupBy("c_nationkey")
        .agg(F.hll_sketch_agg("c_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    true = c.select("c_custkey").distinct().count()
    assert abs(flat - true) / max(true, 1.0) < 0.03
    assert abs(merged - true) / max(true, 1.0) < 0.03
    assert abs(flat - merged) / max(flat, 1.0) < 0.02


def test_hll_intersection_tracks_exact_bitmap_setops(spark, sf_dir):
    """The HLL inclusion-exclusion overlap must track the EXACT bitmap
    set-ops twin within the compounded sketch error. Three lgk=12
    sketches each carry ~1.6% stderr; inclusion-exclusion compounds
    absolute errors, so the intersection bound is relative to the UNION
    size (the documented caveat), not the intersection size."""
    from go_batch_processor_spark.registry import REGISTRY

    approx = REGISTRY["agg_hll_intersection"].fn(spark, sf_dir).collect()[0]
    exact = REGISTRY["agg_bitmap_setops"].fn(spark, sf_dir).collect()[0]
    assert abs(approx.est_click - exact.n_click) / max(exact.n_click, 1) < 0.05
    assert (
        abs(approx.est_purchase - exact.n_purchase) / max(exact.n_purchase, 1)
        < 0.05
    )
    assert abs(approx.est_union - exact.n_union) / max(exact.n_union, 1) < 0.05
    assert (
        abs(approx.est_intersect - exact.n_intersect) / max(exact.n_union, 1)
        < 0.10
    )
