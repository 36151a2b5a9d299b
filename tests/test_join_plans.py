"""Physical-plan assertions for the scale-pattern joins: the layout/skew
levers must actually produce the plan shape they advertise."""

from __future__ import annotations

from contextlib import contextmanager

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


@contextmanager
def _conf(spark, key, value):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed+sorted on the join key -> sort-merge join with
    ZERO exchanges (the whole point of paying the bucketed write)."""
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        df = REGISTRY["join_bucketed_colocated"].fn(spark, sf_dir)
        plan = _executed_plan(df)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_band_join_is_not_cartesian(spark, sf_dir):
    """The manufactured bucket key must give a hash-partitioned equi join,
    never BroadcastNestedLoop/Cartesian."""
    df = REGISTRY["join_band_inequality"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan


def test_salted_join_spreads_hot_keys(spark, sf_dir):
    """Salted join: the fact side's shuffle key must include the salt (so a
    hot user key hashes into SALT_BUCKETS partitions, not one)."""
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        df = REGISTRY["join_skew_salted"].fn(spark, sf_dir)
        plan = _executed_plan(df)
    assert "_salt" in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan


def test_full_outer_is_smj_both_sides_shuffled(spark, sf_dir):
    """Full outer keeps unmatched rows on both sides -> shuffle SMJ (no
    broadcast is legal for full outer with an equi key in Spark)."""
    df = REGISTRY["join_full_outer"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "SortMergeJoin" in plan and "FullOuter" in plan, plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan


def test_bitmap_distinct_has_no_expand(spark, sf_dir):
    """The bitmap formulation must not plan the count-distinct Expand —
    its partial state is the bitmap page, map-side combinable."""
    df = REGISTRY["agg_bitmap_distinct"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "Expand" not in plan, plan
    assert "bitmap_construct_agg" in plan


def test_contamination_broadcasts_eval_grams(spark, sf_dir):
    """Decontamination joins the 100 TB train side against a BROADCAST
    benchmark gram set — no shuffle of raw train grams."""
    df = REGISTRY["text_contamination_ngram"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_contamination_size_gate_fallback_matches_broadcast(spark, sf_dir):
    """Above the gram-count bound the eval set must NOT be broadcast (an
    oversized eval suite would OOM executors) — the shuffled-join fallback
    plans without a broadcast of eval grams and returns identical rows."""
    from go_batch_processor_spark.catalog import load_table
    from go_batch_processor_spark.operators.text import (
        CONTAM_N,
        contamination_hits,
    )
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    a = F.split("text", " ")
    grams = d.filter(F.size(a) >= CONTAM_N).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(a) - (CONTAM_N - 1)),
                lambda i: F.concat_ws(" ", F.slice(a, i, CONTAM_N)),
            )
        ).alias("g"),
    )
    eval_g = grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    train = grams.filter(F.col("doc_id") % 50 != 0)

    wide = contamination_hits(train, eval_g)  # default: under the bound
    assert "BroadcastHashJoin" in _executed_plan(wide)
    # Model the huge-eval case: gate rejects the hint AND Spark's own
    # threshold wouldn't volunteer a broadcast of a big table.
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        narrow = contamination_hits(train, eval_g, broadcast_max=0)
        narrow_plan = _executed_plan(narrow)
        narrow_rows = sorted(map(tuple, narrow.collect()))
    assert "BroadcastHashJoin" not in narrow_plan, narrow_plan
    assert sorted(map(tuple, wide.collect())) == narrow_rows


def test_ohlc_is_single_hash_aggregate_no_window(spark, sf_dir):
    """OHLC bars: min_by/max_by aggregate state, never a sort or window."""
    df = REGISTRY["timeseries_resample_ohlc"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan, plan


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Spark's runtime bloom-filter join pruning: a selective filter on the
    dimension side injects a might_contain() predicate on the FACT side's
    join key BEFORE the shuffle — at 100 TB this drops most fact rows at
    the scan instead of shuffling them. Thresholds are lowered here because
    the local fixture is far below the production 10 MB/10 GB defaults."""
    from pyspark.sql import functions as F
    from go_batch_processor_spark.catalog import load_table

    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"), _conf(
        spark, "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
    ), _conf(
        spark,
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    ):
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        o = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_totalprice") > 400000)
            .select("o_orderkey")
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = _executed_plan(j)
    assert "might_contain" in plan, plan
    assert "bloom_filter_agg" in plan, plan


def test_aqe_skew_join_splits_hot_partition(spark, sf_dir):
    """AQE skew-join splitting: a manufactured hot key (one join-key
    partition holding ~90% of the bytes) must be SPLIT at runtime — the
    finalized adaptive plan marks the sort-merge join with skew=true.
    This pins the runtime half of the 100x-scale joins claim (SCALE.md):
    unknown skew is handled by AQE even without the explicit salting the
    join_skew_salted operator applies for known-hot keys. Thresholds are
    shrunk because the manufactured fixture is megabytes, not the
    production 256 MB defaults."""
    from pyspark.sql import functions as F

    n = 60_000
    # non-foldable ~512 B payload per row, consumed POST-join (concat of
    # both sides) so column pruning cannot drop it from the shuffle
    def pad(name):
        return F.concat_ws(
            "", F.array_repeat(F.sha2(F.col("id").cast("string"), 256), 8)
        ).alias(name)

    # ~90% of left rows share key 0 -> one hot shuffle partition
    left = spark.range(n).select(
        F.when(F.col("id") % 10 == 0, F.col("id")).otherwise(F.lit(0)).alias("k"),
        pad("lpad"),
    )
    right = spark.range(2_000).select(F.col("id").alias("k"), pad("rpad"))
    with _conf(spark, "spark.sql.adaptive.enabled", "true"), _conf(
        spark, "spark.sql.adaptive.skewJoin.enabled", "true"
    ), _conf(
        spark, "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
    ), _conf(
        spark, "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB"
    ), _conf(
        spark, "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
    ), _conf(
        spark, "spark.sql.autoBroadcastJoinThreshold", "-1"
    ), _conf(
        spark, "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    ), _conf(
        spark, "spark.sql.adaptive.coalescePartitions.enabled", "false"
    ):
        j = left.join(right, "k").agg(
            F.max(F.substring(F.concat("lpad", "rpad"), 1, 8)).alias("m")
        )
        j.collect()  # AQE finalizes the plan only on execution
        plan = _executed_plan(j)
    assert "skew=true" in plan, plan


def test_dynamic_partition_pruning_on_partitioned_sink(spark, sf_dir):
    """Joining a hive-partitioned fact to a filtered dim must inject a
    dynamicpruning subquery on the fact's partition column, so only the
    dim-selected order_year directories are scanned — the runtime
    counterpart of static partition pruning, and the mechanism that keeps
    star-join scans bounded on a 100 TB date-partitioned table."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from go_batch_processor_spark.catalog import load_table

    out = os.path.join(tempfile.gettempdir(), f"gbp_dpp_{spark.sparkContext.applicationId}")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    o.select("o_orderkey", "o_totalprice", "order_year").write.mode(
        "overwrite"
    ).partitionBy("order_year").parquet(out)
    fact = spark.read.parquet(out)
    # dim: one row per year, filtered to a single year; joining on the
    # partition column makes the year filter prunable at runtime
    dim = (
        o.select("order_year")
        .distinct()
        .withColumn("is_hot", F.col("order_year") == 1997)
        .filter(F.col("is_hot"))
    )
    with _conf(spark, "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"):
        j = fact.join(dim, "order_year").groupBy("order_year").agg(
            {"o_totalprice": "sum"}
        )
        plan = _executed_plan(j)
    assert "dynamicpruning" in plan.lower(), plan


def test_plan_audit_codegen_regex_matches_formatted_mode(spark, sf_dir):
    """Regression for the r7 judge find: plan_audit greps must match the
    ExplainMode 'formatted' rendering ('WholeStageCodegen (N)'), not the
    simple/extended '[codegen id : N]' form — else the codegen column in
    PLANS.md is silently 0 everywhere. Relational keys must report >=1
    whole-stage-codegen span."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from plan_audit import audit, executed_plan_string, plan_string

    with _conf(spark, "spark.sql.adaptive.enabled", "false"):
        for key in ("agg_groupby_q1", "join_inner_equi"):
            df = REGISTRY[key].fn(spark, sf_dir)
            a = audit(plan_string(df), executed_plan_string(df))
            assert a["codegen_spans"] >= 1, (key, a)
