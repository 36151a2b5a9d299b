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
