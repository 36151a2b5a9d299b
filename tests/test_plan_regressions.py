"""Plan-shape regressions for the aggregate-consumed-twice finding:
ReuseExchange does NOT bridge a subtree consumed both as join input and
through a second aggregate (measured round 3), so these queries were
rewritten to window-over-agg-output. Pin the single-scan shape."""

from __future__ import annotations

import re

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q15_scans_lineitem_once(spark, sf_dir):
    plan = _executed(REGISTRY["tpch_q15_shape"].fn(spark, sf_dir))
    assert plan.count("lineitem") == 1, plan


def test_markov_scans_events_once_three_exchanges(spark, sf_dir):
    plan = _executed(REGISTRY["analytics_markov_transitions"].fn(spark, sf_dir))
    assert plan.count("events") == 1, plan
    n_ex = len(re.findall(r"Exchange (hash|range|Single)", plan))
    assert n_ex <= 3, plan


def test_pii_scrub_is_narrow(spark, sf_dir):
    """The scrub pass must stay a pure map: no exchange at all."""
    plan = _executed(REGISTRY["text_pii_scrub"].fn(spark, sf_dir))
    assert "Exchange" not in plan, plan
