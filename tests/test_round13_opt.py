"""Round-13 optimization pins.

1. dist_rank._bucket_expr (the codegen CASE chain that replaced the
   interpreted size(filter(array)) HOF) must be value-identical to the
   HOF form for BOTH directions, including keys landing EXACTLY on a
   boundary (strict < / > semantics are what keep ties inside one
   bucket — the dist_rank correctness contract).
2. The r13 _spread insertions are plan-level rebalances; value parity
   for the affected keys is pinned by the oracle-parity suites. Here we
   pin the one plan property they claim: the gram-explode stage of the
   spread keys no longer hangs off a bare single-row-group scan (a
   round-robin exchange sits below the explode's project).
"""
from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from go_batch_processor_spark.dist_rank import _bucket_expr

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _hof_bucket(bounds, kd, *, descending):
    if not bounds:
        return F.lit(0)
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    if descending:
        return F.size(F.filter(barr, lambda b: kd < b))
    return F.size(F.filter(barr, lambda b: kd > b))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    bounds=st.lists(finite, min_size=0, max_size=9, unique=True),
    keys=st.lists(finite, min_size=1, max_size=20),
    descending=st.booleans(),
)
def test_bucket_case_chain_matches_hof(spark, bounds, keys, descending):
    bounds = sorted(bounds)
    # include every boundary itself as a key: strict-inequality semantics
    # at exact boundaries are the part a rewrite could silently break
    probe = keys + bounds
    df = spark.createDataFrame([(float(k),) for k in probe], "k double")
    kd = F.col("k").cast("double")
    got = df.select(
        "k",
        _bucket_expr(bounds, "k", descending=descending).alias("b_case"),
        _hof_bucket(bounds, kd, descending=descending).alias("b_hof"),
    ).collect()
    for r in got:
        assert r["b_case"] == r["b_hof"], (
            f"bucket mismatch at k={r['k']}: case={r['b_case']} "
            f"hof={r['b_hof']} bounds={bounds} desc={descending}"
        )


def test_spread_keys_have_rebalance_below_explode(spark, sf_dir):
    """The r13 _spread sites must put an exchange below the gram explode
    so the amplification stage is not bound to the scan's row-group
    layout (single-task on the fixture)."""
    from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    # text_ngram_novelty's spread sits behind an eager localCheckpoint
    # (the returned plan is a LogicalRDD scan), so it cannot be pinned
    # this way; its value parity is pinned by the oracle suites.
    for key in (
        "text_repeated_ngrams",
        "text_contamination_ngram",
        "dedup_exact_substring",
        "text_bigram_kn_logprob",
    ):
        df = REGISTRY[key].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "RoundRobinPartitioning" in plan or "REPARTITION" in plan, (
            f"{key}: expected a rebalance exchange in the plan;\n{plan[:2000]}"
        )
