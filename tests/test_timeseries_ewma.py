"""EWMA twin tests: distributed applyInPandas vs a driver-side pandas
groupby, plus a closed-form spot check of the recursion."""

from __future__ import annotations

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.operators.timeseries import EWMA_ALPHA
from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_ewma_matches_pandas_twin(spark, sf_dir):
    got = {
        (r.user_id, r.event_id): r.ewma
        for r in REGISTRY["timeseries_ewma"].fn(spark, sf_dir).collect()
    }
    pdf = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    pdf["ewma"] = (
        pdf.groupby("user_id")["value"]
        .transform(lambda s: s.ewm(alpha=EWMA_ALPHA, adjust=False).mean())
        .round(6)
    )
    want = {
        (r.user_id, r.event_id): r.ewma for r in pdf.itertuples()
    }
    assert got == want
    # closed-form: second point of any user = a*x2 + (1-a)*x1
    u = pdf.groupby("user_id").head(2).groupby("user_id").filter(lambda g: len(g) == 2)
    g = u[u.user_id == u.user_id.iloc[0]]
    x1, x2 = g["value"].iloc[0], g["value"].iloc[1]
    expect = round(EWMA_ALPHA * x2 + (1 - EWMA_ALPHA) * x1, 6)
    assert abs(got[(g.user_id.iloc[1], g.event_id.iloc[1])] - expect) < 1e-9
