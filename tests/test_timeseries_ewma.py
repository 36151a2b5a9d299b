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
    import numpy as np

    raw = pdf.groupby("user_id")["value"].transform(
        lambda s: s.ewm(alpha=EWMA_ALPHA, adjust=False).mean()
    )
    # Half-away-from-zero, matching the operator's JVM-side F.round
    # (pandas .round is banker's and diverges at exact half-points).
    pdf["ewma"] = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
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


def test_holt_matches_pandas_twin(spark, sf_dir):
    from go_batch_processor_spark.operators.timeseries import (
        HOLT_ALPHA,
        HOLT_BETA,
    )

    got = {
        (r.user_id, r.event_id): (r.level, r.trend)
        for r in REGISTRY["timeseries_holt_winters"].fn(spark, sf_dir).collect()
    }
    pdf = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    want = {}
    for uid, g in pdf.groupby("user_id"):
        x = g["value"].to_numpy(dtype="float64")
        l_p, b_p = x[0], 0.0
        want[(uid, g["event_id"].iloc[0])] = (round(l_p, 6), round(b_p, 6))
        for i in range(1, len(x)):
            l_c = HOLT_ALPHA * x[i] + (1 - HOLT_ALPHA) * (l_p + b_p)
            b_c = HOLT_BETA * (l_c - l_p) + (1 - HOLT_BETA) * b_p
            want[(uid, g["event_id"].iloc[i])] = (round(l_c, 6), round(b_c, 6))
            l_p, b_p = l_c, b_c
    assert got == want
    # closed-form second step of any multi-row user:
    sizes = pdf.groupby("user_id").size()
    uid = sizes[sizes >= 2].index[0]
    g = pdf[pdf.user_id == uid]
    x1, x2 = g["value"].iloc[0], g["value"].iloc[1]
    l2 = HOLT_ALPHA * x2 + (1 - HOLT_ALPHA) * x1
    b2 = HOLT_BETA * (l2 - x1)
    lv, tv = got[(uid, g["event_id"].iloc[1])]
    assert abs(lv - l2) < 1e-9 and abs(tv - b2) < 1e-9
