"""Cross-operator invariants for the round-6 additions — relations that
hold by THEORY, not by fixture accident, so they pin the semantics
independently of the DuckDB oracles."""

from __future__ import annotations

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir).toPandas()


def test_cms_estimate_dominates_truth_for_every_key(spark, sf_dir):
    """Count-Min's one-sided guarantee: est >= true for ALL keys, not
    just the reported top-N."""
    import pandas as pd
    from go_batch_processor_spark.operators.aggregates import (
        CMS_DEPTH,
        CMS_WIDTH,
    )

    pdf = _run("agg_count_min_sketch", spark, sf_dir)
    assert (pdf["overestimate"] >= 0).all()
    # and the error is bounded well below the trivial n bound
    n = pdf["true_n"].sum()
    assert (pdf["overestimate"] <= 2 * CMS_DEPTH * n / CMS_WIDTH + 1).all()


def test_pacf_lag1_equals_acf_lag1(spark, sf_dir):
    """Durbin-Levinson base case: pacf(1) == acf(1) by definition."""
    pacf = _run("timeseries_pacf", spark, sf_dir)
    acf = _run("timeseries_acf", spark, sf_dir)
    a1 = float(acf.loc[acf["lag_h"] == 1, "acf"].iloc[0])
    p1 = float(pacf["pacf_1"].iloc[0])
    assert abs(p1 - a1) < 2e-6  # both rounded to 6 independently


def test_nelson_aalen_below_neg_log_km(spark, sf_dir):
    """1-x <= exp(-x) => H_NA(t) <= -ln(S_KM(t)) at every event time."""
    import numpy as np

    na = _run("stats_nelson_aalen", spark, sf_dir).set_index("dur_h")
    na["cum_hazard"] = na["cum_hazard_micros"] / 1e6
    km = _run("stats_kaplan_meier", spark, sf_dir).set_index("dur_h")
    km["survival"] = km["survival_micros"] / 1e6
    joined = na.join(km[["survival"]], how="inner")
    ok = joined[joined["survival"] > 0]
    assert len(ok) > 0
    assert (
        ok["cum_hazard"] <= -np.log(ok["survival"]) + 1e-4
    ).all()


def test_tost_bounds_ordered_and_consistent(spark, sf_dir):
    row = _run("stats_tost_equivalence", spark, sf_dir).iloc[0]
    # t_lower tests diff > -margin, t_upper tests diff < +margin:
    # t_lower - t_upper = 2*margin/se > 0 always.
    assert row["t_lower"] > row["t_upper"]
    eq = bool(row["equivalent"])
    from go_batch_processor_spark.operators.stats import TOST_Z_CRIT

    assert eq == (
        row["t_lower"] > TOST_Z_CRIT and row["t_upper"] < -TOST_Z_CRIT
    )


def test_first_document_has_full_novelty(spark, sf_dir):
    """The lowest doc_id sees every one of its trigrams first."""
    pdf = _run("text_ngram_novelty", spark, sf_dir)
    first = pdf.sort_values("doc_id").iloc[0]
    assert first["novelty"] == 1.0
    assert (pdf["n_novel"] <= pdf["n_grams"]).all()
    assert (pdf["novelty"] >= 0).all() and (pdf["novelty"] <= 1).all()


def test_chapman_below_lincoln_petersen(spark, sf_dir):
    """Chapman's bias correction shrinks the LP estimate (m >= 1)."""
    row = _run("stats_capture_recapture", spark, sf_dir).iloc[0]
    assert row["m"] >= 1
    assert row["chapman"] <= row["lincoln_petersen"]
    assert row["n_true"] >= max(row["n1"], row["n2"])


def test_psi_total_nonnegative(spark, sf_dir):
    """PSI is a (smoothed) divergence — the total cannot be negative."""
    pdf = _run("stats_psi_population_stability", spark, sf_dir)
    assert float(pdf["psi_total"].iloc[0]) >= 0.0


def test_markov_rows_normalize(spark, sf_dir):
    """Each src row of the transition matrix sums to ~1."""
    pdf = _run("analytics_markov_transitions", spark, sf_dir)
    sums = pdf.groupby("from_type")["p_transition"].sum()
    # p is rounded to 4 dp per cell; a 5-dst row can drift 5e-4/2
    assert ((sums - 1.0).abs() < 1e-3).all()


def test_compression_ratio_matches_zlib_twin(spark, sf_dir):
    """Operator == python zlib on the same rows; repetition compresses
    harder than prose."""
    import zlib

    import pandas as pd

    got = _run("text_compression_ratio", spark, sf_dir)
    docs = (
        REGISTRY["scan_parquet"].fn(spark, sf_dir).sparkSession.read.parquet(
            f"{sf_dir}/documents.parquet"
        )
        .select("doc_id", "text")
        .toPandas()
    )
    twin = {
        r.doc_id: round(
            len(zlib.compress(r.text.encode("utf-8"), 6))
            / max(1, len(r.text.encode("utf-8"))),
            6,
        )
        for r in docs.itertuples()
    }
    for r in got.itertuples():
        assert twin[r.doc_id] == r.compression_ratio
    # a highly repetitive string compresses far harder than the corpus
    rep = len(zlib.compress(b"spam " * 200, 6)) / 1000.0
    assert rep < got["compression_ratio"].min()


def test_linear_attribution_conserves_value(spark, sf_dir):
    """Linear credit + direct bucket == total purchase value exactly."""
    from pyspark.sql import functions as F
    from go_batch_processor_spark.catalog import load_table

    got = _run("analytics_attribution_linear", spark, sf_dir)
    total_credit = float(got["total_credit"].sum())
    truth = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert abs(total_credit - float(truth)) < 1e-2
