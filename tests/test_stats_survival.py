"""Numpy-twin tests for the survival suite's rows-only member
(stats_cox_ph) plus cross-consistency checks tying Cox to the oracled
KM / log-rank keys built on the identical risk-set machinery."""

from __future__ import annotations

import math

import numpy as np
import pytest

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _subjects(duck):
    """The exact subject frame stats_cox_ph derives (dur_h, e, x1, x2),
    rebuilt independently in DuckDB SQL."""
    return duck.sql(
        """
        WITH users AS (
          SELECT user_id,
                 min(ts) AS t0,
                 min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
          FROM events GROUP BY user_id
        )
        SELECT CASE WHEN tp IS NOT NULL
                     AND date_diff('second', t0, tp) < 48 * 3600
                    THEN CAST(floor(date_diff('second', t0, tp) / 3600.0)
                              AS BIGINT)
                    ELSE 48 END                                   AS dur_h,
               CASE WHEN tp IS NOT NULL
                     AND date_diff('second', t0, tp) < 48 * 3600
                    THEN 1.0 ELSE 0.0 END                         AS e,
               CAST(user_id % 2 AS DOUBLE)                        AS x1,
               CAST(hour(t0) AS DOUBLE) / 23.0                    AS x2
        FROM users
        """
    ).fetchall()


def _cox_newton_twin(rows, iters):
    """Independent Breslow Cox partial-likelihood Newton in numpy."""
    dur = np.array([r[0] for r in rows], dtype=np.int64)
    e = np.array([r[1] for r in rows])
    X = np.array([[r[2], r[3]] for r in rows])
    p = X.shape[1]
    times = np.unique(dur[e > 0])
    beta = np.zeros(p)
    for _ in range(iters):
        s = np.exp(X @ beta)
        g = np.zeros(p)
        H = np.zeros((p, p))
        for t in times:
            at_risk = dur >= t
            ev = (dur == t) & (e > 0)
            d = ev.sum()
            S0 = s[at_risk].sum()
            S1 = (s[at_risk, None] * X[at_risk]).sum(axis=0)
            S2 = (s[at_risk, None, None]
                  * X[at_risk, :, None] * X[at_risk, None, :]).sum(axis=0)
            g += X[ev].sum(axis=0) - d * S1 / S0
            H += d * (S2 / S0 - np.outer(S1, S1) / S0**2)
        beta = beta + np.linalg.solve(H, g)
    # Breslow partial log-likelihood at the converged beta
    s = np.exp(X @ beta)
    ll = 0.0
    for t in times:
        at_risk = dur >= t
        ev = (dur == t) & (e > 0)
        ll += (X[ev] @ beta).sum() - ev.sum() * math.log(s[at_risk].sum())
    return beta, ll


def test_cox_ph_matches_numpy_breslow_newton(spark, sf_dir, duck):
    from go_batch_processor_spark.operators.stats import COX_ITERS

    got = {
        r.term: r.value
        for r in REGISTRY["stats_cox_ph"].fn(spark, sf_dir).collect()
    }
    beta, ll = _cox_newton_twin(_subjects(duck), COX_ITERS)

    assert got["beta_grp_odd_user"] == pytest.approx(beta[0], abs=1e-6)
    assert got["beta_first_touch_hour"] == pytest.approx(beta[1], abs=1e-6)
    assert got["hr_grp_odd_user"] == pytest.approx(math.exp(beta[0]), abs=1e-6)
    assert got["hr_first_touch_hour"] == pytest.approx(
        math.exp(beta[1]), abs=1e-6
    )
    assert got["partial_ll"] == pytest.approx(ll, abs=1e-3)


def test_cox_ph_newton_converged(spark, sf_dir, duck):
    """One extra Newton step must move beta by < 1e-6 — i.e. COX_ITERS
    actually reaches the optimum on this data, so the pinned values are
    the MLE, not a truncation artifact."""
    from go_batch_processor_spark.operators.stats import COX_ITERS

    rows = _subjects(duck)
    beta_n, _ = _cox_newton_twin(rows, COX_ITERS)
    beta_n1, _ = _cox_newton_twin(rows, COX_ITERS + 1)
    assert np.abs(beta_n1 - beta_n).max() < 1e-6


def test_cox_grp_beta_agrees_with_log_rank_direction(spark, sf_dir):
    """Cross-check against the oracled log-rank key on the same risk
    sets: the sign of the Cox cohort coefficient must agree with the
    direction of the observed-vs-expected gap for group A (even users).
    beta_1 > 0 <=> odd users convert FASTER <=> group A (even) observes
    FEWER conversions than expected, and vice versa."""
    got = {
        r.term: r.value
        for r in REGISTRY["stats_cox_ph"].fn(spark, sf_dir).collect()
    }
    lr = REGISTRY["stats_log_rank_test"].fn(spark, sf_dir).collect()[0]
    o_minus_e = lr.observed_a - lr.expected_a
    if abs(o_minus_e) > 1e-6 and abs(got["beta_grp_odd_user"]) > 1e-9:
        assert (got["beta_grp_odd_user"] > 0) == (o_minus_e < 0)


def _fisher_lgamma_twin(a, b, c, d):
    """Independent Fisher twin via log-gamma (different formulation from
    the operator's ratio recurrence)."""
    from math import exp, lgamma

    def logc(n, k):
        return lgamma(n + 1) - lgamma(k + 1) - lgamma(n - k + 1)

    r1, r2, c1 = a + b, c + d, a + c
    n = r1 + r2
    lo, hi = max(0, c1 - r2), min(c1, r1)
    denom = logc(n, c1)
    pmf = {k: exp(logc(r1, k) + logc(r2, c1 - k) - denom) for k in range(lo, hi + 1)}
    p_obs = pmf[a]
    return min(1.0, sum(v for v in pmf.values() if v <= p_obs * (1 + 1e-7)))


def test_fisher_exact_recurrence_matches_lgamma_twin():
    from go_batch_processor_spark.operators.stats import _fisher_exact_p

    # scipy documentation example: fisher_exact([[8, 2], [1, 5]]) -> p=0.034965
    assert _fisher_exact_p(8, 2, 1, 5) == pytest.approx(0.03496503, abs=1e-7)
    # symmetric balanced table -> p = 1
    assert _fisher_exact_p(5, 5, 5, 5) == pytest.approx(1.0, abs=1e-12)
    # degenerate margins (empty row support) -> p = 1
    assert _fisher_exact_p(0, 0, 3, 7) == pytest.approx(1.0, abs=1e-12)
    for cells in [(8, 2, 1, 5), (12, 7, 3, 9), (100, 250, 130, 220), (1, 9, 11, 3)]:
        assert _fisher_exact_p(*cells) == pytest.approx(
            _fisher_lgamma_twin(*cells), rel=1e-9
        )


def test_fisher_exact_query_cells_match_oracle(spark, sf_dir, duck):
    got = REGISTRY["stats_fisher_exact"].fn(spark, sf_dir).collect()[0]
    want = duck.sql(
        """
        WITH users AS (
          SELECT user_id,
                 min(ts) AS t0,
                 min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
          FROM events GROUP BY user_id
        ),
        s AS (
          SELECT CASE WHEN tp IS NOT NULL
                       AND date_diff('second', t0, tp) < 48 * 3600
                      THEN 1 ELSE 0 END AS conv,
                 CAST(user_id % 2 AS INT) AS odd
          FROM users
        )
        SELECT sum((1 - odd) * conv)       AS a,
               sum((1 - odd) * (1 - conv)) AS b,
               sum(odd * conv)             AS c,
               sum(odd * (1 - conv))       AS d
        FROM s
        """
    ).fetchone()
    assert (got.a, got.b, got.c, got.d) == tuple(int(x) for x in want)
    assert got.p_two_sided == pytest.approx(
        _fisher_lgamma_twin(got.a, got.b, got.c, got.d), rel=1e-6
    )
    assert 0.0 <= got.p_two_sided <= 1.0
