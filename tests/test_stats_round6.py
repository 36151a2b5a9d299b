"""Invariant pins for the round-6 stats additions (value-level oracle
parity is covered by the generic parity sweep; these pin the statistical
semantics the oracle comparison can't see)."""

from go_batch_processor_spark.operators.stats import BH_Q, PERM_R
from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_permutation_p_in_valid_range(spark, sf_dir):
    row = REGISTRY["stats_permutation_test"].fn(spark, sf_dir).collect()[0]
    # (1 + k) / (R + 1) with k in [0, R]: p is bounded away from 0.
    assert 1.0 / (PERM_R + 1) <= row.p_value <= 1.0
    assert row.n_reps == PERM_R
    assert row.n_a > 0 and row.n_b > 0


def test_bh_adjustment_monotone_and_bounded(spark, sf_dir):
    rows = REGISTRY["stats_benjamini_hochberg"].fn(spark, sf_dir).collect()
    assert len(rows) == 5  # one hypothesis per event type
    by_p = sorted(rows, key=lambda r: (r.p_raw, r.event_type))
    # Step-up property: adjusted p is monotone along the raw-p order,
    # always >= raw p (min-suffix of p*m/i with i <= m), and <= 1.
    for a, b in zip(by_p, by_p[1:]):
        assert a.p_adj <= b.p_adj + 1e-12
    for r in rows:
        assert r.p_raw - 1e-12 <= r.p_adj <= 1.0
        assert r.rejected == (1 if r.p_adj <= BH_Q else 0)


def test_mcnemar_discordant_consistency(spark, sf_dir):
    row = REGISTRY["stats_mcnemar"].fn(spark, sf_dir).collect()[0]
    b, c = row.b_yes_no, row.c_no_yes
    assert b >= 0 and c >= 0 and row.n_users > 0
    if b + c > 0:
        expected = (abs(b - c) - 1.0) ** 2 / (b + c)
        assert abs(row.mcnemar_cc - round(expected, 6)) < 1e-9
