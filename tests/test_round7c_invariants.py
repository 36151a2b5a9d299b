"""Third round-7 batch invariants: S-H-ESD anomalies, LTTB downsample,
TWAP, Cochran's Q, Mood's median test, Breusch-Pagan, uplift segments."""

from __future__ import annotations

import pytest

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_shesd_flags_exceed_threshold_and_subset_of_hours(spark, sf_dir):
    from go_batch_processor_spark.operators.timeseries import SHESD_Z

    anoms = REGISTRY["timeseries_anomaly_shesd"].fn(spark, sf_dir).toPandas()
    assert len(anoms) > 0
    assert (anoms.robust_z > SHESD_Z).all()
    assert set(anoms.esd_round.unique()) <= {1, 2}
    stl = REGISTRY["timeseries_stl_loess"].fn(spark, sf_dir).toPandas()
    assert set(anoms.hour) <= set(stl.hour)
    # round-1 flags are the MOST extreme residuals: every round-1 z must
    # also exceed every round-2-only row's round-1 implied ordering is
    # not guaranteed, but resid magnitude of flagged rows must exceed
    # the series median absolute residual.
    assert anoms.resid.abs().min() > (stl.resid_micros / 1e6).abs().median()


def test_lttb_keeps_endpoints_and_bucket_count(spark, sf_dir):
    from go_batch_processor_spark.operators.timeseries import LTTB_BUCKETS

    pdf = REGISTRY["timeseries_lttb_downsample"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == LTTB_BUCKETS
    assert sorted(pdf.bucket) == list(range(LTTB_BUCKETS))
    stl = REGISTRY["timeseries_stl_loess"].fn(spark, sf_dir).toPandas()
    hours = sorted(stl.hour)
    assert pdf.sort_values("bucket").hour.iloc[0] == hours[0]
    assert pdf.sort_values("bucket").hour.iloc[-1] == hours[-1]
    # selected hours are strictly increasing across buckets
    hs = pdf.sort_values("bucket").hour.tolist()
    assert all(a < b for a, b in zip(hs, hs[1:]))


def test_twap_bounded_by_value_range(spark, sf_dir):
    pdf = REGISTRY["timeseries_time_weighted_avg"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf.span_s > 0).all()
    assert (pdf.n_segments >= 1).all()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    vmin, vmax = ev.selectExpr("min(value)", "max(value)").first()
    assert (pdf.twap >= vmin - 1e-9).all() and (pdf.twap <= vmax + 1e-9).all()


def test_cochran_q_nonnegative_and_counts_consistent(spark, sf_dir):
    row = REGISTRY["stats_cochran_q"].fn(spark, sf_dir).toPandas().iloc[0]
    assert row.q_stat >= 0
    assert row.df == 2
    for c in ("c_click", "c_purchase", "c_view"):
        assert 0 < row[c] <= row.n_subjects


def test_mood_median_cells_and_running_chi2(spark, sf_dir):
    pdf = (
        REGISTRY["stats_mood_median_test"].fn(spark, sf_dir)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert len(pdf) == 5
    assert (pdf.n_above <= pdf.n).all()
    assert (pdf.contrib >= 0).all()
    # the running total ends at (approximately, both rounded) the sum
    assert abs(pdf.running_chi2.iloc[-1] - pdf.contrib.sum()) < 1e-4
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert pdf.n.sum() == ev.count()


def test_breusch_pagan_r2_bounds_and_positive_slope(spark, sf_dir):
    row = REGISTRY["stats_breusch_pagan"].fn(spark, sf_dir).toPandas().iloc[0]
    assert 0.0 <= row.r2_aux <= 1.0
    assert abs(row.lm_stat - row.n * row.r2_aux) < 0.5 + row.n * 1e-6
    assert row.lm_stat >= 0
    assert row.n > 0 and row.df == 1


def test_uplift_cells_partition_customers(spark, sf_dir):
    pdf = REGISTRY["analytics_uplift_segments"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 5
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert (pdf.n_t + pdf.n_c).sum() == cust.count()
    for c in ("rate_t", "rate_c"):
        assert ((pdf[c] >= 0) & (pdf[c] <= 1)).all()
    assert (abs(pdf.uplift - (pdf.rate_t - pdf.rate_c)) < 2e-6).all()
