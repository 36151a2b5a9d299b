"""Independent math twins for the round-5 stats additions.

The DuckDB oracle pins cross-engine parity; these tests pin the
STATISTICS — Spearman vs pandas' rank-based implementation, ANOVA F vs
a direct numpy computation, and the MAD screen vs a pandas twin — so a
formula error that happened to be mirrored into the oracle SQL would
still be caught.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_spearman_matches_pandas(spark, sf_dir):
    got = (
        REGISTRY["stats_spearman_corr"].fn(spark, sf_dir).toPandas()
        .set_index("l_returnflag")
    )
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    for flag, grp in li.groupby("l_returnflag"):
        # rank(average-ties) then Pearson == Spearman (pandas' spearman
        # delegates to scipy, absent here)
        rho = grp["l_quantity"].rank().corr(grp["l_extendedprice"].rank())
        assert abs(got.loc[flag, "spearman_rho"] - rho) < 1e-5, flag
        assert got.loc[flag, "n"] == len(grp)
        assert -1.0 <= got.loc[flag, "spearman_rho"] <= 1.0


def test_anova_matches_numpy(spark, sf_dir):
    got = REGISTRY["stats_anova_oneway"].fn(spark, sf_dir).toPandas().iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    groups = [g["value"].to_numpy() for _, g in ev.groupby("event_type")]
    k, n = len(groups), len(ev)
    grand = ev["value"].mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got["k_groups"] == k and got["n_total"] == n
    assert abs(got["ss_between"] - ssb) < max(1e-6 * abs(ssb), 0.02)
    assert abs(got["ss_within"] - ssw) < max(1e-6 * abs(ssw), 0.02)
    assert abs(got["f_stat"] - f) < max(1e-4 * abs(f), 1e-3)


def test_robust_zscore_matches_pandas_twin(spark, sf_dir):
    got = REGISTRY["analytics_robust_zscore_mad"].fn(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    expected_ids = set()
    for _, g in ev.groupby("event_type"):
        med = g["value"].median()
        mad = (g["value"] - med).abs().median()
        if mad <= 0:
            continue
        rz = 0.6745 * (g["value"] - med) / mad
        expected_ids |= set(g.loc[rz.abs() > 3.5, "event_id"])
    assert set(got["event_id"]) == expected_ids
    # every flagged score actually exceeds the cut
    assert (got["robust_z"].abs() > 3.5 - 1e-9).all()
    # robust screen is a superset-or-overlap sanity vs classic 3-sigma:
    # at least it flags the single most extreme value per flagged type
    for et, g in got.groupby("event_type"):
        sub = ev[ev.event_type == et]
        med = sub["value"].median()
        extreme = sub.loc[(sub["value"] - med).abs().idxmax(), "event_id"]
        assert extreme in set(g["event_id"])


def test_spearman_invariant_to_monotone_transform(spark, sf_dir):
    """Spearman depends only on ranks: rank-correlating exp-transformed
    prices must give the identical rho (pure-pandas property check on
    the same fractional-rank formula the operator uses)."""
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    g = li[li.l_returnflag == "N"]
    r1 = g["l_quantity"].rank().corr(g["l_extendedprice"].rank())
    r2 = g["l_quantity"].rank().corr(np.log1p(g["l_extendedprice"]).rank())
    assert abs(r1 - r2) < 1e-12


def test_binned_auc_close_to_exact(spark, sf_dir):
    """The sort-free binned AUC must agree with the exact rank-sum AUC
    within the per-bin tie-mass error (generous 5e-3 at 1024 bins)."""
    exact = (
        REGISTRY["stats_auc_roc"].fn(spark, sf_dir).toPandas().iloc[0]["auc"]
    )
    binned = (
        REGISTRY["stats_auc_roc_binned"]
        .fn(spark, sf_dir)
        .toPandas()
        .iloc[0]["auc_binned"]
    )
    assert abs(exact - binned) < 5e-3, (exact, binned)
