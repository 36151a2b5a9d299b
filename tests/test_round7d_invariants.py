"""Fourth round-7 batch invariants: Wilson CI, Hodges-Lehmann pseudo-median,
seasonal Mann-Kendall, decile lift/gain, URL-canonicalization dedup."""

from __future__ import annotations

import numpy as np

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_wilson_ci_brackets_and_stays_in_unit_interval(spark, sf_dir):
    pdf = REGISTRY["stats_wilson_ci"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 5  # one row per order priority
    assert (pdf.wilson_lo <= pdf.p_hat).all()
    assert (pdf.p_hat <= pdf.wilson_hi).all()
    # the Wilson interval NEVER leaves [0,1] (unlike Wald)
    assert (pdf.wilson_lo >= 0).all() and (pdf.wilson_hi <= 1).all()
    assert (pdf.x <= pdf.n).all()


def test_hodges_lehmann_matches_numpy_walsh_brute_force(spark, sf_dir):
    pdf = REGISTRY["stats_hodges_lehmann"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 1
    q = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_quantity")
        .toPandas()
        .l_quantity.to_numpy()
    )
    n = len(q)
    # brute-force Walsh multiset (i <= j row pairs) — fine at test scale
    walsh = (q[:, None] + q[None, :]) / 2.0
    iu = np.triu_indices(n)
    hl = np.median(walsh[iu])
    assert pdf.n_rows[0] == n
    assert pdf.n_walsh[0] == n * (n + 1) // 2
    assert abs(pdf.hl_estimate[0] - hl) < 1e-9


def test_seasonal_mk_matches_pandas_per_season_brute_force(spark, sf_dir):
    pdf = REGISTRY["stats_seasonal_mann_kendall"].fn(spark, sf_dir).toPandas()
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "month(o_orderdate) AS m",
            "year(o_orderdate) AS y",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .toPandas()
    )
    cells = o.groupby(["m", "y"]).cents.sum().reset_index()
    s = 0
    for m, grp in cells.groupby("m"):
        v = grp.sort_values("y").cents.to_numpy()
        for i in range(len(v)):
            for j in range(i + 1, len(v)):
                s += int(np.sign(v[j] - v[i]))
    assert pdf.s[0] == s
    assert pdf.n_seasons[0] == cells.m.nunique()
    assert pdf.n_points[0] == len(cells)
    # z and S agree in sign (continuity correction cannot flip it)
    assert np.sign(pdf.z[0]) in (0.0, np.sign(s))


def test_lift_gain_decile_accounting(spark, sf_dir):
    pdf = (
        REGISTRY["ml_lift_gain_deciles"].fn(spark, sf_dir).toPandas()
    ).sort_values("decile")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_tot = li.count()
    n_pos = li.filter("l_returnflag = 'R'").count()
    assert pdf.decile.tolist() == list(range(1, 11))
    assert pdf.n.sum() == n_tot
    assert pdf.pos.sum() == n_pos
    # equal-population cut: decile sizes differ by at most 1
    assert pdf.n.max() - pdf.n.min() <= 1
    # cumulative gain is nondecreasing and ends at exactly 1
    cg = pdf.cum_gain.to_numpy()
    assert (np.diff(cg) >= 0).all() and cg[-1] == 1.0
    # population-weighted mean lift is 1 by construction
    assert abs((pdf.lift * pdf.n).sum() / n_tot - 1.0) < 1e-6


def test_url_canonicalize_merges_variants_and_output_is_clean(spark, sf_dir):
    pdf = REGISTRY["dedup_url_canonicalize"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf.n_dups >= 2).all()
    # canonical URLs carry no tracking params, fragments, default ports,
    # dangling separators, or uppercase scheme/host
    for u in pdf.canonical_url:
        assert "utm_" not in u and "ref=" not in u and "#" not in u
        assert ":80" not in u and not u.endswith(("?", "&", "/"))
        prefix = u.split("?")[0]
        assert prefix == prefix.lower()
        assert u.startswith("http://www.site")
    # group arithmetic: duplicates + distinct canonicals == corpus size
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_singletons_plus_groups = n_docs - (pdf.n_dups.sum() - len(pdf))
    assert n_singletons_plus_groups >= len(pdf)
    # every group keeps its smallest member
    assert (pdf.keep_doc_id >= 0).all()
