"""Fifth round-7 batch: head/middle/tail split, Ansari-Bradley,
cyclic encoding twin, periodogram twin."""

from __future__ import annotations

import numpy as np
import pandas as pd

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_head_middle_tail_equal_population_and_ordered_scores(spark, sf_dir):
    pdf = (
        REGISTRY["text_head_middle_tail_split"].fn(spark, sf_dir).toPandas()
    ).set_index("bucket")
    assert set(pdf.index) == {"head", "middle", "tail"}
    assert pdf.n_docs.max() - pdf.n_docs.min() <= 1
    # head holds the highest fluency scores; ties at a boundary are
    # broken by doc_id so min(head) can equal max(middle) but not be less
    assert pdf.loc["head", "min_score"] >= pdf.loc["middle", "max_score"]
    assert pdf.loc["middle", "min_score"] >= pdf.loc["tail", "max_score"]
    n_scored = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("size(split(lower(text), ' ')) AS nw")
        .filter("nw >= 2")
        .count()
    )
    assert pdf.n_docs.sum() == n_scored


def test_ansari_bradley_matches_pandas_midrank_twin(spark, sf_dir):
    pdf = REGISTRY["stats_ansari_bradley"].fn(spark, sf_dir).toPandas()
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr("l_quantity AS v", "l_linestatus = 'O' AS s1")
        .toPandas()
    )
    n = len(li)
    r = li.v.rank(method="average").to_numpy()  # midranks, R convention
    score = np.minimum(r, n + 1 - r)
    ab = score[li.s1.to_numpy()].sum()
    n1 = int(li.s1.sum())
    n2 = n - n1
    mean = n1 * score.mean()
    pop_var = score.var()  # ddof=0: population variance of the score set
    var = n1 * n2 / (n - 1) * pop_var
    z = (ab - mean) / np.sqrt(var)
    assert pdf.n1[0] == n1 and pdf.n2[0] == n2
    assert abs(pdf.ab_stat[0] - ab) < 1e-6
    assert abs(pdf.ab_mean[0] - mean) < 1e-4
    assert abs(pdf.z[0] - z) < 1e-5


def test_cyclic_encoding_matches_numpy_and_unit_circle(spark, sf_dir):
    pdf = REGISTRY["feature_cyclic_encoding"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    two_pi = 2.0 * np.pi
    for col, base, period in [
        ("hour_sin", "hour", 24.0),
        ("hour_cos", "hour", 24.0),
        ("dow_sin", "dow", 7.0),
        ("dow_cos", "dow", 7.0),
    ]:
        fn = np.sin if col.endswith("sin") else np.cos
        twin = fn(pdf[base].to_numpy() * two_pi / period)
        assert np.abs(pdf[col].to_numpy() - twin).max() < 1e-12
    r2 = pdf.hour_sin**2 + pdf.hour_cos**2
    assert np.abs(r2 - 1.0).max() < 1e-14
    assert pdf.hour.between(0, 23).all() and pdf.dow.between(0, 6).all()


def test_periodogram_matches_numpy_twin_and_dominant_period(spark, sf_dir):
    from go_batch_processor_spark.operators.timeseries import (
        PERIODOGRAM_PERIODS_H,
    )

    pdf = (
        REGISTRY["timeseries_periodogram"].fn(spark, sf_dir).toPandas()
    ).set_index("period_h")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    hourly = (
        pd.Series(
            np.round(ev.value.to_numpy() * 100).astype("int64"),
            index=ev.ts.dt.floor("h"),
        )
        .groupby(level=0)
        .sum()
        .sort_index()
    )
    t = (hourly.index - hourly.index.min()).total_seconds().to_numpy() / 3600.0
    v = hourly.to_numpy() / 100.0
    energy = len(v) * v.var()
    for p in PERIODOGRAM_PERIODS_H:
        ang = t * 2.0 * np.pi / p
        power = (v * np.cos(ang)).sum() ** 2 + (v * np.sin(ang)).sum() ** 2
        assert abs(pdf.loc[p, "power"] - power) <= 1e-9 * max(power, 1.0)
        assert abs(pdf.loc[p, "power_frac"] - power / energy) < 1e-9
    assert pdf.power.idxmax() == PERIODOGRAM_PERIODS_H[
        int(np.argmax([
            (v * np.cos(t * 2 * np.pi / p)).sum() ** 2
            + (v * np.sin(t * 2 * np.pi / p)).sum() ** 2
            for p in PERIODOGRAM_PERIODS_H
        ]))
    ]


def test_cramer_von_mises_matches_numpy_ecdf_twin(spark, sf_dir):
    pdf = REGISTRY["stats_cramer_von_mises"].fn(spark, sf_dir).toPandas()
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr("l_discount AS v", "l_returnflag = 'R' AS s1")
        .toPandas()
    )
    x = li[li.s1].v.to_numpy()
    y = li[~li.s1].v.to_numpy()
    n1, n2 = len(x), len(y)
    pooled = np.sort(li.v.unique())
    f1 = np.searchsorted(np.sort(x), pooled, side="right") / n1
    f2 = np.searchsorted(np.sort(y), pooled, side="right") / n2
    c = pd.Series(li.v).value_counts().reindex(pooled).to_numpy()
    t = n1 * n2 / (n1 + n2) ** 2 * (c * (f1 - f2) ** 2).sum()
    assert pdf.n1[0] == n1 and pdf.n2[0] == n2
    assert abs(pdf.cvm_t[0] - t) < 1e-6


def test_pettitt_matches_brute_force_pair_sum(spark, sf_dir):
    pdf = REGISTRY["stats_pettitt_test"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    daily = (
        pd.Series(
            np.round(ev.value.to_numpy() * 100).astype("int64"),
            index=ev.ts.dt.floor("D"),
        )
        .groupby(level=0)
        .sum()
        .sort_index()
    )
    v = daily.to_numpy()
    n = len(v)
    sign = np.sign(v[:, None] - v[None, :])
    best_k, best_t, best_u = -1, None, None
    for t in range(n - 1):
        u = int(sign[: t + 1, t + 1 :].sum())
        if abs(u) > best_k:
            best_k, best_t, best_u = abs(u), t, u
    assert pdf.n[0] == n
    assert pdf.k_stat[0] == best_k
    assert pdf.change_day[0] == daily.index[best_t]
    expo = 6.0 * best_k**2 / (n**3 + n**2)
    assert abs(pdf.neg_ln_half_p[0] - expo) < 1e-6


def test_anderson_darling_matches_scipy_free_twin(spark, sf_dir):
    """Scholz-Stephens A2akN twin built directly from the tie-adjusted
    formula (midcount convention) in numpy."""
    pdf = (
        REGISTRY["stats_anderson_darling_2samp"].fn(spark, sf_dir).toPandas()
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr("l_quantity AS v", "l_returnflag = 'R' AS s1")
        .toPandas()
    )
    vals = np.sort(li.v.unique())
    c1 = li[li.s1].v.value_counts().reindex(vals, fill_value=0).to_numpy()
    c2 = li[~li.s1].v.value_counts().reindex(vals, fill_value=0).to_numpy()
    f = c1 + c2
    n1, n2 = c1.sum(), c2.sum()
    n = n1 + n2
    a2 = 0.0
    for ci, ni in ((c1, n1), (c2, n2)):
        cum = np.cumsum(ci)
        cb = np.cumsum(f)
        m_mid = cum - ci / 2.0
        b_mid = cb - f / 2.0
        num = (n * m_mid - ni * b_mid) ** 2
        den = b_mid * (n - b_mid) - n * f / 4.0
        a2 += (1.0 / ni) * ((f / n) * num / den).sum()
    a2 *= (n - 1.0) / n
    assert pdf.n1[0] == n1 and pdf.n2[0] == n2
    assert pdf.n_distinct[0] == len(vals)
    assert abs(pdf.a2_micros[0] / 1e6 - a2) < 2e-6


def test_page_trend_matches_pandas_rank_twin(spark, sf_dir):
    pdf = REGISTRY["stats_page_trend_test"].fn(spark, sf_dir).toPandas()
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "year(o_orderdate) AS y",
            "month(o_orderdate) AS m",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .toPandas()
    )
    cells = o.groupby(["y", "m"]).cents.sum().reset_index()
    full = cells.groupby("y").m.count()
    cells = cells[cells.y.isin(full[full == 12].index)]
    cells["r"] = cells.groupby("y").cents.rank(method="average")
    l_stat = (cells.m * cells.r).sum()
    b = cells.y.nunique()
    assert pdf.b[0] == b and pdf.k[0] == 12
    assert pdf.page_l[0] == l_stat
    mean = b * 12 * 13 * 13 / 4.0
    var = b * 144.0 * 13 * 143 / 144.0
    assert abs(pdf.z[0] - (l_stat - mean) / np.sqrt(var)) < 1e-5


def test_hl_shift_matches_numpy_pairwise_twin(spark, sf_dir):
    pdf = REGISTRY["stats_hodges_lehmann_shift"].fn(spark, sf_dir).toPandas()
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr("l_quantity AS v", "l_returnflag = 'R' AS s1")
        .toPandas()
    )
    x = li[li.s1].v.to_numpy()
    y = li[~li.s1].v.to_numpy()
    diffs = (x[:, None] - y[None, :]).ravel()
    assert pdf.n_pairs[0] == len(diffs)
    assert abs(pdf.hl_shift[0] - np.median(diffs)) < 1e-9


def test_conformal_interval_coverage_guarantee(spark, sf_dir):
    pdf = REGISTRY["ml_conformal_interval"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 1
    # finite-sample guarantee: marginal coverage >= 0.9 in expectation;
    # allow binomial noise at test size but require the ballpark
    n_test = pdf.n_test[0]
    se = 3.0 * np.sqrt(0.1 * 0.9 / n_test)
    assert pdf.coverage[0] >= 0.9 - se
    assert pdf.qhat[0] > 0
    assert pdf.k[0] == (9 * (pdf.n_calib[0] + 1) + 9) // 10
    # twin: exact order statistic on recomputed residuals
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    calib = ev[ev.event_id % 2 == 0]
    mu = (
        np.round(calib.value * 100).astype("int64").groupby(calib.event_type).sum()
        / (100.0 * calib.groupby("event_type").size())
    )
    r = (calib.value - calib.event_type.map(mu)).abs().sort_values().to_numpy()
    k = (9 * (len(r) + 1) + 9) // 10
    # qhat is round(.,6) in the output — compare at that granularity
    assert abs(pdf.qhat[0] - r[k - 1]) < 6e-7


def test_welch_anova_matches_numpy_twin(spark, sf_dir):
    pdf = REGISTRY["stats_welch_anova"].fn(spark, sf_dir).toPandas()
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "l_returnflag AS g",
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents",
        )
        .toPandas()
    )
    groups = [grp.cents.to_numpy() for _, grp in li.groupby("g")]
    k = len(groups)
    n = np.array([len(x) for x in groups], dtype=float)
    m = np.array([x.mean() for x in groups])
    s2 = np.array([x.var(ddof=1) for x in groups])
    w = n / s2
    mh = (w * m).sum() / w.sum()
    a = (w * (m - mh) ** 2).sum() / (k - 1)
    c = ((1 - w / w.sum()) ** 2 / (n - 1)).sum()
    f = a / (1 + 2 * (k - 2) / (k**2 - 1) * c)
    df2 = (k**2 - 1) / (3 * c)
    assert pdf.k[0] == k and pdf.df1[0] == k - 1
    assert abs(pdf.f_stat[0] - f) < 1e-4 * max(1.0, abs(f))
    assert abs(pdf.df2[0] - df2) < 1e-3


def test_ses_grid_matches_numpy_recursion_and_profile_shape(spark, sf_dir):
    from go_batch_processor_spark.operators.timeseries import SES_ALPHA_GRID

    pdf = (
        REGISTRY["timeseries_ses_grid_search"].fn(spark, sf_dir).toPandas()
    ).set_index("alpha")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    daily = (
        pd.Series(
            np.round(ev.value.to_numpy() * 100).astype("int64"),
            index=ev.ts.dt.floor("D"),
        )
        .groupby(level=0)
        .sum()
        .sort_index()
        .to_numpy()
        / 100.0
    )
    assert (pdf.n == len(daily)).all()
    for a in SES_ALPHA_GRID:
        level, sse = daily[0], 0.0
        for x in daily[1:]:
            e = x - level
            sse += e * e
            level += a * e
        assert abs(pdf.loc[a, "sse"] - sse) < 1e-6 * max(1.0, sse)
        assert abs(pdf.loc[a, "level"] - level) < 1e-3


def test_cochran_armitage_matches_numpy_twin(spark, sf_dir):
    pdf = REGISTRY["stats_cochran_armitage_trend"].fn(spark, sf_dir).toPandas()
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS s",
            "o_orderstatus = 'F' AS y",
        )
        .toPandas()
    )
    g = o.groupby("s").agg(n=("y", "size"), x=("y", "sum"))
    s = g.index.to_numpy(dtype=float)
    n, x = g.n.to_numpy(dtype=float), g.x.to_numpy(dtype=float)
    nn, xx = n.sum(), x.sum()
    t = (s * x).sum() - xx / nn * (s * n).sum()
    p = xx / nn
    var = p * (1 - p) * ((s * s * n).sum() - (s * n).sum() ** 2 / nn)
    assert pdf.k[0] == len(g)
    assert abs(pdf.t_stat[0] - t) < 1e-3
    assert abs(pdf.z[0] - t / np.sqrt(var)) < 1e-5


def test_median_ci_brackets_median_and_matches_numpy(spark, sf_dir):
    pdf = REGISTRY["stats_median_ci_order_stats"].fn(spark, sf_dir).toPandas()
    q = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_quantity")
        .toPandas()
        .l_quantity.sort_values()
        .to_numpy()
    )
    n = len(q)
    med = (pdf.med_lo[0] + pdf.med_hi[0]) / 2.0
    assert med == np.median(q)
    k_lo = int(np.floor((n - 1.96 * np.sqrt(n)) / 2.0))
    k_hi = int(np.ceil(1.0 + (n + 1.96 * np.sqrt(n)) / 2.0))
    assert pdf.n[0] == n and pdf.k_lo[0] == k_lo and pdf.k_hi[0] == k_hi
    assert pdf.ci_lo[0] == q[k_lo - 1]  # exact order statistics
    assert pdf.ci_hi[0] == q[k_hi - 1]
    assert pdf.ci_lo[0] <= med <= pdf.ci_hi[0]


def test_getis_ord_matches_numpy_lattice_twin(spark, sf_dir):
    pdf = REGISTRY["stats_getis_ord_hotspots"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 5
    import hashlib

    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .selectExpr("c_custkey AS k", "CAST(round(c_acctbal*100) AS BIGINT) AS cents")
        .toPandas()
    )

    def coord(prefix, k):
        h = hashlib.md5(f"{prefix}{k}".encode()).hexdigest()
        return int(h[0], 16) * 64.0 + int(h[1], 16) * 4.0

    v = np.zeros((8, 8), dtype="int64")
    for k, cents in zip(cust.k, cust.cents):
        gx = int(coord("x:", k) // 128.0)
        gy = int(coord("y:", k) // 128.0)
        v[gx, gy] += cents
    nc = 64
    mean = v.sum() / nc
    s = np.sqrt((v.astype(float) ** 2).sum() / nc - mean**2)
    best = []
    for gx in range(8):
        for gy in range(8):
            xs = slice(max(gx - 1, 0), min(gx + 2, 8))
            ys = slice(max(gy - 1, 0), min(gy + 2, 8))
            w = v[xs, ys].sum()
            nw = v[xs, ys].size
            z = (w - mean * nw) / (s * np.sqrt((nc * nw - nw * nw) / (nc - 1.0)))
            best.append((z, gx, gy, w, nw))
    best.sort(key=lambda t: (-t[0], t[1], t[2]))
    for i in range(5):
        z, gx, gy, w, nw = best[i]
        assert pdf.gx[i] == gx and pdf.gy[i] == gy
        assert pdf.hood_cents[i] == w and pdf.nw[i] == nw
        assert abs(pdf.z[i] - z) < 1e-6


def test_morans_i_matches_numpy_lattice_twin(spark, sf_dir):
    pdf = REGISTRY["stats_morans_i"].fn(spark, sf_dir).toPandas()
    import hashlib

    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .selectExpr("c_custkey AS k", "CAST(round(c_acctbal*100) AS BIGINT) AS cents")
        .toPandas()
    )

    def coord(prefix, k):
        h = hashlib.md5(f"{prefix}{k}".encode()).hexdigest()
        return int(h[0], 16) * 64.0 + int(h[1], 16) * 4.0

    v = np.zeros((8, 8), dtype="int64")
    for k, cents in zip(cust.k, cust.cents):
        v[int(coord("x:", k) // 128.0), int(coord("y:", k) // 128.0)] += cents
    m = v.mean()
    num, w = 0.0, 0
    for gx in range(8):
        for gy in range(8):
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == dy == 0:
                        continue
                    nx, ny = gx + dx, gy + dy
                    if 0 <= nx < 8 and 0 <= ny < 8:
                        num += (v[gx, gy] - m) * (v[nx, ny] - m)
                        w += 1
    den = ((v - m) ** 2).sum()
    i_stat = 64.0 / w * num / den
    assert pdf.n_cells[0] == 64 and pdf.w_sum[0] == w
    assert abs(pdf.morans_i[0] - i_stat) < 1e-6
    assert abs(pdf.e_i[0] - (-1.0 / 63.0)) < 5e-7  # e_i is round(.,6)


def test_cucconi_matches_pandas_srs_moment_twin(spark, sf_dir):
    pdf = REGISTRY["stats_cucconi_test"].fn(spark, sf_dir).toPandas()
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr("l_quantity AS v", "l_returnflag = 'R' AS s1")
        .toPandas()
    )
    n = len(li)
    rnk = li.v.rank(method="average").to_numpy()
    a = rnk**2
    b = (n + 1 - rnk) ** 2
    s1 = li.s1.to_numpy()
    n1 = int(s1.sum())
    n2 = n - n1
    srs = n1 * n2 / (n - 1)
    zu = (a[s1].sum() - n1 * a.mean()) / np.sqrt(srs * a.var())
    zv = (b[s1].sum() - n1 * b.mean()) / np.sqrt(srs * b.var())
    rho = (np.mean(a * b) - a.mean() * b.mean()) / (a.std() * b.std())
    c = (zu**2 + zv**2 - 2 * rho * zu * zv) / (2 * (1 - rho**2))
    assert pdf.n1[0] == n1 and pdf.n2[0] == n2
    assert abs(pdf.z_u[0] - zu) < 1e-5
    assert abs(pdf.z_v[0] - zv) < 1e-5
    assert abs(pdf.rho[0] - rho) < 1e-5
    assert abs(pdf.c_stat[0] - c) < 1e-4
    # under ties rho stays in (-1, 0): U and V are antagonistic by design
    assert -1.0 < pdf.rho[0] < 0.0


def test_feature_drift_sweep_tvd_matches_pandas_twin(spark, sf_dir):
    pdf = (
        REGISTRY["profile_feature_drift_sweep"].fn(spark, sf_dir).toPandas()
    ).set_index("feature")
    assert set(pdf.index) == {"totalprice_bin", "priority", "status"}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    cut = pd.Timestamp("1998-01-01")
    for feature, series in [
        ("priority", o.o_orderpriority),
        ("status", o.o_orderstatus),
        (
            "totalprice_bin",
            np.minimum(9, np.floor(o.o_totalprice / 50000.0)).astype("int64").astype(str),
        ),
    ]:
        df = pd.DataFrame({"bin": series, "is_e": o.o_orderdate < cut})
        cells = df.groupby("bin").is_e.agg(["sum", "count"])
        ne = cells["sum"].to_numpy(dtype="int64")
        na = (cells["count"] - cells["sum"]).to_numpy(dtype="int64")
        nb = len(cells)
        pe = (2 * ne + 1) / (2 * ne.sum() + nb)
        pa = (2 * na + 1) / (2 * na.sum() + nb)
        tvd = 0.5 * np.abs(pa - pe).sum()
        assert pdf.loc[feature, "n_bins"] == nb
        assert abs(pdf.loc[feature, "tvd"] - tvd) < 1e-6
        # top shift bin is the argmax |p_a - p_e| (min label on ties)
        shifts = pd.Series(np.abs(pa - pe), index=cells.index)
        best = shifts[shifts == shifts.max()].index.min()
        assert pdf.loc[feature, "top_shift_bin"] == best


def test_trending_hyperbolic_matches_pandas_twin(spark, sf_dir):
    from go_batch_processor_spark.operators.analytics import TRENDING_TOPK

    pdf = REGISTRY["analytics_trending_hyperbolic"].fn(spark, sf_dir).toPandas()
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr("l_partkey AS part", "l_shipdate AS d")
        .toPandas()
    )
    age = (li.d.max() - li.d).dt.days
    li = li.assign(term=1.0 / (1.0 + age))
    scores = li.groupby("part").term.sum().sort_values(ascending=False)
    assert len(pdf) == TRENDING_TOPK
    # the reported top-k matches the twin's top-k set and ordering
    top = scores.head(TRENDING_TOPK)
    assert list(pdf.part) == list(top.index)
    assert (
        np.abs(pdf.score_micros.to_numpy() / 1e6 - top.to_numpy()).max()
        < 1e-5
    )


def test_sen_slope_ci_matches_numpy_twin_and_brackets(spark, sf_dir):
    pdf = REGISTRY["timeseries_sen_slope_ci"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    daily = (
        pd.Series(
            np.round(ev.value.to_numpy() * 100).astype("int64"),
            index=ev.ts.dt.floor("D"),
        )
        .groupby(level=0)
        .sum()
        .sort_index()
        .to_numpy()
    )
    n = len(daily)
    slopes = sorted(
        (daily[j] - daily[i]) / (j - i)
        for i in range(n)
        for j in range(i + 1, n)
    )
    t = n * (n - 1) // 2
    sen = (slopes[(t + 1) // 2 - 1] + slopes[(t + 2) // 2 - 1]) / 2.0 / 100.0
    ties = pd.Series(daily).value_counts()
    tie_term = sum(tt * (tt - 1) * (2 * tt + 5) for tt in ties if tt > 1)
    sd = np.sqrt((n * (n - 1.0) * (2 * n + 5.0) - tie_term) / 18.0)
    k_lo = max(1, int(np.floor((t - 1.96 * sd) / 2.0)) + 1)
    k_hi = min(t, int(np.ceil((t + 1.96 * sd) / 2.0)) + 1)
    assert pdf.n_days[0] == n and pdf.n_pairs[0] == t
    assert abs(pdf.sen_slope_per_day[0] - sen) < 1e-6
    assert abs(pdf.ci_lo[0] - slopes[k_lo - 1] / 100.0) < 1e-6
    assert abs(pdf.ci_hi[0] - slopes[k_hi - 1] / 100.0) < 1e-6
    assert pdf.ci_lo[0] <= pdf.sen_slope_per_day[0] <= pdf.ci_hi[0]


def test_t_closeness_matches_pandas_emd_twin(spark, sf_dir):
    from go_batch_processor_spark.operators.stats import TCLOSE_TOPK

    pdf = REGISTRY["profile_t_closeness"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == TCLOSE_TOPK
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .selectExpr(
            "c_nationkey", "c_mktsegment",
            "CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bin",
        )
        .toPandas()
    )
    bins = np.sort(cust.bin.unique())
    glob = cust.bin.value_counts().reindex(bins, fill_value=0).to_numpy()
    gcum = np.cumsum(glob) / glob.sum()
    rows = []
    for (nk, seg), grp in cust.groupby(["c_nationkey", "c_mktsegment"]):
        c = grp.bin.value_counts().reindex(bins, fill_value=0).to_numpy()
        emd = np.abs(np.cumsum(c) / c.sum() - gcum).sum() / (len(bins) - 1)
        rows.append((emd, nk, seg, len(grp)))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    for i in range(TCLOSE_TOPK):
        emd, nk, seg, sz = rows[i]
        assert (pdf.c_nationkey[i], pdf.c_mktsegment[i]) == (nk, seg)
        assert pdf.class_size[i] == sz
        assert abs(pdf.emd_t[i] - emd) < 1e-6
    # t-closeness values live in [0, 1] on a cumulative-gap EMD
    assert (pdf.emd_t >= 0).all() and (pdf.emd_t <= 1).all()


def test_vocab_drift_tvd_matches_pandas_twin(spark, sf_dir):
    pdf = REGISTRY["text_vocab_drift_tvd"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    wa, wb = [], []
    for did, text in zip(docs.doc_id, docs.text):
        (wa if did % 2 == 0 else wb).extend(text.lower().split(" "))
    ca = pd.Series(wa).value_counts()
    cb = pd.Series(wb).value_counts()
    vocab = ca.index.union(cb.index)
    pa = ca.reindex(vocab, fill_value=0) / len(wa)
    pb = cb.reindex(vocab, fill_value=0) / len(wb)
    tvd = 0.5 * np.abs(pa - pb).sum()
    shifts = np.abs(pa - pb).sort_values(ascending=False)
    assert abs(pdf.corpus_tvd[0] - tvd) < 1e-6
    assert abs(pdf.prob_shift[0] - shifts.iloc[0]) < 1e-6
    assert pdf.term[0] == shifts.index[0]
    # reported counts reconcile with the twin's
    assert pdf.count_a[0] == ca.get(pdf.term[0], 0)


def test_shap_linear_matches_numpy_lstsq_twin(spark, sf_dir):
    from go_batch_processor_spark.operators.ml import SHAP_TOPK

    pdf = REGISTRY["ml_shap_linear_exact"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == SHAP_TOPK
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "l_orderkey", "l_linenumber",
            "CAST(l_quantity AS BIGINT) AS x1",
            "CAST(round(l_discount * 100) AS BIGINT) AS x2",
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS y",
        )
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(li)), li.x1.to_numpy(float), li.x2.to_numpy(float)]
    )
    beta = np.linalg.lstsq(X, li.y.to_numpy(float), rcond=None)[0]
    phi1 = beta[1] * (li.x1 - li.x1.mean())
    phi2 = beta[2] * (li.x2 - li.x2.mean())
    li = li.assign(p1=phi1 / 100.0, p2=phi2 / 100.0, a=np.abs(phi1 + phi2))
    top = li.sort_values(
        ["a", "l_orderkey", "l_linenumber"], ascending=[False, True, True]
    ).head(SHAP_TOPK)
    assert list(pdf.l_orderkey) == list(top.l_orderkey)
    assert np.abs(pdf.phi_qty.to_numpy() - top.p1.to_numpy()).max() < 1e-3
    assert np.abs(pdf.phi_disc.to_numpy() - top.p2.to_numpy()).max() < 1e-3
    # SHAP completeness: phi_total = phi_qty + phi_disc (additivity)
    assert np.abs(
        pdf.phi_total - (pdf.phi_qty + pdf.phi_disc)
    ).max() < 2e-4  # round(.,4) on each term


def test_mv_hll_incremental_equals_rebuild_and_tracks_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    pdf = (
        REGISTRY["mv_incremental_distinct_hll"].fn(spark, sf_dir).toPandas()
    ).set_index("range")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # (a) incremental (state + delta union) == full rebuild, bit-exact:
    rebuild = (
        ev.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint")
        )
        .first()[0]
    )
    assert pdf.loc["all_days", "distinct_users"] == rebuild
    # (b) within HLL error (lgK=12 default -> ~1.6% rse; allow 5 sigma)
    exact = ev.select("user_id").distinct().count()
    assert abs(pdf.loc["all_days", "distinct_users"] - exact) <= max(
        3, 0.08 * exact
    )
    exact_tail = (
        ev.filter("ts >= timestamp '2024-01-24'")
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(pdf.loc["last_week", "distinct_users"] - exact_tail) <= max(
        3, 0.08 * exact_tail
    )
    # (c) the view holds one sketch per calendar day
    n_days = ev.select(F.date_trunc("day", "ts")).distinct().count()
    assert pdf.loc["all_days", "n_sketches"] == n_days


def test_vif_matches_numpy_twin_and_bounds(spark, sf_dir):
    pdf = (
        REGISTRY["ml_vif_multicollinearity"].fn(spark, sf_dir).toPandas()
    ).set_index("feature")
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "CAST(l_quantity AS BIGINT) AS x1",
            "CAST(round(l_discount * 100) AS BIGINT) AS x2",
            "CAST(round(l_tax * 100) AS BIGINT) AS x3",
        )
        .toPandas()
    )
    X = li[["x1", "x2", "x3"]].to_numpy(float)
    names = ["l_quantity", "l_discount", "l_tax"]
    for j in range(3):
        others = [k for k in range(3) if k != j]
        A = np.column_stack([np.ones(len(X))] + [X[:, k] for k in others])
        beta = np.linalg.lstsq(A, X[:, j], rcond=None)[0]
        resid = X[:, j] - A @ beta
        r2 = 1 - resid.var() / X[:, j].var()
        assert abs(pdf.loc[names[j], "r_squared"] - r2) < 1e-5
        assert abs(pdf.loc[names[j], "vif"] - 1 / (1 - r2)) < 1e-4
    assert (pdf.vif >= 1.0 - 1e-9).all()  # VIF is bounded below by 1


def test_shift_share_effects_sum_to_delta(spark, sf_dir):
    pdf = REGISTRY["analytics_shift_share"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 5  # one row per region
    assert np.allclose(
        pdf.delta, pdf.national_effect + pdf.competitive_shift, atol=0.02
    )
    # competitive shifts cancel in aggregate (up to the per-row rounding)
    assert abs(pdf.competitive_shift.sum()) < 0.05
    assert np.allclose(pdf.delta, pdf.rev_y2 - pdf.rev_y1, atol=0.02)


def test_sign_test_matches_pandas_twin(spark, sf_dir):
    pdf = REGISTRY["stats_sign_test"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    mid = (ev.ts.min().value + ev.ts.max().value) / 2
    ev = ev.assign(
        cents=np.round(ev.value * 100).astype("int64"),
        is_first=ev.ts.astype("int64") * 2
        < ev.ts.min().value + ev.ts.max().value,
    )
    g = ev.groupby("user_id").apply(
        lambda u: pd.Series(
            {
                "c1": u[u.is_first].cents.sum(),
                "n1": int(u.is_first.sum()),
                "c2": u[~u.is_first].cents.sum(),
                "n2": int((~u.is_first).sum()),
            }
        ),
        include_groups=False,
    )
    g = g[(g.n1 > 0) & (g.n2 > 0)]
    lhs, rhs = g.c2 * g.n1, g.c1 * g.n2
    npos, nnz = int((lhs > rhs).sum()), int((lhs != rhs).sum())
    assert pdf.n_pairs[0] == len(g)
    assert pdf.n_nonzero[0] == nnz and pdf.n_positive[0] == npos
    cc = 0.5 if 2 * npos > nnz else (-0.5 if 2 * npos < nnz else 0.0)
    z = (npos - nnz / 2.0 - cc) / np.sqrt(nnz / 4.0)
    assert abs(pdf.z[0] - z) < 1e-5


def test_ma_crossover_alternates_and_matches_pandas(spark, sf_dir):
    pdf = REGISTRY["timeseries_ma_crossover_signals"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    # signals alternate golden/death by construction
    kinds = pdf.sort_values("signal_day").signal.tolist()
    assert all(a != b for a, b in zip(kinds, kinds[1:]))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    daily = (
        pd.Series(
            np.round(ev.value.to_numpy() * 100).astype("int64"),
            index=ev.ts.dt.floor("D"),
        )
        .groupby(level=0)
        .sum()
        .sort_index()
    )
    fast = daily.rolling(7, min_periods=1).mean()
    slow = daily.rolling(28, min_periods=1).mean()
    s = np.sign(fast - slow)
    crossings = [
        (d, "golden_cross" if s.iloc[i] > s.iloc[i - 1] else "death_cross")
        for i, d in enumerate(daily.index)
        if i > 0 and s.iloc[i] != s.iloc[i - 1] and s.iloc[i] != 0
    ]
    assert [(d, k) for d, k in crossings] == list(
        zip(pdf.sort_values("signal_day").signal_day, kinds)
    )
