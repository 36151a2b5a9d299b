"""Second round-7 batch invariants: graph metrics, survival C-index,
reliability/outlier stats, SAX/Croston, containment, robust features."""

from __future__ import annotations

import pandas as pd
import pytest

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_local_clustering_bounds_and_consistency(spark, sf_dir):
    """cc must lie in [0, 1] and equal 2t/(d(d-1)) exactly; the row set
    is the top-20 of a deterministic total order."""
    pdf = REGISTRY["graph_local_clustering"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 20
    assert ((pdf.local_cc >= 0) & (pdf.local_cc <= 1)).all()
    recomputed = 2.0 * pdf.n_tri / (pdf.degree * (pdf.degree - 1))
    assert (pdf.local_cc == recomputed).all()
    assert (pdf.degree >= 2).all()


def test_resource_allocation_score_bounds(spark, sf_dir):
    """Each common item contributes at most 1/2 (deg >= 2 for any shared
    item), so ra_score <= n_common / 2; scores are positive and sorted."""
    pdf = REGISTRY["graph_resource_allocation"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 20
    assert (pdf.ra_score > 0).all()
    assert (pdf.ra_score <= pdf.n_common / 2.0 + 1e-12).all()
    assert (pdf.ra_score.values == sorted(pdf.ra_score.values, reverse=True)).all()


def test_degree_assortativity_in_valid_range(spark, sf_dir):
    pdf = REGISTRY["graph_degree_assortativity"].fn(spark, sf_dir).toPandas()
    r = pdf.assortativity.iloc[0]
    assert -1.0 <= r <= 1.0
    assert pdf.n_directed_edges.iloc[0] > 0


def test_cindex_bounds_and_pair_accounting(spark, sf_dir):
    pdf = REGISTRY["stats_concordance_cindex"].fn(spark, sf_dir).toPandas()
    row = pdf.iloc[0]
    assert row.n_pairs > 0
    assert row.n_concordant + row.n_tied <= row.n_pairs
    assert 0.0 <= row.c_index <= 1.0
    assert row.c_index == (2 * row.n_concordant + row.n_tied) / (2.0 * row.n_pairs)


def test_cronbach_alpha_range(spark, sf_dir):
    """alpha <= 1 by construction; k_items pinned; n_subjects = users."""
    pdf = REGISTRY["stats_cronbach_alpha"].fn(spark, sf_dir).toPandas()
    row = pdf.iloc[0]
    assert row.k_items == 4
    assert row.alpha <= 1.0
    assert row.n_subjects > 0


def test_grubbs_statistic_bound(spark, sf_dir):
    """G is bounded by (n-1)/sqrt(n) (Grubbs 1950) and positive."""
    import math

    pdf = REGISTRY["stats_grubbs_outlier"].fn(spark, sf_dir).toPandas()
    row = pdf.iloc[0]
    n = row.n_days
    assert 0 < row.g_stat <= (n - 1) / math.sqrt(n) + 1e-9


def test_sax_covers_all_days_and_symbols_match_z(spark, sf_dir):
    from go_batch_processor_spark.operators.timeseries import (
        SAX_BP_HI,
        SAX_BP_LO,
        SAX_SEGMENTS,
    )

    pdf = (
        REGISTRY["timeseries_sax_symbolic"].fn(spark, sf_dir)
        .toPandas()
        .sort_values("segment")
    )
    assert list(pdf.segment) == list(range(SAX_SEGMENTS))
    # segment sizes differ by at most one day (near-equal PAA)
    assert pdf.n_days.max() - pdf.n_days.min() <= 1
    for _, r in pdf.iterrows():
        if r.paa_z < SAX_BP_LO:
            assert r.symbol == "a"
        elif r.paa_z < 0:
            assert r.symbol == "b"
        elif r.paa_z < SAX_BP_HI:
            assert r.symbol == "c"
        else:
            assert r.symbol == "d"


def test_croston_matches_pandas_recursion(spark, sf_dir):
    """The JVM fold must reproduce the Croston recursion computed row by
    row in pandas on the same occurrence list."""
    from go_batch_processor_spark.operators.timeseries import CROSTON_ALPHA

    pdf = (
        REGISTRY["timeseries_croston"].fn(spark, sf_dir)
        .toPandas()
        .sort_values("rn")
        .reset_index(drop=True)
    )
    assert len(pdf) > 3
    z = p = None
    for i, r in pdf.iterrows():
        if z is None:
            z, p = float(r.q), 1.0
        else:
            z = CROSTON_ALPHA * r.q + (1 - CROSTON_ALPHA) * z
            p = CROSTON_ALPHA * r.gap_d + (1 - CROSTON_ALPHA) * p
        assert abs(round(z, 6) - r.z_size) < 1e-9, i
        assert abs(round(p, 6) - r.p_interval) < 1e-9, i
        assert abs(round(z / p, 6) - r.forecast_per_day) < 1e-9, i
    # gaps are positive and the first is the init convention (1)
    assert pdf.gap_d.iloc[0] == 1
    assert (pdf.gap_d > 0).all()


def test_containment_catches_jaccard_blind_pairs(spark, sf_dir):
    """Containment must (a) bound each direction in (0, 1], and (b) find
    every pair the symmetric Jaccard key finds at its higher threshold —
    J >= 0.6 implies both containments >= 0.6, and empirically the
    fixture's near-dup pairs all exceed 0.8 in at least one direction."""
    cont = REGISTRY["dedup_containment_ngram"].fn(spark, sf_dir).toPandas()
    assert len(cont) > 0
    for c in ("cont_a", "cont_b"):
        assert ((cont[c] > 0) & (cont[c] <= 1.0)).all()
    jac = REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir).toPandas()
    jpairs = set(zip(jac.doc_a, jac.doc_b))
    cpairs = set(zip(cont.doc_a, cont.doc_b))
    missing = jpairs - cpairs
    assert not missing, f"jaccard pairs missing from containment: {missing}"


def test_robust_scale_centering_and_spread(spark, sf_dir):
    """Median of scaled values is ~0 and the IQR of scaled values is ~1
    (definitional for median/IQR scaling)."""
    pdf = REGISTRY["feature_robust_scale"].fn(spark, sf_dir).toPandas()
    s = pdf.scaled_robust
    assert abs(s.median()) < 1e-6
    q1, q3 = s.quantile(0.25), s.quantile(0.75)
    assert abs((q3 - q1) - 1.0) < 1e-4
    assert (pdf.iqr_price > 0).all()


def test_onehot_topk_partition_of_unity(spark, sf_dir):
    """Every row activates EXACTLY one indicator (top-5 or other), and
    indicator popularity ordering matches the rank definition."""
    pdf = REGISTRY["feature_onehot_topk"].fn(spark, sf_dir).toPandas()
    oh = [f"oh_{i}" for i in range(1, 6)] + ["oh_other"]
    assert (pdf[oh].sum(axis=1) == 1).all()
    counts = [pdf[f"oh_{i}"].sum() for i in range(1, 6)]
    assert counts == sorted(counts, reverse=True)


def test_dtw_matches_python_dp(spark, sf_dir):
    """The nested JVM fold must agree bit-exactly with a pure-Python DP
    over the same z-scored series (identical |.|, +, min sequences)."""
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from go_batch_processor_spark.catalog import load_table
    from go_batch_processor_spark.operators.timeseries import DTW_BAND

    got = REGISTRY["timeseries_dtw_distance"].fn(spark, sf_dir).toPandas().iloc[0]
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
        )
        .orderBy("d")
        .toPandas()
    )

    def z(v):
        n = len(v)
        s = float(sum(v))
        q = float(sum(x * x for x in v))
        sd = math.sqrt((q - s * s / n) / (n - 1.0))
        return [(float(x) - s / n) / sd for x in v]

    a, b = z(daily.rev.tolist()), z(daily.cnt.tolist())
    n, m = len(a), len(b)
    prev = [0.0] + [math.inf] * m
    for i in range(1, n + 1):
        cur = [math.inf]
        for j in range(1, m + 1):
            if abs(i - j) > DTW_BAND:
                cur.append(math.inf)
            else:
                cur.append(
                    abs(a[i - 1] - b[j - 1]) + min(prev[j], prev[j - 1], cur[j - 1])
                )
        prev = cur
    assert got.n_a == n and got.n_b == m
    assert abs(got.dtw_distance - round(prev[m], 6)) < 1e-9
    assert abs(got.dtw_normalized - round(prev[m] / (n + m), 6)) < 1e-9


def test_pelt_matches_exact_dp_and_tiles_calendar(spark, sf_dir):
    """PELT's pruning is exactness-preserving: the segmentation must equal
    the O(n^2) DP without pruning, and segments must tile the series."""
    import math

    from pyspark.sql import functions as F

    from go_batch_processor_spark.catalog import load_table
    from go_batch_processor_spark.operators.timeseries import PELT_MIN_SIZE

    pdf = (
        REGISTRY["timeseries_changepoint_pelt"].fn(spark, sf_dir)
        .toPandas()
        .sort_values("segment")
    )
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("x"))
        .orderBy("d")
        .toPandas()
    )
    xs = [float(v) for v in daily.x.tolist()]
    n = len(xs)
    ps = [0.0] * (n + 1)
    pq = [0.0] * (n + 1)
    for i, v in enumerate(xs):
        ps[i + 1] = ps[i] + v
        pq[i + 1] = pq[i] + v * v

    def sse(i, j):
        mlen = j - i
        s = ps[j] - ps[i]
        return (pq[j] - pq[i]) - s * s / mlen

    var = (pq[n] - ps[n] * ps[n] / n) / (n - 1)
    beta = 2.0 * var * math.log(n)
    fcost = [0.0] + [math.inf] * n
    last = [0] * (n + 1)
    for t in range(PELT_MIN_SIZE, n + 1):
        for s in range(0, t - PELT_MIN_SIZE + 1):
            if s != 0 and math.isinf(fcost[s]):
                continue
            c = fcost[s] + sse(s, t) + beta
            if c < fcost[t]:
                fcost[t], last[t] = c, s
    bounds = []
    t = n
    while t > 0:
        bounds.append((last[t], t))
        t = last[t]
    bounds.reverse()
    assert len(pdf) == len(bounds)
    # segments tile the calendar: n_days sums to the series length
    assert pdf.n_days.sum() == n
    for (s, t), (_, row) in zip(bounds, pdf.iterrows()):
        assert row.n_days == t - s
        assert row.mean_revenue == round((ps[t] - ps[s]) / (t - s) / 100.0, 2)


def test_poisson_dispersion_consistency(spark, sf_dir):
    """Dispersion and chi2 must satisfy chi2 = (n-1)*D up to display
    rounding, and user-count data is overdispersed vs Poisson (D > 1)."""
    pdf = REGISTRY["stats_poisson_dispersion"].fn(spark, sf_dir).toPandas()
    r = pdf.iloc[0]
    assert r.n_users > 1
    assert abs(r.chi2 - (r.n_users - 1) * r.dispersion) / max(r.chi2, 1.0) < 1e-4


def test_gamma_fit_reconstructs_mean(spark, sf_dir):
    """Method-of-moments identity: k * theta == mean (both in hours)."""
    pdf = REGISTRY["stats_gamma_fit_moments"].fn(spark, sf_dir).toPandas()
    r = pdf.iloc[0]
    assert r.n_converters > 0
    assert r.shape_k > 0 and r.scale_theta_hours > 0
    assert abs(r.shape_k * r.scale_theta_hours - r.mean_hours) < 1e-3


def test_vad_segments_are_maximal_runs(spark, sf_dir):
    """Within a media, segments must be disjoint, ordered, above
    threshold, and MAXIMAL (no two segments touch — a shared boundary
    would mean the island split incorrectly)."""
    from go_batch_processor_spark.operators.multimodal import VAD_RMS_THRESHOLD

    pdf = (
        REGISTRY["multimodal_audio_vad"].fn(spark, sf_dir)
        .toPandas()
        .sort_values(["media_id", "seg_idx"])
    )
    assert len(pdf) > 0
    assert (pdf.peak_rms >= VAD_RMS_THRESHOLD).all()
    assert (pdf.n_frames == pdf.end_frame - pdf.start_frame + 1).all()
    for _, g in pdf.groupby("media_id"):
        assert list(g.seg_idx) == list(range(len(g)))
        prev_end = None
        for _, r in g.iterrows():
            if prev_end is not None:
                assert r.start_frame > prev_end + 1  # maximality: a gap exists
            prev_end = r.end_frame


def test_count_encoding_accounting(spark, sf_dir):
    """Per-brand count must equal the actual row count of that brand and
    frequencies must sum to 1 over distinct brands."""
    pdf = REGISTRY["feature_count_encoding"].fn(spark, sf_dir).toPandas()
    by_brand = pdf.groupby("p_brand").agg(n=("p_partkey", "size"), c=("brand_count", "first"))
    assert (by_brand.n == by_brand.c).all()
    freqs = pdf.drop_duplicates("p_brand").brand_freq
    assert abs(freqs.sum() - 1.0) < 1e-12


def test_distributed_median_matches_single_node(spark, sf_dir):
    """The dist_rank median must equal pandas' exact median of the same
    cents (the single-node ground truth)."""
    from pyspark.sql import functions as F

    from go_batch_processor_spark.catalog import load_table

    got = REGISTRY["agg_median_distributed"].fn(spark, sf_dir).toPandas().iloc[0]
    cents = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"))
        .toPandas()
        .c
    )
    assert got.n_rows == len(cents)
    assert got.median_price == round(float(cents.median()) / 100.0, 4)


def test_phash_hamming_banding_is_exact(spark, sf_dir):
    """The 4x16-bit band join must find EXACTLY the pairs within the
    Hamming radius — verified by brute-forcing all pairs of the
    collected hash table (bounded at test scale)."""
    from itertools import combinations

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from go_batch_processor_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        _phash_kernel,
        media_table,
    )

    got = REGISTRY["dedup_image_phash_hamming"].fn(spark, sf_dir).toPandas()
    assert len(got) > 0
    assert (got.hamming <= PHASH_HAMMING_MAX).all()

    @pandas_udf(T.BinaryType())
    def perturb(payload: pd.Series) -> pd.Series:
        return payload.map(lambda b: bytes(b[:-1]) + bytes([(b[-1] + 16) % 256]))

    @pandas_udf(T.LongType())
    def phash(payload: pd.Series) -> pd.Series:
        return _phash_kernel(payload)

    base = media_table(spark, sf_dir)
    dup = (
        base.filter(F.col("media_id") % 10 == 0)
        .withColumn("media_id", F.col("media_id") + 1_000_000)
        .withColumn("payload", perturb("payload"))
    )
    hashes = (
        base.unionByName(dup)
        .select("media_id", phash("payload").alias("ph"))
        .toPandas()
    )
    expected = set()
    rows = list(zip(hashes.media_id, hashes.ph))
    for (ma, pa), (mb, pb) in combinations(rows, 2):
        if ma > mb:
            ma, mb, pa, pb = mb, ma, pb, pa
        h = bin((int(pa) & (2**64 - 1)) ^ (int(pb) & (2**64 - 1))).count("1")
        if h <= PHASH_HAMMING_MAX:
            expected.add((ma, mb, h))
    assert set(zip(got.media_a, got.media_b, got.hamming)) == expected


def test_odds_ratio_consistency_with_fisher_cells(spark, sf_dir):
    """OR/RR must recompute from the emitted cells, and the cells must
    match stats_fisher_exact's contingency (same framing)."""
    got = REGISTRY["stats_odds_ratio"].fn(spark, sf_dir).toPandas().iloc[0]
    a, b, c, d = got.a, got.b, got.c, got.d
    assert min(a, b, c, d) > 0
    assert got.odds_ratio == round((a * d) / (b * c), 6)
    assert got.relative_risk == round((a / (a + b)) / (c / (c + d)), 6)
    fisher = REGISTRY["stats_fisher_exact"].fn(spark, sf_dir).toPandas().iloc[0]
    cols = set(fisher.index)
    if {"a", "b", "c", "d"} <= cols:
        assert (fisher.a, fisher.b, fisher.c, fisher.d) == (a, b, c, d)


def test_hierarchical_reconcile_coherence(spark, sf_dir):
    """Shares sum to 1; top-down forecasts are coherent by construction
    (they sum to the total daily rate); bottom-up generally does NOT —
    that incoherence is the reason the op exists."""
    pdf = REGISTRY["timeseries_hierarchical_reconcile"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 25  # TPC-H nations
    assert abs(pdf.share.sum() - 1.0) < 1e-3
    ratio = pdf.top_down / pdf.share
    # top_down / share is the constant total daily rate (up to rounding)
    assert (abs(ratio - ratio.iloc[0]) / ratio.iloc[0] < 1e-3).all()


def test_mantel_haenszel_between_stratum_extremes(spark, sf_dir):
    """The pooled OR must be positive and finite; with homogeneous
    strata it should land near the crude OR (same framing)."""
    got = REGISTRY["stats_mantel_haenszel"].fn(spark, sf_dir).toPandas().iloc[0]
    assert got.n_strata == 5
    assert got.mh_odds_ratio > 0
    crude = REGISTRY["stats_odds_ratio"].fn(spark, sf_dir).toPandas().iloc[0]
    # random stratification -> no confounding -> MH ~ crude (loose band)
    assert 0.5 * crude.odds_ratio < got.mh_odds_ratio < 2.0 * crude.odds_ratio


def test_nrr_accounting(spark, sf_dir):
    """retained <= what next-month spenders spent in total; nrr >= 0;
    months are consecutive and base revenue positive."""
    pdf = (
        REGISTRY["analytics_net_revenue_retention"].fn(spark, sf_dir)
        .toPandas()
        .sort_values("base_month")
        .reset_index(drop=True)
    )
    assert len(pdf) > 12
    assert (pdf.base_revenue > 0).all()
    assert (pdf.nrr >= 0).all()
    # final month has no successor data -> nrr 0 there
    assert pdf.nrr.iloc[-1] == 0.0


def test_correlation_matrix_matches_builtin_corr(spark, sf_dir, duck):
    """r in [-1,1] for all pairs, and each must equal DuckDB's built-in
    corr() on the same integer-unit columns (independent formula)."""
    pdf = REGISTRY["profile_correlation_matrix"].fn(spark, sf_dir).toPandas()
    assert len(pdf) == 6
    assert ((pdf.pearson_r >= -1.0) & (pdf.pearson_r <= 1.0)).all()
    units = {
        "l_quantity": "CAST(l_quantity AS BIGINT)",
        "l_extendedprice": "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "l_discount": "CAST(round(l_discount * 100) AS BIGINT)",
        "l_tax": "CAST(round(l_tax * 100) AS BIGINT)",
    }
    for _, r in pdf.iterrows():
        ref = duck.sql(
            f"SELECT corr({units[r.col_a]}, {units[r.col_b]}) FROM lineitem"
        ).fetchone()[0]
        assert abs(r.pearson_r - ref) < 1e-6, (r.col_a, r.col_b)
