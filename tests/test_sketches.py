"""Error-bound tests for the mergeable-sketch aggregates (rows-only
queries get their correctness signal here instead of the DuckDB oracle)."""

from __future__ import annotations

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def test_hll_partitioned_merge_error_bound(spark, sf_dir):
    row = REGISTRY["agg_hll_partitioned_merge"].fn(spark, sf_dir).collect()[0]
    # HllSketch at Spark's default lgConfigK=12 has ~1.6% standard error;
    # 5% is a >3-sigma bound, deterministic for a fixed input set.
    assert row.exact_distinct > 0
    assert row.rel_err < 0.05, row
    # merged estimate must also dominate every single partition's count
    assert row.hll_estimate > 0


def test_hll_merge_matches_flat_sketch(spark, sf_dir):
    """Union of per-nation sketches must estimate like one flat sketch
    over all keys — the mergeability property the 100 TB rollup pattern
    depends on. NOT bit-equality: past sparse mode (~>512 keys, so at
    sf>=0.01) the flat and union paths promote to dense HLL differently
    and the estimates legitimately diverge WITHIN the sketch's error
    bound (lgk=12 -> ~1.6% stderr); both must stay near the true count
    and near each other."""
    from pyspark.sql import functions as F

    from go_batch_processor_spark.catalog import load_table

    c = load_table(spark, sf_dir, "customer")
    flat = c.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey")).alias("est")
    ).collect()[0].est
    merged = (
        c.groupBy("c_nationkey")
        .agg(F.hll_sketch_agg("c_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    true = c.select("c_custkey").distinct().count()
    assert abs(flat - true) / max(true, 1.0) < 0.03
    assert abs(merged - true) / max(true, 1.0) < 0.03
    assert abs(flat - merged) / max(flat, 1.0) < 0.02


def test_hll_intersection_tracks_exact_bitmap_setops(spark, sf_dir):
    """The HLL inclusion-exclusion overlap must track the EXACT bitmap
    set-ops twin within the compounded sketch error. Three lgk=12
    sketches each carry ~1.6% stderr; inclusion-exclusion compounds
    absolute errors, so the intersection bound is relative to the UNION
    size (the documented caveat), not the intersection size."""
    from go_batch_processor_spark.registry import REGISTRY

    approx = REGISTRY["agg_hll_intersection"].fn(spark, sf_dir).collect()[0]
    exact = REGISTRY["agg_bitmap_setops"].fn(spark, sf_dir).collect()[0]
    assert abs(approx.est_click - exact.n_click) / max(exact.n_click, 1) < 0.05
    assert (
        abs(approx.est_purchase - exact.n_purchase) / max(exact.n_purchase, 1)
        < 0.05
    )
    assert abs(approx.est_union - exact.n_union) / max(exact.n_union, 1) < 0.05
    assert (
        abs(approx.est_intersect - exact.n_intersect) / max(exact.n_union, 1)
        < 0.10
    )


def test_tdigest_rank_error_within_bound(spark, sf_dir):
    """Every reported quantile must sit within 1% rank error of the
    exact CDF (k0 scale bound is 1/(2*400) = 0.125%; 1% gives margin
    for interpolation at the tails)."""
    import numpy as np
    import pandas as pd

    got = REGISTRY["agg_tdigest_quantiles"].fn(spark, sf_dir).toPandas()
    vals = np.sort(
        pd.read_parquet(f"{sf_dir}/lineitem.parquet")["l_extendedprice"].to_numpy()
    )
    n = len(vals)
    assert (got["n"] == n).all()
    for _, r in got.iterrows():
        rank = np.searchsorted(vals, r["est"], side="right") / n
        assert abs(rank - r["q"]) <= 0.01, (r["q"], r["est"], rank)


def test_tdigest_merge_is_order_invariant(spark, sf_dir):
    """Repartitioning the input (different partial digests) must not move
    any estimate by more than the sketch's rank-error budget — the
    mergeability property that makes per-segment digests reusable."""
    import numpy as np
    import pandas as pd

    from go_batch_processor_spark.catalog import load_table
    from go_batch_processor_spark.operators.aggregates import TD_DELTA, _td_compress

    rng = np.random.default_rng(7)
    vals = rng.lognormal(3.0, 1.0, 50_000)
    m1, w1 = _td_compress(vals, np.ones(len(vals)), TD_DELTA)
    # two-level: split into 8 chunks, compress each, merge the centroids
    parts = np.array_split(rng.permutation(vals), 8)
    ms, ws = [], []
    for p in parts:
        m, w = _td_compress(p, np.ones(len(p)), TD_DELTA)
        ms += m
        ws += w
    m2, w2 = _td_compress(np.asarray(ms), np.asarray(ws), TD_DELTA)
    svals = np.sort(vals)
    for q in (0.01, 0.5, 0.99):
        for m, w in ((m1, w1), (m2, w2)):
            m_arr, w_arr = np.asarray(m), np.asarray(w)
            cum = np.cumsum(w_arr) - w_arr / 2.0
            est = np.interp(q * w_arr.sum(), cum, m_arr)
            rank = np.searchsorted(svals, est, side="right") / len(svals)
            assert abs(rank - q) <= 0.01, (q, est, rank)


def test_kmv_accuracy_vs_exact_bitmap(spark, sf_dir):
    """KMV intersection estimate must land within the sketch's relative
    standard error (~1/sqrt(k) on the union) of the exact answer."""
    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    a = set(ev.loc[ev.event_type == "click", "user_id"])
    b = set(ev.loc[ev.event_type == "purchase", "user_id"])
    got = REGISTRY["agg_kmv_theta_intersect"].fn(spark, sf_dir).toPandas().iloc[0]
    union, inter = len(a | b), len(a & b)
    k = got["k"]
    if union < k:  # degenerates to exact
        assert got["est_union"] == union and got["est_intersect"] == inter
    else:
        rse = 3.0 / (k**0.5)  # 3 sigma
        assert abs(got["est_union"] - union) <= rse * union + 2
        assert abs(got["est_intersect"] - inter) <= rse * union + 2


def test_td_compress_properties_hypothesis():
    """Property (hypothesis): for arbitrary value sets, _td_compress
    preserves total weight exactly-ish, respects the centroid budget,
    and keeps means within [min, max]."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from go_batch_processor_spark.operators.aggregates import _td_compress

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=1,
            max_size=2000,
        ),
        st.integers(min_value=8, max_value=200),
    )
    def inner(vals, delta):
        v = np.asarray(vals, dtype=float)
        w = np.ones(len(v))
        m, ww = _td_compress(v, w, delta)
        # honest k0 bound: every closed block exceeds cap - max_unit_weight,
        # so the centroid count is < 2*delta + 1 (and never exceeds n —
        # unit weights with cap < 2 simply stay exact)
        assert len(m) <= min(len(v), 2 * delta + 1)
        assert abs(sum(ww) - len(v)) < 1e-6 * max(len(v), 1)
        assert min(m) >= v.min() - 1e-9 and max(m) <= v.max() + 1e-9
        # weighted mean preserved (merging only averages)
        assert abs(
            float(np.dot(m, ww)) - float(v.sum())
        ) <= 1e-9 * float(np.abs(v).sum()) + 1e-6

    inner()


def test_fd_shrink_properties_hypothesis():
    """Property (hypothesis): FD shrink never increases any direction's
    energy and keeps the spectral error within ||A||_F^2 (loose bound;
    the tight l/2 bound is pinned on the fixture in test_ml)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from go_batch_processor_spark.operators.ml import _fd_shrink

    @settings(max_examples=25, deadline=None)
    @given(st.integers(10, 60), st.integers(2, 8), st.integers(0, 2**31 - 1))
    def inner(n, d, seed):
        rng = np.random.default_rng(seed)
        A = rng.normal(size=(n, d))
        ell = min(8, n)
        B = _fd_shrink(A, ell)
        assert B.shape[1] == d
        assert len(B) <= max(min(ell, n, d) - 1, 0) or len(B) <= ell
        AtA, BtB = A.T @ A, B.T @ B
        # sketch never overestimates energy in any direction
        evals = np.linalg.eigvalsh(AtA - BtB)
        assert evals.min() >= -1e-8
        assert np.linalg.norm(AtA - BtB, 2) <= (A**2).sum() + 1e-6

    inner()
