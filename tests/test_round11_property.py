"""Round-11 oracle-vs-math property tests on randomized shapes, plus
degenerate-input pins for the r11 ADVICE guards.

Two jobs (the r10 template: fixture parity pins Spark <-> oracle,
random-shape properties pin oracle <-> math):

1. Extend the random-shape layer to the remaining rank-based oracles
   without twins — ansari_bradley, friedman, page_trend,
   seasonal_mann_kendall (cucconi/siegel/quade gained theirs in r10).
2. Pin the degenerate-input NULL convention added this round: on
   zero-variance (all-tied) input the standardized statistics are
   mathematically undefined — previously DuckDB yielded inf/nan
   (IEEE x/0.0) while Spark's Divide yielded NULL, a latent
   cross-engine divergence the fixtures can never produce (the r10
   jonckheere class). Both engines now nullif-guard to NULL; these
   tests pin the ORACLE side, and
   test_degenerate_two_sample_spark_agrees pins the SPARK side on the
   same synthetic shapes.
"""
from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import example, given, settings, strategies as st

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _con_with_lineitem(df: pd.DataFrame) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register("li_src", df)
    con.sql("CREATE VIEW lineitem AS SELECT * FROM li_src")
    return con


def _con_with_events(df: pd.DataFrame) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register("ev_src", df)
    con.sql("CREATE VIEW events AS SELECT * FROM ev_src")
    return con


def _con_with_orders(df: pd.DataFrame) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register("ord_src", df)
    con.sql("CREATE VIEW orders AS SELECT * FROM ord_src")
    return con


# -- Ansari-Bradley ---------------------------------------------------------

@settings(max_examples=30, deadline=None)
@given(
    x=st.lists(st.integers(1, 6), min_size=3, max_size=30),
    y=st.lists(st.integers(1, 6), min_size=3, max_size=30),
)
@example(x=[4, 4, 4], y=[4, 4, 4, 4])  # all-tied: zero score variance
def test_ansari_oracle_random_shapes(x, y):
    """Ansari-Bradley re-derived from raw midranks: score
    s = min(R, N+1-R) of the average rank (the R tie convention the
    oracle's doubled integer scores encode), standardized by the exact
    SRS-without-replacement moments of the pooled score multiset."""
    allv = np.array(x + y, float)
    n = len(allv)
    n1 = len(x)
    n2 = n - n1
    r = pd.Series(allv).rank(method="average").to_numpy()
    s = np.minimum(r, n + 1 - r)
    g1 = np.arange(n) < n1
    ab = s[g1].sum()
    mean = n1 * s.mean()
    popvar = (s**2).mean() - s.mean() ** 2
    var = n1 * n2 * popvar / (n - 1)
    df = pd.DataFrame(
        {
            "l_quantity": [float(v) for v in x + y],
            "l_linestatus": ["O"] * n1 + ["F"] * n2,
        }
    )
    con = _con_with_lineitem(df)
    row = con.sql(REGISTRY["stats_ansari_bradley"].oracle).df().iloc[0]
    assert row.n1 == n1 and row.n2 == n2
    assert row.ab_stat == pytest.approx(ab, abs=1e-4)
    assert row.ab_mean == pytest.approx(mean, abs=1e-4)
    if var > 0:
        assert row.z == pytest.approx((ab - mean) / np.sqrt(var), abs=1e-6)
    else:
        # degenerate: undefined z surfaces as NULL, never inf/nan
        assert pd.isna(row.z)


# -- Friedman ---------------------------------------------------------------

_TRTS = ["click", "view", "purchase", "login", "logout"]


def _events_from_grid(grid) -> tuple[pd.DataFrame, int, int]:
    """One event per (day-of-week block, treatment) cell; values are
    cents/100 so the oracle's round(avg(value), 6) reproduces the grid
    verbatim. 2024-01-07 is a Sunday: 7 consecutive days hit 7 distinct
    dayofweek blocks."""
    k = min(len(row) for row in grid)
    grid = [row[:k] for row in grid]
    rows = []
    for bi, row in enumerate(grid):
        for ti, v in enumerate(row):
            rows.append(
                {
                    "ts": pd.Timestamp("2024-01-07") + pd.Timedelta(days=bi),
                    "event_type": _TRTS[ti],
                    "value": v / 100.0,
                }
            )
    return pd.DataFrame(rows), len(grid), k


@settings(max_examples=30, deadline=None)
@given(
    grid=st.lists(
        st.lists(st.integers(0, 400), min_size=2, max_size=5),
        min_size=2,
        max_size=7,
    )
)
@example(grid=[[7, 7, 7], [7, 7, 7], [7, 7, 7]])  # fully tied cells
def test_friedman_oracle_random_complete_blocks(grid):
    """Friedman chi2 re-derived from a random complete-block grid with
    the oracle's exact ranking convention: within-block row_number over
    (mean, treatment-name) — deterministic tie-break, NOT midranks."""
    k = min(len(row) for row in grid)
    grid = [row[:k] for row in grid]
    b = len(grid)
    df, _, _ = _events_from_grid(grid)
    m = np.round(np.array(grid, dtype=float) / 100.0, 6)
    r = np.zeros_like(m)
    for bi in range(b):
        order = sorted(range(k), key=lambda t: (m[bi][t], _TRTS[t]))
        for rank0, t in enumerate(order):
            r[bi][t] = rank0 + 1
    rj = r.sum(axis=0)
    chi2 = 12.0 / (b * k * (k + 1)) * (rj**2).sum() - 3.0 * b * (k + 1)
    con = _con_with_events(df)
    row = con.sql(REGISTRY["stats_friedman_test"].oracle).df().iloc[0]
    assert row.b == b and row.k == k
    assert row.chi2_f == pytest.approx(chi2, abs=1e-6)
    assert bool(row.reject_05) == (chi2 > 9.487729036781154)


# -- Page trend -------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(
    grid=st.lists(
        st.lists(st.integers(0, 10_000), min_size=12, max_size=12),
        min_size=1,
        max_size=5,
    ),
    partial_months=st.integers(0, 11),
)
def test_page_trend_oracle_random_years(grid, partial_months):
    """Page's L re-derived from random complete years of monthly cents
    with average-rank midranks, plus an INCOMPLETE trailing year that
    both sides must exclude (a partial block has no 12-rank vector)."""
    b = len(grid)
    rows = []
    for yi, months in enumerate(grid):
        for mi, cents in enumerate(months):
            rows.append(
                {
                    "o_orderdate": pd.Timestamp(1995 + yi, mi + 1, 1),
                    "o_totalprice": cents / 100.0,
                }
            )
    for mi in range(partial_months):  # excluded: fewer than 12 months
        rows.append(
            {
                "o_orderdate": pd.Timestamp(1995 + b, mi + 1, 1),
                "o_totalprice": 42.0,
            }
        )
    df = pd.DataFrame(rows)
    L = 0.0
    for months in grid:
        r = pd.Series(months).rank(method="average").to_numpy()
        L += float((np.arange(1, 13) * r).sum())
    l_mean = b * 12 * 13.0 * 13.0 / 4.0
    z = (L - l_mean) / np.sqrt(b * 13.0 * 143.0)
    con = _con_with_orders(df)
    row = con.sql(REGISTRY["stats_page_trend_test"].oracle).df().iloc[0]
    assert row.b == b and row.k == 12
    assert row.page_l == pytest.approx(L, abs=1e-6)
    assert row.l_mean == pytest.approx(l_mean, abs=1e-4)
    assert row.z == pytest.approx(z, abs=1e-6)


# -- Seasonal Mann-Kendall --------------------------------------------------

@settings(max_examples=30, deadline=None)
@given(
    grid=st.lists(
        st.lists(st.integers(0, 6), min_size=2, max_size=6),
        min_size=1,
        max_size=4,
    )
)
@example(grid=[[3, 3, 3], [5, 5, 5, 5]])  # fully tied seasons: Var S = 0
def test_seasonal_mk_oracle_random_cells(grid, ):
    """Seasonal MK re-derived from random (month, year) cell grids:
    S = sum of within-season pairwise signs across years, Var from the
    per-season n(n-1)(2n+5)/18 with the exact tie correction, z with
    continuity correction — NULL when every season is fully tied."""
    rows = []
    for mi, years in enumerate(grid):
        for yi, v in enumerate(years):
            rows.append(
                {
                    "o_orderdate": pd.Timestamp(1995 + yi, mi + 1, 1),
                    "o_totalprice": float(v),
                }
            )
    df = pd.DataFrame(rows)
    s = 0
    var_num = 0
    tie_term = 0
    for years in grid:
        a = np.array(years)
        nn = len(a)
        for i in range(nn):
            for j in range(i + 1, nn):
                s += int(np.sign(a[j] - a[i]))
        var_num += nn * (nn - 1) * (2 * nn + 5)
        for _, t in pd.Series(a).value_counts().items():
            if t > 1:
                tie_term += t * (t - 1) * (2 * t + 5)
    var_s = (var_num - tie_term) / 18.0
    con = _con_with_orders(df)
    row = con.sql(REGISTRY["stats_seasonal_mann_kendall"].oracle).df().iloc[0]
    assert row.n_seasons == len(grid)
    assert row.n_points == sum(len(y) for y in grid)
    assert row.s == s
    assert row.var_s == pytest.approx(round(var_s, 4), abs=1e-6)
    if var_s > 0:
        cc = (s - 1) if s > 0 else (s + 1) if s < 0 else 0
        assert row.z == pytest.approx(cc / np.sqrt(var_s), abs=1e-6)
    else:
        assert pd.isna(row.z)


# -- Degenerate-input NULL pins (oracle side) -------------------------------

_TIED_TWO_SAMPLE = pd.DataFrame(
    {
        "l_quantity": [5.0] * 9,
        "l_linestatus": ["O"] * 4 + ["F"] * 5,
        "l_returnflag": ["R"] * 4 + ["N"] * 5,
    }
)


@pytest.mark.parametrize(
    "key,null_cols",
    [
        ("stats_brunner_munzel", ["w_stat", "df"]),
        ("stats_lepage", ["w_component", "a_component", "lepage_l"]),
        ("stats_siegel_tukey", ["z_st"]),
        ("stats_ansari_bradley", ["z"]),
        ("stats_cucconi_test", ["z_u", "z_v", "rho", "c_stat"]),
    ],
)
def test_two_sample_all_tied_oracle_yields_null(key, null_cols):
    """All-tied two-sample input has zero rank/score variance: every
    standardized statistic is undefined and must surface as NULL (not
    inf/nan) so the oracle agrees with Spark's Divide semantics."""
    con = _con_with_lineitem(_TIED_TWO_SAMPLE)
    row = con.sql(REGISTRY[key].oracle).df().iloc[0]
    assert row.n1 == 4 and row.n2 == 5
    for c in null_cols:
        assert pd.isna(row[c]), (key, c, row[c])


def test_cucconi_two_distinct_values_oracle_yields_null_c():
    """With exactly TWO distinct pooled values the (U, V) score pairs
    are perfectly linearly dependent, |rho| = 1, and the quadratic
    form's denominator 2(1-rho^2) is exactly 0 — c_stat must be NULL
    while z_u/z_v stay finite."""
    df = pd.DataFrame(
        {
            "l_quantity": [1.0, 1.0, 2.0, 1.0, 2.0, 2.0, 1.0],
            "l_returnflag": ["R"] * 3 + ["N"] * 4,
        }
    )
    con = _con_with_lineitem(df)
    row = con.sql(REGISTRY["stats_cucconi_test"].oracle).df().iloc[0]
    assert abs(row.rho) == pytest.approx(1.0, abs=1e-9)
    assert np.isfinite(row.z_u) and np.isfinite(row.z_v)
    assert pd.isna(row.c_stat)


def test_quade_single_treatment_oracle_yields_null():
    """k = 1 makes every doubled centered score 2r - k - 1 = 0, so
    A2 = B = 0 and F = 0/0 — NULL on both engines, never nan."""
    ts = pd.date_range("2024-01-01", periods=28, freq="D")
    ev = pd.DataFrame(
        [
            {"ts": t, "event_type": "a", "value": float(i % 5)}
            for i, t in enumerate(ts)
        ]
    )
    con = _con_with_events(ev)
    row = con.sql(REGISTRY["stats_quade_test"].oracle).df().iloc[0]
    assert row.k == 1
    assert pd.isna(row.f_stat)


# -- Degenerate-input agreement (Spark side) --------------------------------

def test_degenerate_two_sample_spark_agrees(spark, tmp_path):
    """The Spark expressions must yield the SAME NULLs as the guarded
    oracles on the all-tied shape — one synthetic lineitem parquet, all
    five guarded two-sample keys, plus the two-distinct-value cucconi
    c_stat case. This is the cross-engine half of the NULL convention
    (the oracle half is pinned above on identical data)."""
    d1 = tmp_path / "tied"
    d1.mkdir()
    _TIED_TWO_SAMPLE.to_parquet(d1 / "lineitem.parquet")
    for key, null_cols in [
        ("stats_brunner_munzel", ["w_stat", "df"]),
        ("stats_lepage", ["w_component", "a_component", "lepage_l"]),
        ("stats_siegel_tukey", ["z_st"]),
        ("stats_ansari_bradley", ["z"]),
        ("stats_cucconi_test", ["z_u", "z_v", "rho", "c_stat"]),
    ]:
        row = REGISTRY[key].fn(spark, str(d1)).collect()[0]
        assert row.n1 == 4 and row.n2 == 5, key
        for c in null_cols:
            assert row[c] is None, (key, c, row[c])
    d2 = tmp_path / "two_vals"
    d2.mkdir()
    pd.DataFrame(
        {
            "l_quantity": [1.0, 1.0, 2.0, 1.0, 2.0, 2.0, 1.0],
            "l_returnflag": ["R"] * 3 + ["N"] * 4,
        }
    ).to_parquet(d2 / "lineitem.parquet")
    row = REGISTRY["stats_cucconi_test"].fn(spark, str(d2)).collect()[0]
    assert abs(row.rho) == pytest.approx(1.0, abs=1e-9)
    assert row.c_stat is None


def test_degenerate_seasonal_mk_and_quade_spark_agree(spark, tmp_path):
    """Spark-side NULL agreement for the two block/seasonal guards:
    fully-tied seasons (Var S = 0) and the single-treatment Quade."""
    d1 = tmp_path / "mk"
    d1.mkdir()
    rows = []
    for mi, years in enumerate([[3.0] * 3, [5.0] * 4]):
        for yi, v in enumerate(years):
            rows.append(
                {
                    "o_orderdate": pd.Timestamp(1995 + yi, mi + 1, 1),
                    "o_totalprice": v,
                }
            )
    mk = pd.DataFrame(rows)
    # fixture schema reads o_orderdate as TIMESTAMP(MICROS)
    mk["o_orderdate"] = mk["o_orderdate"].astype("datetime64[us]")
    mk.to_parquet(d1 / "orders.parquet")
    row = REGISTRY["stats_seasonal_mann_kendall"].fn(spark, str(d1)).collect()[0]
    assert row.var_s == 0.0 and row.z is None
    d2 = tmp_path / "quade"
    d2.mkdir()
    ts = pd.date_range("2024-01-01", periods=28, freq="D")
    pd.DataFrame(
        [
            {"ts": t, "event_type": "a", "value": float(i % 5)}
            for i, t in enumerate(ts)
        ]
    ).to_parquet(d2 / "events.parquet")
    row = REGISTRY["stats_quade_test"].fn(spark, str(d2)).collect()[0]
    assert row.k == 1 and row.f_stat is None


# -- Discord top-k (matrix-profile family) ----------------------------------

@settings(max_examples=15, deadline=None)
@given(vals=st.lists(st.integers(0, 10_000), min_size=3, max_size=60))
@example(vals=[5] * 30)  # constant series: every subsequence drops out
def test_discord_topk_oracle_is_profile_maxima(vals):
    """timeseries_discord_topk must be exactly the top-k rows of the
    matrix profile ordered by mp descending (i tie-break): every
    discord row equals its profile row, the count is min(k, |profile|),
    and no excluded profile row beats an included one (1e-6 tolerance
    for the raw-vs-rounded ordering boundary)."""
    from go_batch_processor_spark.operators.timeseries import DISCORD_TOP_K

    ts = pd.date_range("2024-01-01", periods=len(vals), freq="h")
    df = pd.DataFrame({"ts": ts, "value": [v / 100.0 for v in vals]})
    con = duckdb.connect()
    con.register("ev_src", df)
    con.sql("CREATE VIEW events AS SELECT * FROM ev_src")
    prof = con.sql(REGISTRY["timeseries_matrix_profile"].oracle).df()
    disc = con.sql(REGISTRY["timeseries_discord_topk"].oracle).df()
    assert len(disc) == min(DISCORD_TOP_K, len(prof))
    by_i = {int(r.i): (r.mp_dist, int(r.nn_idx)) for _, r in prof.iterrows()}
    for _, r in disc.iterrows():
        assert by_i[int(r.i)] == (r.mp_dist, int(r.nn_idx))
    if len(prof) > len(disc):
        included = {int(r.i) for _, r in disc.iterrows()}
        worst_in = disc.mp_dist.min()
        best_out = max(
            r.mp_dist for _, r in prof.iterrows() if int(r.i) not in included
        )
        assert worst_in >= best_out - 1e-6


# -- PELT multi-segment oracle parity (the fixture never splits) -------------

def test_pelt_oracle_multi_segment_synthetic(spark, tmp_path):
    """The fixture series yields ONE segment at every SF, so the
    oracle's pruning + backtrack machinery never runs under the driver
    gate. Pin it here: a synthetic series with two hard level shifts
    must produce the SAME multi-segment answer from the Spark DP and
    the recursive-CTE replay — including the segment boundaries the
    data-dependent pruning must not corrupt."""
    import duckdb
    import pandas as pd

    from go_batch_processor_spark.registry import REGISTRY

    rows = []
    levels = [100.0] * 12 + [900.0] * 12 + [300.0] * 12
    for i, lv in enumerate(levels):
        # two events per day with deterministic wiggle
        for j in range(2):
            rows.append(
                {
                    "ts": pd.Timestamp("2024-03-01")
                    + pd.Timedelta(days=i, hours=j),
                    "value": lv + (i % 3) + j,
                }
            )
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = tmp_path / "src"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    got = [
        (r.segment, r.start_day, r.end_day, r.n_days, r.mean_revenue)
        for r in REGISTRY["timeseries_changepoint_pelt"]
        .fn(spark, str(d))
        .collect()
    ]
    assert len(got) >= 3, got  # the shifts must be found
    con = duckdb.connect()
    con.register("ev_src", df)
    con.sql("CREATE VIEW events AS SELECT * FROM ev_src")
    want = [
        (int(r.segment), r.start_day.to_pydatetime(),
         r.end_day.to_pydatetime(), int(r.n_days), r.mean_revenue)
        for _, r in con.sql(REGISTRY["timeseries_changepoint_pelt"].oracle)
        .df()
        .iterrows()
    ]
    assert got == want
