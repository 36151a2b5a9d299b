"""Independent-twin pins for the round-10 key additions (the r11 queue
drained early): every new oracled key is re-derived here from raw rows
with a SEPARATE formulation (pandas ranks / pure-Python folds /
brute-force per-position arrays), so a shared misunderstanding between
the Spark query and its DuckDB oracle cannot certify itself.

Covers: stats_brunner_munzel (scipy.stats.brunnermunzel formulation),
stats_lepage (raw-rank SRS standardizations), timeseries_holt_grid_search
(pure-Python 2-state fold), feature_quantile_normalization (brute-force
per-position reference distribution), graph_harmonic_centrality
(pure-Python BFS over the interaction edge list), and the upgraded
graph_betweenness_sampled oracle (exact Brandes twin lives in
tests/test_graph.py — here we pin that the ORACLE agrees with the Spark
side it newly gates).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_batch_processor_spark.operators.graph import (
    BETW_MAX_HOPS,
    BETW_N_SOURCES,
    HARMONIC_UNIT,
)
from go_batch_processor_spark.operators.stats import (
    feature_quantile_normalization,
    stats_brunner_munzel,
    stats_lepage,
)
from go_batch_processor_spark.operators.timeseries import (
    HOLT_GRID,
    timeseries_holt_grid_search,
)
from go_batch_processor_spark.operators.graph import graph_harmonic_centrality


@pytest.fixture(scope="module")
def li_groups(duck):
    df = duck.sql(
        "SELECT l_quantity AS v, l_linestatus = 'O' AS g1 FROM lineitem"
    ).df()
    return df


def test_brunner_munzel_matches_scipy_formulation(spark, sf_dir, li_groups):
    df = li_groups
    x = df[df.g1].v.to_numpy()
    y = df[~df.g1].v.to_numpy()
    nx, ny = len(x), len(y)
    rankc = pd.Series(np.concatenate([x, y])).rank(method="average").to_numpy()
    rankcx, rankcy = rankc[:nx], rankc[nx:]
    rankx = pd.Series(x).rank(method="average").to_numpy()
    ranky = pd.Series(y).rank(method="average").to_numpy()
    Sx = ((rankcx - rankx - rankcx.mean() + rankx.mean()) ** 2).sum() / (nx - 1)
    Sy = ((rankcy - ranky - rankcy.mean() + ranky.mean()) ** 2).sum() / (ny - 1)
    w = nx * ny * (rankcy.mean() - rankcx.mean()) / (
        (nx + ny) * np.sqrt(nx * Sx + ny * Sy)
    )
    dof = (nx * Sx + ny * Sy) ** 2 / (
        (nx * Sx) ** 2 / (nx - 1) + (ny * Sy) ** 2 / (ny - 1)
    )
    p_hat = (rankcy.mean() - (ny + 1) / 2) / nx
    row = stats_brunner_munzel(spark, sf_dir).collect()[0]
    assert row.n1 == nx and row.n2 == ny
    assert row.p_hat == pytest.approx(p_hat, abs=1e-6)
    assert row.w_stat == pytest.approx(w, abs=1e-6)
    assert row.df == pytest.approx(dof, abs=1e-3)


def test_lepage_matches_raw_rank_srs(spark, sf_dir, li_groups):
    df = li_groups
    r = df.v.rank(method="average").to_numpy()
    n = len(r)
    n1 = int(df.g1.sum())
    s = np.minimum(r, n + 1 - r)
    g1 = df.g1.to_numpy()

    def srs_z(stat, vals):
        n2 = n - n1
        exp = n1 * vals.mean()
        var = n1 * n2 * (n * (vals**2).sum() - vals.sum() ** 2) / (
            n**2 * (n - 1)
        )
        return (stat - exp) / np.sqrt(var)

    zw = srs_z(r[g1].sum(), r)
    za = srs_z(s[g1].sum(), s)
    row = stats_lepage(spark, sf_dir).collect()[0]
    assert row.w_component == pytest.approx(zw**2, abs=1e-6)
    assert row.a_component == pytest.approx(za**2, abs=1e-6)
    assert row.lepage_l == pytest.approx(zw**2 + za**2, abs=1e-6)


def test_holt_grid_matches_python_fold(spark, sf_dir, duck):
    v = [
        r[0]
        for r in duck.sql(
            """SELECT v FROM (
                 SELECT date_trunc('day', ts) AS d,
                        sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS v
                 FROM events GROUP BY 1) ORDER BY d"""
        ).fetchall()
    ]

    def holt(a, b):
        lvl, tr, sse = v[1], v[1] - v[0], 0.0
        for x in v[2:]:
            e = x - (lvl + tr)
            ln = a * x + (1 - a) * (lvl + tr)
            tr = b * (ln - lvl) + (1 - b) * tr
            lvl = ln
            sse += e * e
        return round(sse, 6), round(lvl, 4), round(tr, 4)

    got = {
        (r.alpha, r.beta): (r.sse, r.level, r.trend)
        for r in timeseries_holt_grid_search(spark, sf_dir).collect()
    }
    assert set(got) == set(HOLT_GRID)
    for a, b in HOLT_GRID:
        sse, lvl, tr = holt(a, b)
        assert got[(a, b)][0] == pytest.approx(sse, rel=1e-12), (a, b)
        assert got[(a, b)][1] == pytest.approx(lvl, rel=1e-12), (a, b)
        assert got[(a, b)][2] == pytest.approx(tr, rel=1e-9), (a, b)


def test_holt_sse_is_minimized_inside_grid_or_monotone(spark, sf_dir):
    """Sanity invariant: the SSE profile varies across the grid (a flat
    profile would mean the fold ignores its parameters)."""
    rows = timeseries_holt_grid_search(spark, sf_dir).collect()
    sses = {r.sse for r in rows}
    assert len(sses) == len(rows)


def test_quantile_normalization_matches_bruteforce(spark, sf_dir, duck):
    df = duck.sql(
        """SELECT CAST(round(l_quantity * 100) AS BIGINT) q,
                  CAST(round(l_discount * 100) AS BIGINT) d,
                  CAST(round(l_tax * 100) AS BIGINT) t
           FROM lineitem"""
    ).df()
    cols = {
        "quantity": np.sort(df.q.to_numpy()),
        "discount": np.sort(df.d.to_numpy()),
        "tax": np.sort(df.t.to_numpy()),
    }
    refsum = cols["quantity"] + cols["discount"] + cols["tax"]
    expected = {}
    for name, arr in cols.items():
        vals, starts, counts = np.unique(
            arr, return_index=True, return_counts=True
        )
        for v, s, c in zip(vals, starts, counts):
            expected[(name, v / 100.0)] = round(
                refsum[s : s + c].sum() / (3.0 * 100.0 * c), 6
            )
    out = feature_quantile_normalization(spark, sf_dir).collect()
    assert len(out) == len(expected)
    for r in out:
        assert r.qnorm == pytest.approx(expected[(r.col, r.v)], abs=0.0), (
            r.col,
            r.v,
        )
        assert r.hi - r.lo + 1 == r.n


def test_quantile_normalization_preserves_monotonicity(spark, sf_dir):
    """QN is a monotone transform within each feature: qnorm must be
    strictly increasing in v per column (distinct values -> distinct
    rank ranges -> distinct reference means on this fixture)."""
    out = feature_quantile_normalization(spark, sf_dir).toPandas()
    for col, grp in out.groupby("col"):
        g = grp.sort_values("v")
        assert (g.qnorm.diff().dropna() > 0).all(), col


def _interaction_edges_py(duck):
    pairs = duck.sql(
        """SELECT DISTINCT user_id * 2 AS u,
                  CAST(props->>'k' AS BIGINT) * 2 + 1 AS i
           FROM events WHERE props->>'k' IS NOT NULL"""
    ).fetchall()
    adj: dict[int, set[int]] = {}
    for u, i in pairs:
        adj.setdefault(int(u), set()).add(int(i))
        adj.setdefault(int(i), set()).add(int(u))
    return adj


def test_harmonic_centrality_matches_python_bfs(spark, sf_dir, duck):
    adj = _interaction_edges_py(duck)
    sources = sorted(adj)[:BETW_N_SOURCES]
    units: dict[int, int] = {}
    reached: dict[int, int] = {}
    for s in sources:
        dist = {s: 0}
        frontier = [s]
        for hop in range(1, BETW_MAX_HOPS + 1):
            nxt = []
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = hop
                        nxt.append(w)
            if not nxt:
                break
            frontier = nxt
        for v, d in dist.items():
            if d > 0:
                units[v] = units.get(v, 0) + HARMONIC_UNIT // d
                reached[v] = reached.get(v, 0) + 1
    top = sorted(
        units.items(),
        key=lambda kv: (
            -kv[1],
            # kind ASC is LEXICOGRAPHIC: 'item' < 'user'
            0 if kv[0] % 2 == 1 else 1,
            kv[0] // 2,
        ),
    )[:20]
    got = graph_harmonic_centrality(spark, sf_dir).collect()
    assert len(got) == len(top)
    for row, (node, u) in zip(got, top):
        assert row.harmonic_units == u
        assert row.n_reached == reached[node]
        kind = "user" if node % 2 == 0 else "item"
        assert (row.kind, row.entity_id) == (kind, node // 2)


def test_betweenness_oracle_matches_spark(spark, sf_dir, duck):
    """The r10 oracle upgrade: the unrolled-CTE Brandes oracle must agree
    with the Spark passes value-for-value at the fixture scale (the
    driver's own comparison, run here so a regression is caught before
    a sample)."""
    from go_batch_processor_spark.registry import REGISTRY

    spec = REGISTRY["graph_betweenness_sampled"]
    assert spec.oracle is not None
    spdf = spec.fn(spark, sf_dir).toPandas()
    odf = duck.sql(spec.oracle).df()
    from tests.parity import assert_frames_match

    assert_frames_match(spdf, odf, name="graph_betweenness_sampled")


def test_jonckheere_matches_bruteforce_pairwise(spark, sf_dir, duck):
    """2J re-derived by brute-force pairwise Mann-Whitney counting over
    every ordered group pair, and the tie-adjusted null moments from
    Hollander & Wolfe 6.19 directly on raw group/tie sizes."""
    from go_batch_processor_spark.operators.stats import (
        stats_jonckheere_terpstra,
    )

    df = duck.sql(
        "SELECT l_linenumber g, l_quantity v FROM lineitem"
    ).df()
    groups = sorted(df.g.unique())
    data = {g: np.sort(df[df.g == g].v.to_numpy()) for g in groups}
    u2 = 0
    for a in range(len(groups)):
        for b in range(a + 1, len(groups)):
            xs, y = data[groups[a]], data[groups[b]]
            less = np.searchsorted(xs, y, side="left")
            leq = np.searchsorted(xs, y, side="right")
            u2 += int(2 * less.sum() + (leq - less).sum())
    n = len(df)
    ng = np.array([len(data[g]) for g in groups], dtype=np.int64)
    tv = df.v.value_counts().to_numpy().astype(np.int64)
    exp_j = (n * n - (ng * ng).sum()) / 4
    var = (
        (
            n * (n - 1) * (2 * n + 5)
            - (ng * (ng - 1) * (2 * ng + 5)).sum()
            - (tv * (tv - 1) * (2 * tv + 5)).sum()
        )
        / 72
        + (ng * (ng - 1) * (ng - 2)).sum()
        * (tv * (tv - 1) * (tv - 2)).sum()
        / (36 * n * (n - 1) * (n - 2))
        + (ng * (ng - 1)).sum() * (tv * (tv - 1)).sum() / (8 * n * (n - 1))
    )
    z = (u2 / 2 - exp_j) / np.sqrt(var)
    row = stats_jonckheere_terpstra(spark, sf_dir).collect()[0]
    assert row.n == n and row.k == len(groups)
    assert row.u2 == u2
    assert row.z_stat == pytest.approx(z, abs=1e-6)


def test_matrix_profile_matches_bruteforce_numpy(spark, sf_dir, duck):
    """The exact z-normalized matrix profile re-derived with dense numpy:
    explicit z-normalization of every subsequence and full pairwise
    Euclidean distances (no correlation shortcut), honoring the m/2
    exclusion zone and the smallest-index tie rule."""
    from go_batch_processor_spark.operators.timeseries import (
        MP_EXCL_H,
        MP_WINDOW_H,
        timeseries_matrix_profile,
    )

    cents = np.array(
        [
            r[0]
            for r in duck.sql(
                """SELECT cents FROM (
                     SELECT date_trunc('hour', ts) AS h,
                            sum(CAST(round(value * 100) AS BIGINT)) AS cents
                     FROM events GROUP BY 1) ORDER BY h"""
            ).fetchall()
        ],
        dtype=np.float64,
    )
    m = MP_WINDOW_H
    n_sub = len(cents) - m + 1
    subs = np.lib.stride_tricks.sliding_window_view(cents, m)
    z = (subs - subs.mean(axis=1, keepdims=True)) / subs.std(
        axis=1, keepdims=True
    )
    expected = {}
    for i in range(n_sub):
        best, best_j = np.inf, None
        for j in range(n_sub):
            if abs(i - j) < MP_EXCL_H:
                continue
            d = float(np.sqrt(((z[i] - z[j]) ** 2).sum()))
            if d < best - 1e-9:
                best, best_j = d, j
        expected[i + 1] = (best, best_j + 1)
    got = timeseries_matrix_profile(spark, sf_dir).collect()
    assert len(got) == n_sub
    for r in got:
        best, best_j = expected[r.i]
        assert r.mp_dist == pytest.approx(best, abs=1e-4), r.i
        # allow near-ties in the float twin: the neighbor must be AT the
        # minimum distance even if the twin's argmin differed in noise
        dj = float(np.sqrt(((z[r.i - 1] - z[r.nn_idx - 1]) ** 2).sum()))
        assert dj == pytest.approx(best, abs=1e-4), (r.i, r.nn_idx)


def test_avg_path_length_matches_python_bfs(spark, sf_dir, duck):
    adj = _interaction_edges_py(duck)
    sources = sorted(adj)[:BETW_N_SOURCES]
    total, n_pairs, ecc = 0, 0, 0
    for s in sources:
        dist = {s: 0}
        frontier = [s]
        for hop in range(1, BETW_MAX_HOPS + 1):
            nxt = []
            for v in frontier:
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = hop
                        nxt.append(w)
            if not nxt:
                break
            frontier = nxt
        for d in dist.values():
            if d > 0:
                total += d
                n_pairs += 1
                ecc = max(ecc, d)
    from go_batch_processor_spark.operators.graph import graph_avg_path_length

    row = graph_avg_path_length(spark, sf_dir).collect()[0]
    assert row.n_pairs == n_pairs and row.sum_d == total
    assert row.eccentricity_max == ecc
    assert row.avg_path_len == pytest.approx(round(total / n_pairs, 6), abs=0.0)


def test_matrix_profile_join_matches_bruteforce(spark, sf_dir, duck):
    """AB-join re-derived densely: B-half subsequences against A-half
    subsequences only, no exclusion zone."""
    from go_batch_processor_spark.operators.timeseries import (
        MP_WINDOW_H,
        timeseries_matrix_profile_join,
    )

    cents = np.array(
        [
            r[0]
            for r in duck.sql(
                """SELECT cents FROM (
                     SELECT date_trunc('hour', ts) AS h,
                            sum(CAST(round(value * 100) AS BIGINT)) AS cents
                     FROM events GROUP BY 1) ORDER BY h"""
            ).fetchall()
        ],
        dtype=np.float64,
    )
    m = MP_WINDOW_H
    n = len(cents)
    na = n // 2
    subs = np.lib.stride_tricks.sliding_window_view(cents, m)
    z = (subs - subs.mean(axis=1, keepdims=True)) / subs.std(
        axis=1, keepdims=True
    )
    a_idx = range(0, na - m + 1)  # 0-based starts of A subsequences
    expected = {}
    for j0 in range(na, n - m + 1):  # 0-based starts of B subsequences
        best = np.inf
        for i0 in a_idx:
            d = float(np.sqrt(((z[j0] - z[i0]) ** 2).sum()))
            best = min(best, d)
        expected[j0 + 1] = best
    got = timeseries_matrix_profile_join(spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r in got:
        assert r.mpj_dist == pytest.approx(expected[r.j], abs=1e-4), r.j
        dj = float(np.sqrt(((z[r.j - 1] - z[r.nn_i - 1]) ** 2).sum()))
        assert dj == pytest.approx(expected[r.j], abs=1e-4)
        assert r.nn_i <= na - m + 1


def test_motif_topk_matches_bruteforce(spark, sf_dir, duck):
    from go_batch_processor_spark.operators.timeseries import (
        MP_EXCL_H,
        MP_WINDOW_H,
        MOTIF_TOP_K,
        timeseries_motif_topk,
    )

    cents = np.array(
        [
            r[0]
            for r in duck.sql(
                """SELECT cents FROM (
                     SELECT date_trunc('hour', ts) AS h,
                            sum(CAST(round(value * 100) AS BIGINT)) AS cents
                     FROM events GROUP BY 1) ORDER BY h"""
            ).fetchall()
        ],
        dtype=np.float64,
    )
    m = MP_WINDOW_H
    n_sub = len(cents) - m + 1
    subs = np.lib.stride_tricks.sliding_window_view(cents, m)
    z = (subs - subs.mean(axis=1, keepdims=True)) / subs.std(
        axis=1, keepdims=True
    )
    pairs = []
    for i in range(n_sub):
        for j in range(i + MP_EXCL_H, n_sub):
            d = float(np.sqrt(((z[i] - z[j]) ** 2).sum()))
            pairs.append((d, i + 1, j + 1))
    pairs.sort()
    top = pairs[:MOTIF_TOP_K]
    got = sorted(
        [(r.i, r.j, r.dist) for r in timeseries_motif_topk(spark, sf_dir).collect()]
    )
    assert len(got) == MOTIF_TOP_K
    exp = sorted([(i, j, d) for d, i, j in top])
    for (gi, gj, gd), (ei, ej, ed) in zip(got, exp):
        assert (gi, gj) == (ei, ej)
        assert gd == pytest.approx(ed, abs=1e-4)


def test_holt_grid_sub2_point_series_yields_zero_rows(spark, tmp_path, duck):
    """Degenerate guard parity (r10 code-review find): with < 2 daily
    points the oracle's recursive seed (rn=1 x rn=2) is empty, and the
    Spark fold must also emit 0 rows instead of 9 NULL-trend rows."""
    import pandas as pd

    from go_batch_processor_spark.operators.timeseries import (
        timeseries_holt_grid_search,
    )
    from go_batch_processor_spark.registry import REGISTRY

    df = pd.DataFrame(
        {
            "ts": [pd.Timestamp("2024-01-01 03:00"), pd.Timestamp("2024-01-01 17:00")],
            "value": [1.0, 2.0],
            "event_id": [1, 2],
            "user_id": [1, 1],
            "event_type": ["view", "view"],
            "props": ["{}", "{}"],
        }
    )
    d = tmp_path / "sub2"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    assert timeseries_holt_grid_search(spark, str(d)).count() == 0
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
    )
    assert len(con.sql(REGISTRY["timeseries_holt_grid_search"].oracle).df()) == 0


def test_platt_scaling_matches_numpy_newton(spark, sf_dir, duck):
    """(A, B, brier) pinned against a numpy Newton twin on the same rows
    with identical Platt regularized targets, plus the calibration
    sanity avg(p) ~ base rate."""
    from go_batch_processor_spark.operators.ml import (
        PLATT_ITERS,
        ml_platt_scaling,
    )

    df = duck.sql(
        "SELECT l_quantity / 50.0 AS s,"
        " CAST(l_returnflag = 'R' AS DOUBLE) AS y FROM lineitem"
    ).df()
    s = df.s.to_numpy()
    y = df.y.to_numpy()
    n_pos = y.sum()
    n_neg = len(y) - n_pos
    t = np.where(y == 1.0, (n_pos + 1) / (n_pos + 2), 1 / (n_neg + 2))
    a, b = 0.0, 0.0
    for _ in range(PLATT_ITERS):
        p = 1.0 / (1.0 + np.exp(-(a * s + b)))
        w = p * (1 - p)
        g = np.array([(s * (t - p)).sum(), (t - p).sum()])
        h = np.array(
            [[(w * s * s).sum(), (w * s).sum()], [(w * s).sum(), w.sum()]]
        )
        step = np.linalg.solve(h, g)
        a, b = a + step[0], b + step[1]
    p = 1.0 / (1.0 + np.exp(-(a * s + b)))
    brier = ((p - y) ** 2).mean()
    got = {r.term: r.value for r in ml_platt_scaling(spark, sf_dir).collect()}
    assert got["slope_a"] == pytest.approx(a, abs=1e-4)
    assert got["intercept_b"] == pytest.approx(b, abs=1e-4)
    assert got["brier"] == pytest.approx(brier, abs=1e-6)
    assert got["base_rate"] == pytest.approx(y.mean(), abs=1e-6)
    # Platt targets shrink the fit toward the prior slightly; calibration
    # should still land within a point of the base rate on this data
    assert abs(got["avg_calibrated_p"] - got["base_rate"]) < 0.01
