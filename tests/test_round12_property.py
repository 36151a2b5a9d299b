"""Round-12 property layer: discrete-choice edges of the r11/r12
oracle conversions (VERDICT r11 item 7 + ADVICE item 3).

Three discrete-choice machines got SQL twins on the argument that every
branch they take is decided by EXACT integers (or fixed IEEE expressions
over exact integers), so the choices replay identically across engines:

- ml_isotonic_pava: PAVA merges decided by integer cross-multiplication;
  the oracle computes the SAME fit via the minimax identity
  fit_i = max_{j<=i} min_{k>=i} mean(j..k). Random monotone-violating
  shapes here pin oracle == an independent exact-int PAVA on every draw
  (different ALGORITHMS, same unique L2 projection).
- ml_decision_tree_depth2: tuple-argmin (gini, feature, threshold) over
  Gini doubles built from exact integer prefix counts. Tie-heavy random
  grids + constructed exact ties pin the oracle's ORDER BY ... LIMIT 1
  against a driver-mirroring Python twin, including the cross-feature
  string tie-break and the within-feature lowest-threshold tie-break.
- text_bpe_train_merges (converted THIS round): merge argmax over exact
  BIGINT pair counts, unrolled as MATERIALIZED CTEs. The early-break
  path (best count < 2) can never fire on the rich fixture corpus, so a
  synthetic corpus pins Spark-vs-oracle equality through termination.

Plus the ADVICE-3 pin: degenerate tree inputs (a node with no valid
split) FAIL LOUD on the Spark side by contract — the oracle's empty
best CTE would silently empty the leaves, which is non-comparable.
"""
from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest
from hypothesis import assume, example, given, settings, strategies as st

from go_batch_processor_spark.operators.ml import _round6_floor
from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _con_with_lineitem(df: pd.DataFrame) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register("li_src", df)
    con.sql("CREATE VIEW lineitem AS SELECT * FROM li_src")
    return con


# -- ml_isotonic_pava: oracle (minimax identity) vs exact-int PAVA ----------


def _pava_twin(points: list[tuple[float, int, int]]) -> list[float]:
    """Independent exact-integer PAVA over (x-sorted) (x, cents, w)
    points — the driver's block-merge algorithm with integer
    cross-multiplication violation tests and the shared floor-round."""
    blocks: list[list[int]] = []  # [sum_cents, sum_w, n_points]
    for _, c, w in points:
        blocks.append([c, w, 1])
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] > blocks[-1][0] * blocks[-2][1]
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
            blocks[-1][2] += b[2]
    out: list[float] = []
    for c, w, cnt in blocks:
        m = (float(c) / float(w)) / 100.0
        out.extend([math.floor(m * 1000000.0 + 0.5) / 1000000.0] * cnt)
    return out


def _isotonic_rows(groups: dict[str, list[tuple[int, list[int]]]]):
    """Expand {group: [(x, [per-row cents...])]} into raw lineitem rows."""
    rows = []
    for g, pts in groups.items():
        for x, cents in pts:
            for c in cents:
                rows.append((g, float(x), c / 100.0))
    return pd.DataFrame(
        rows, columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )


@settings(max_examples=40, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(1, 20),  # x
            st.lists(st.integers(1, 100000), min_size=1, max_size=4),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@example(pts=[(1, [500]), (2, [400]), (3, [300]), (4, [200])])  # full pool
@example(pts=[(1, [100]), (2, [100, 100]), (3, [100])])  # all-equal means
@example(pts=[(5, [123])])  # single point
def test_isotonic_oracle_matches_exact_pava(pts):
    """The minimax-identity SQL fit equals block-merge PAVA bit-for-bit
    on random (incl. monotone-violating) weighted shapes: the L2
    isotonic projection is unique and both sides divide the same exact
    integer block sums."""
    df = _isotonic_rows({"A": pts})
    con = _con_with_lineitem(df)
    got = (
        con.sql(REGISTRY["ml_isotonic_pava"].oracle)
        .df()
        .sort_values("l_quantity")
        .reset_index(drop=True)
    )
    spts = sorted((x, sum(cents), len(cents)) for x, cents in pts)
    want = _pava_twin([(float(x), c, w) for x, c, w in spts])
    assert list(got["l_quantity"]) == [float(x) for x, _, _ in spts]
    assert list(got["fitted"]) == want  # bit-exact, no tolerance
    assert list(got["n"]) == [w for _, _, w in spts]
    # and the fit is actually isotonic
    assert all(a <= b for a, b in zip(want, want[1:]))


@settings(max_examples=15, deadline=None)
@given(
    pts_a=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 9999)),
        min_size=1,
        max_size=5,
        unique_by=lambda t: t[0],
    ),
    pts_b=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 9999)),
        min_size=1,
        max_size=5,
        unique_by=lambda t: t[0],
    ),
)
def test_isotonic_oracle_groups_independent(pts_a, pts_b):
    """Multi-group frames fit each PARTITION BY group independently —
    group A's fit never bleeds into group B's."""
    df = _isotonic_rows(
        {
            "A": [(x, [c]) for x, c in pts_a],
            "B": [(x, [c]) for x, c in pts_b],
        }
    )
    con = _con_with_lineitem(df)
    got = con.sql(REGISTRY["ml_isotonic_pava"].oracle).df()
    for g, pts in (("A", pts_a), ("B", pts_b)):
        sub = (
            got[got["l_returnflag"] == g]
            .sort_values("l_quantity")
            .reset_index(drop=True)
        )
        spts = sorted((float(x), c, 1) for x, c in pts)
        assert list(sub["fitted"]) == _pava_twin(spts)


# -- ml_decision_tree_depth2: tie-heavy argmin parity ------------------------

_TREE_COLS = ["l_quantity", "l_discount", "l_tax"]


def _tree_twin(rows: list[tuple[int, int, int, int]]):
    """Driver-mirroring depth-2 CART twin over raw (u1, u2, u3, y) unit
    rows (u = 100x the feature value): same value_tables-from-the-full-
    table convention, same Gini expression tree, same (g, f, v)
    tuple-argmin. Returns the 7 output rows or None if any node lacks a
    valid split (the fail-loud contract's trigger)."""

    def value_tables(gate):
        out = {}
        for k, f in enumerate(_TREE_COLS):
            agg: dict[int, list[int]] = {}
            for r in rows:
                agg.setdefault(r[k], [0, 0])
            for r in rows:
                if gate(r):
                    agg[r[k]][0] += 1
                    agg[r[k]][1] += r[3]
            out[f] = [
                (u / 100.0, n, p) for u, (n, p) in sorted(agg.items())
            ]
        return out

    def best_split(tables):
        best = None
        for f in _TREE_COLS:
            vals = tables[f]
            tot_n = sum(n for _, n, _ in vals)
            tot_p = sum(p for _, _, p in vals)
            if tot_n == 0:
                continue
            ln = lp = 0
            for v, n, p in vals[:-1]:
                ln += n
                lp += p
                rn, rp = tot_n - ln, tot_p - lp
                if ln == 0 or rn == 0:
                    continue
                gl = (
                    1.0
                    - (lp / ln) * (lp / ln)
                    - ((ln - lp) / ln) * ((ln - lp) / ln)
                )
                gr = (
                    1.0
                    - (rp / rn) * (rp / rn)
                    - ((rn - rp) / rn) * ((rn - rp) / rn)
                )
                g = (ln * gl + rn * gr) / tot_n
                cand = (g, f, v)
                if best is None or cand < best:
                    best = cand
        return best

    root = best_split(value_tables(lambda r: True))
    if root is None:
        return None
    g0, f0, t0 = root
    i0 = _TREE_COLS.index(f0)

    def left(r):
        return r[i0] / 100.0 <= t0

    s1 = best_split(value_tables(left))
    s2 = best_split(value_tables(lambda r: not left(r)))
    if s1 is None or s2 is None:
        return None
    out = [
        (0, "split", f0, _round6_floor(t0), None, _round6_floor(g0)),
        (1, "split", s1[1], _round6_floor(s1[2]), None, _round6_floor(s1[0])),
        (2, "split", s2[1], _round6_floor(s2[2]), None, _round6_floor(s2[0])),
    ]
    i1, t1 = _TREE_COLS.index(s1[1]), s1[2]
    i2, t2 = _TREE_COLS.index(s2[1]), s2[2]
    leaves = {3: [0, 0], 4: [0, 0], 5: [0, 0], 6: [0, 0]}
    for r in rows:
        if left(r):
            leaf = 3 if r[i1] / 100.0 <= t1 else 4
        else:
            leaf = 5 if r[i2] / 100.0 <= t2 else 6
        leaves[leaf][0] += 1
        leaves[leaf][1] += r[3]
    for leaf in (3, 4, 5, 6):
        n, p = leaves[leaf]
        out.append(
            (
                leaf,
                "leaf",
                None,
                None,
                "R" if 2 * p > n else "other",
                _round6_floor(p / n) if n else None,
            )
        )
    return out


def _tree_lineitem(rows: list[tuple[int, int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "l_quantity": [u1 / 100.0 for u1, _, _, _ in rows],
            "l_discount": [u2 / 100.0 for _, u2, _, _ in rows],
            "l_tax": [u3 / 100.0 for _, _, u3, _ in rows],
            "l_returnflag": ["R" if y else "N" for _, _, _, y in rows],
        }
    )


def _tree_oracle_rows(rows):
    con = _con_with_lineitem(_tree_lineitem(rows))
    got = con.sql(REGISTRY["ml_decision_tree_depth2"].oracle).df()
    got = got.sort_values("node").reset_index(drop=True)
    return [
        (
            int(r.node),
            r.kind,
            None if pd.isna(r.feature) else r.feature,
            None if pd.isna(r.threshold) else float(r.threshold),
            None if pd.isna(r.prediction) else r.prediction,
            None if pd.isna(r.score) else float(r.score),
        )
        for r in got.itertuples()
    ]


# tiny grids with repeats => dense exact Gini ties
_cell = st.tuples(
    st.integers(1, 3), st.integers(1, 3), st.integers(1, 2), st.integers(0, 1)
)


# every candidate Gini in these 8-row shapes is an exact dyadic 0.5
# (p=1 of n=2 per value; anti-correlated u3), so ALL root candidates tie
# bit-exactly — see the deterministic tie tests below
_ALL_TIED = [(1, 1, 1, 0), (1, 1, 2, 1), (2, 1, 2, 0), (2, 1, 1, 1),
             (3, 1, 1, 0), (3, 1, 2, 1), (4, 1, 2, 0), (4, 1, 1, 1)]
_DUP_FEAT = [(1, 1, 1, 0), (1, 1, 2, 1), (2, 2, 2, 0), (2, 2, 1, 1),
             (3, 3, 1, 0), (3, 3, 2, 1), (4, 4, 2, 0), (4, 4, 1, 1)]


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(_cell, min_size=4, max_size=24))
@example(rows=_ALL_TIED)
@example(rows=_DUP_FEAT)
def test_tree_oracle_matches_twin_tie_heavy(rows):
    """ORDER BY (g, feature, thr) LIMIT 1 == the driver's tuple-argmin on
    tie-dense grids: identical Gini doubles (exact-int prefix counts
    through one shared expression tree), identical tie-breaks."""
    want = _tree_twin(rows)
    assume(want is not None)  # degenerate draws are the fail-loud test's job
    got = _tree_oracle_rows(rows)
    assert got == want


def test_tree_cross_feature_tie_breaks_by_feature_name():
    """Constructed EXACT tie (_DUP_FEAT): l_discount duplicates
    l_quantity and every candidate Gini is a dyadic 0.5, so all
    candidates across u1/u2/u3 tie bit-exactly; the winner must be
    l_discount at its lowest threshold on BOTH engines (binary
    collation == Python str compare, 'l_discount' < 'l_quantity' <
    'l_tax')."""
    want = _tree_twin(_DUP_FEAT)
    assert want is not None
    got = _tree_oracle_rows(_DUP_FEAT)
    assert got == want
    assert (got[0][2], got[0][3]) == ("l_discount", 0.01)


def test_tree_threshold_tie_breaks_low():
    """Constructed within-feature tie (_ALL_TIED): every u1 threshold
    (and u3's single candidate) scores a bit-exact dyadic 0.5 — all
    intermediate IEEE values are dyadic rationals, so the ties are TRUE
    ties, not 1-ulp near-misses. The argmin must take l_quantity (ASCII
    least among candidates; l_discount is single-valued => no
    candidate) at its LOWEST tied threshold on both engines."""
    want = _tree_twin(_ALL_TIED)
    assert want is not None
    got = _tree_oracle_rows(_ALL_TIED)
    assert got == want
    assert (got[0][2], got[0][3]) == ("l_quantity", 0.01)
    assert got[0][5] == 0.5  # the tied dyadic Gini


def _write_lineitem_parquet(tmp_path, pdf: pd.DataFrame) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "fix")
    os.makedirs(f"{d}/lineitem.parquet", exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(pdf), f"{d}/lineitem.parquet/part-0.parquet"
    )
    return d


def test_tree_degenerate_no_split_fails_loud(spark, tmp_path):
    """ADVICE r11 item 3 pin: a child node with no valid split raises a
    loud ValueError on the Spark side (the oracle's empty best CTE would
    silently empty the leaves — non-comparable, so crashing IS the
    contract). Left child (q<=1) is single-valued in every feature."""
    rows = (
        [(100, 1, 1, 0)] * 2
        + [(200, 1, 1, 0), (200, 1, 1, 1), (300, 1, 1, 0), (300, 1, 1, 1)]
    )
    pdf = _tree_lineitem(rows)
    pdf["l_extendedprice"] = 100.0  # schema completeness
    d = _write_lineitem_parquet(tmp_path, pdf)
    with pytest.raises(ValueError, match="no valid split at child node 1"):
        REGISTRY["ml_decision_tree_depth2"].fn(spark, d).collect()


# -- stream_sessionize: sub-second gap boundary (ADVICE r11 item 1) ----------


def _write_events_parquet(tmp_path, rows) -> str:
    """rows: [(event_id, ts_micros, user_id, value)]"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "fix")
    os.makedirs(f"{d}/events.parquet", exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["click"] * len(rows)),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        f"{d}/events.parquet/part-0.parquet",
    )
    return d


def test_sessionize_subsecond_gap_matches_oracle(spark, tmp_path):
    """ADVICE r11 item 1 pin: gaps in the open interval (1800 s, 1801 s)
    used to sessionize differently (Spark truncated to whole seconds,
    the oracle compared micros-exact intervals). Both engines must now
    split at gap > 1800.000000 s exactly."""
    t0 = 1_700_000_000_000_000  # micros
    gap_us = 1800 * 1_000_000
    rows = [
        (1, t0, 7, 1.0),
        (2, t0 + gap_us, 7, 2.0),            # exactly 1800 s: same session
        (3, t0 + 2 * gap_us + 500_000, 7, 3.0),  # 1800.5 s: NEW session
        (4, t0 + 3 * gap_us + 499_999, 7, 4.0),  # 1799.999999 s later: same
    ]
    d = _write_events_parquet(tmp_path, rows)
    spec = REGISTRY["stream_sessionize"]
    got = sorted(
        (r.user_id, r.session_id, r.n_events)
        for r in spec.fn(spark, d).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    want = sorted(
        (r[0], r[1], r[2])
        for r in con.sql(spec.oracle).fetchall()
    )
    assert got == want
    # sessions: {1,2} then {3,4} — the 1800.5 s gap splits, 1800.0 doesn't
    assert [n for _, _, n in got] == [2, 2]


# -- text_bpe_train_merges: termination parity (r12 conversion) --------------


def _write_documents_parquet(tmp_path, texts: list[str]) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "fix")
    os.makedirs(f"{d}/documents.parquet", exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{d}/documents.parquet/part-0.parquet",
    )
    return d


def _bpe_both(spark, tmp_path, texts):
    d = _write_documents_parquet(tmp_path, texts)
    spec = REGISTRY["text_bpe_train_merges"]
    got = [
        (r.step, r.pair, r.merged, r.weighted_count)
        for r in spec.fn(spark, d).orderBy("step").collect()
    ]
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = [tuple(r) for r in con.sql(spec.oracle).fetchall()]
    return got, want

def test_bpe_early_termination_matches_oracle(spark, tmp_path):
    """The unrolled oracle's HAVING >= 2 + pass-through CTE chain replays
    Spark's mid-loop break exactly: a corpus with only 2 mergeable pairs
    stops both engines after 2 merges (8 steps of no-op tail)."""
    texts = ["aa aa aa", "bc bc", "de", "fg hi"]
    got, want = _bpe_both(spark, tmp_path, texts)
    assert got == want
    assert len(got) == 2  # 'a a' (3), 'b c' (2); 'd e'/'f g'/'h i' are 1s
    assert got[0] == (0, "a a", "aa", 3)
    assert got[1] == (1, "b c", "bc", 2)


def test_noise_vs_grain_keys_stay_off_rounding_boundaries(spark, sf_dir):
    """ADVICE r11 item 4: the keys whose FINAL statistic is a one-shot
    order-dependent double sum (no contraction — cox partial_ll, logreg
    log_loss, platt log_loss, svm objective, fisher tail masses) rely on
    the ~1e-16 cell noise sitting far from a floor-round boundary. The
    guard-digit collector (ml.BOUNDARY_HITS) must stay empty when the
    driver folds run at the fixture scale — a future boundary landing
    fails HERE, loudly, instead of as an unexplained driver-gate red."""
    from go_batch_processor_spark.operators import ml as ml_mod

    ml_mod.BOUNDARY_HITS.clear()
    for key in (
        "stats_cox_ph",
        "ml_logreg_irls",
        "ml_platt_scaling",
        "ml_linear_svm_gd",
        "stats_fisher_exact",
    ):
        REGISTRY[key].fn(spark, sf_dir).collect()
    assert ml_mod.BOUNDARY_HITS == [], (
        "floor-round input(s) within GUARD_BOUNDARY_EPS of a boundary — "
        "demote the offending key to rows-only (the doctrine's escape "
        f"hatch): {ml_mod.BOUNDARY_HITS}"
    )


def test_cucconi_overflow_guard_fires_loud(spark, sf_dir, monkeypatch):
    """VERDICT r11 item 8: the DECIMAL(38,0) fourth-power ceiling is a
    CHECKED guard — with the cap lowered below the fixture's pooled N,
    the in-plan assert_true fails the job loudly (instead of the silent
    NULL a real sf~100 overflow would produce)."""
    from go_batch_processor_spark.operators import stats as stats_mod

    monkeypatch.setattr(stats_mod, "CUCCONI_N_MAX", 5)
    with pytest.raises(Exception, match="CUCCONI_N_MAX"):
        REGISTRY["stats_cucconi_test"].fn(spark, sf_dir).collect()


def test_cucconi_guard_passes_at_fixture_scale(spark, sf_dir):
    """...and with the real cap the guarded plan still produces the
    identical result (the +coalesce(assert,0) wrapper is neutral)."""
    rows = REGISTRY["stats_cucconi_test"].fn(spark, sf_dir).collect()
    assert len(rows) == 1 and rows[0]["n1"] > 0


def test_bpe_no_merge_possible_both_empty(spark, tmp_path):
    """Immediate-break corpus (every pair count 1): both sides emit the
    empty merge table with the contract schema."""
    texts = ["ab cd", "ef"]
    got, want = _bpe_both(spark, tmp_path, texts)
    assert got == want == []


# -- stream_funnel_conversion: fold-vs-SQL-semantics property ---------------


class _FakeState:
    """Minimal GroupState stand-in for driving _funnel_update directly."""

    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None
        self.removed = False
        self.timeout_ms = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def remove(self):
        self._v = None
        self.exists = False
        self.removed = True

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms

    def getCurrentWatermarkMs(self):
        return 0  # first-batch semantics: watermark unset


def _funnel_sql_twin(events, w_us):
    """Pure-Python replay of the stream_funnel_conversion SQL semantics:
    for each purchase, the latest click at-or-before it (by (ts, eid)
    order), and that click's own latest view — both within the window.
    events: [(eid, ts_us, type)]."""
    out = []
    lv = lc = lcv = None
    for eid, t, et in sorted(events, key=lambda e: (e[1], e[0])):
        if et == "view":
            lv = t
        elif et == "click":
            lc, lcv = t, lv
        elif et == "purchase":
            if (
                lc is not None
                and t - lc <= w_us
                and lcv is not None
                and lc - lcv <= w_us
            ):
                out.append((eid, t, lc, lcv, t - lcv))
    return out


_etype = st.sampled_from(["view", "click", "purchase"])


@settings(max_examples=60, deadline=None)
@given(
    seq=st.lists(
        st.tuples(st.integers(0, 50), _etype), min_size=1, max_size=40
    ),
    gaps_min=st.lists(st.integers(0, 3000), min_size=40, max_size=40),
)
def test_funnel_update_matches_sql_semantics(seq, gaps_min):
    """The bounded-state fold (_funnel_update, 3 timestamps) emits
    exactly the SQL twin's conversions on any sorted single batch —
    including window-boundary cases (gaps straddle the 24 h bound) and
    same-timestamp event_id tie-breaks."""
    from go_batch_processor_spark.streaming.stateful import (
        FUNNEL_WINDOW_US,
        _funnel_update,
    )

    t0 = 1_700_000_000_000_000
    events = []
    t = t0
    for i, ((eid_jitter, et), g) in enumerate(zip(seq, gaps_min)):
        t = t + g * 60 * 1_000_000  # 0..50 h hops: both sides of 24 h
        events.append((i * 100 + eid_jitter, t, et))
    pdf = pd.DataFrame(
        {
            "event_id": [e[0] for e in events],
            "ts": [pd.to_datetime(e[1], unit="us") for e in events],
            "event_type": [e[2] for e in events],
        }
    )
    state = _FakeState()
    got = []
    for out in _funnel_update((7,), [pdf], state):
        got.extend(
            (int(r.purchase_id),
             int(pd.Timestamp(r.purchase_ts).value) // 1000,
             int(pd.Timestamp(r.click_ts).value) // 1000,
             int(pd.Timestamp(r.view_ts).value) // 1000,
             int(r.view_to_purchase_us))
            for r in out.itertuples()
            if r.kind == "conversion"
        )
    want = [
        (eid, t, lc, lcv, lag)
        for eid, t, lc, lcv, lag in _funnel_sql_twin(events, FUNNEL_WINDOW_US)
    ]
    assert got == want
