"""Round-13 property layer: interval-join family ALGEBRA (VERDICT r12
item 8).

The inner/left/full interval joins share one body
(joins._interval_events_join) so the window, tie semantics, and exact
micros lag can never drift between them — but nothing froze the family's
NULL-extension ALGEBRA itself. These properties do, over random event
soups straddling the 12 h boundary, on BOTH engines:

  1. containment:  inner ⊆ left ⊆ full   (as row multisets)
  2. left  == inner ∪ {(click, NULL) : click has no in-window purchase}
  3. full  == left  ∪ {(NULL, purchase) : purchase has no in-window click}
  4. Spark == DuckDB on every draw, for each of the three variants

so a future edit of the shared body (or of one variant's how=) that
shifts which side null-extends, or drops the boundary row at exactly
click_ts + 12 h, fails here before it can reach a driver sample.
"""
from __future__ import annotations

import collections
import os
import tempfile

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from go_batch_processor_spark.operators.joins import _interval_events_join

HOURS_12_US = 12 * 3600 * 1_000_000
BASE_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, arbitrary anchor

_ORACLE = {
    "inner": "JOIN",
    "left_outer": "LEFT JOIN",
    "full_outer": "FULL JOIN",
}


@st.composite
def event_soup(draw):
    """Random (event_id, user_id, type, ts_offset_us) soup: few users so
    multi-match fanout happens, offsets spanning ~2x the 12 h window so
    in/out-of-window pairs both occur, plus exact-boundary offsets."""
    n = draw(st.integers(2, 24))
    offsets = st.one_of(
        st.integers(0, 2 * HOURS_12_US),
        st.sampled_from([0, HOURS_12_US, HOURS_12_US + 1, 2 * HOURS_12_US]),
    )
    return [
        (
            i,
            draw(st.integers(0, 2)),
            draw(st.sampled_from(["click", "purchase", "view"])),
            draw(offsets),
        )
        for i in range(n)
    ]


def _soup_pdf(soup) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "event_id": [e[0] for e in soup],
            "ts": pd.to_datetime(
                [BASE_US + e[3] for e in soup], unit="us"
            ),
            "user_id": [e[1] for e in soup],
            "event_type": [e[2] for e in soup],
            "value": [0.0] * len(soup),
            "props": ["{}"] * len(soup),
        }
    )


def _multiset(df: pd.DataFrame) -> collections.Counter:
    none = lambda v: None if pd.isna(v) else int(v)  # noqa: E731
    return collections.Counter(
        (none(r.user_id), none(r.click_id), none(r.purchase_id), none(r.lag_us))
        for r in df.itertuples()
    )


def _duck_variant(pdf: pd.DataFrame, how: str) -> collections.Counter:
    con = duckdb.connect()
    con.register("ev_src", pdf)
    got = con.sql(
        f"""
        SELECT coalesce(c.user_id, p.user_id) AS user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id,
               date_diff('microsecond', c.ts, p.ts) AS lag_us
        FROM (SELECT * FROM ev_src WHERE event_type = 'click') c
        {_ORACLE[how]} (SELECT * FROM ev_src WHERE event_type = 'purchase') p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 12 HOUR
        """
    ).df()
    con.close()
    return _multiset(got)


@settings(
    max_examples=10,  # each example runs 3 Spark joins; keep the budget tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(event_soup())
@example(  # exact boundary: purchase at click_ts + 12 h matches (<=)
    [(0, 0, "click", 0), (1, 0, "purchase", HOURS_12_US),
     (2, 0, "purchase", HOURS_12_US + 1), (3, 1, "purchase", 0)]
)
@example([(0, 0, "view", 0)])  # no clicks, no purchases at all
def test_interval_family_algebra_both_engines(spark, case):
    soup = case
    pdf = _soup_pdf(soup)
    with tempfile.TemporaryDirectory() as td:
        pdf.to_parquet(os.path.join(td, "events.parquet"))
        got = {}
        for how in ("inner", "left_outer", "full_outer"):
            sdf = _interval_events_join(spark, td, how).toPandas()
            got[how] = _multiset(sdf)
            assert got[how] == _duck_variant(pdf, how), (
                f"engines disagree on {how}: {soup}"
            )

    inner, left, full = got["inner"], got["left_outer"], got["full_outer"]
    # 1. containment as multisets
    assert not inner - left, f"inner ⊄ left: {soup}"
    assert not left - full, f"left ⊄ full: {soup}"

    # 2. left = inner ∪ (unmatched clicks × NULL)
    matched_clicks = {k[1] for k in inner}
    clicks = {(e[0], e[1]) for e in soup if e[2] == "click"}
    null_left = collections.Counter(
        (u, cid, None, None) for cid, u in clicks if cid not in matched_clicks
    )
    assert left == inner + null_left, f"left ≠ inner ∪ NULL-clicks: {soup}"

    # 3. full = left ∪ (NULL × orphan purchases)
    matched_purch = {k[2] for k in inner}
    purchases = {(e[0], e[1]) for e in soup if e[2] == "purchase"}
    null_right = collections.Counter(
        (u, None, pid, None) for pid, u in purchases if pid not in matched_purch
    )
    assert full == left + null_right, f"full ≠ left ∪ orphan-purchases: {soup}"


@pytest.mark.parametrize("how", ["inner", "left_outer", "full_outer"])
def test_interval_family_plan_is_single_equi_join(spark, sf_dir, how):
    """The family's scale contract: the range predicate must ride the
    user_id equi join as a residual — the physical plan contains exactly
    one join node and it is NOT a cartesian/broadcast-nested-loop
    product (which is what this join degrades to if the equi key is ever
    dropped from the condition)."""
    plan = _interval_events_join(spark, sf_dir, how)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # any EQUI join is acceptable (broadcast-hash at tiny SF, sort-merge /
    # shuffled-hash at scale) — the contract is the equi key survives
    n_joins = sum(
        plan.count(j)
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert n_joins == 1, plan


# -- Misra-Gries merged-summary invariants (streaming heavy hitters) --------
#
# JVM-free: the streaming sketch's per-batch rule is merge-exact-counts-
# then-one-tracked-reduction (_mg_reduce_tracked). Over ANY batch split
# of ANY key sequence the classic MG invariants must hold — these are
# what the stream-side superset/recount contract rests on.


@st.composite
def batched_keys(draw):
    n_batches = draw(st.integers(1, 6))
    return [
        draw(st.lists(st.integers(0, 30), min_size=0, max_size=60))
        for _ in range(n_batches)
    ]


@settings(max_examples=300, deadline=None)
@given(batched_keys(), st.integers(1, 8))
def test_mg_merged_summary_bounds_and_survival(batches, budget):
    from collections import Counter

    from go_batch_processor_spark.streaming.stateful import _mg_reduce_tracked

    counters: dict = {}
    decr = 0
    for batch in batches:
        for k, c in Counter(batch).items():
            counters[k] = counters.get(k, 0) + c
        counters, cut = _mg_reduce_tracked(counters, budget)
        decr += cut
    true = Counter(k for b in batches for k in b)
    n = sum(true.values())
    assert len(counters) <= budget
    # decrement bound: every reduction subtracts its cut from >= budget+1
    # counters, so (budget+1) * decr <= n
    assert decr * (budget + 1) <= n
    for k, c in counters.items():
        assert c <= true[k] <= c + decr
    # survival: any key with true count > decr is present
    for k, c in true.items():
        if c > decr:
            assert k in counters, (k, c, decr, dict(counters))


# -- Vectorized funnel fold == sequential _funnel_update rules ---------------
#
# _funnel_fold_bucket (the bucketed/vectorized funnel's core) must replay
# stateful._funnel_update's per-row rules EXACTLY: lv = running max of
# view stamps; a click updates (lc, lcv) only when t >= lc; a purchase
# converts when 0 <= t-lc <= W and lc-lcv <= W; micro-ts ties break by
# event_id; end-of-batch state = the last effective stamps; purchases-only
# users hold no state. Random soups include equal-ts collisions, rows
# PREDATING the incoming state (the late-data divergence rules), and
# missing stages.


def _funnel_sequential(rows, state):
    """Straight transliteration of _funnel_update's loop over one batch
    (rows already (user, eid, t_us, type)), -1 sentinels like the fold."""
    from go_batch_processor_spark.streaming.stateful import FUNNEL_WINDOW_US

    out = []
    st = dict(state)
    for u, eid, t, et in sorted(rows, key=lambda r: (r[2], r[1])):
        lv, lc, lcv = st.get(u, (-1, -1, -1))
        if et == "view":
            lv = max(lv, t)
        elif et == "click":
            if lc < 0 or t >= lc:
                lc, lcv = t, lv
        elif et == "purchase":
            if (
                lc >= 0
                and 0 <= t - lc <= FUNNEL_WINDOW_US
                and lcv >= 0
                and lc - lcv <= FUNNEL_WINDOW_US
            ):
                out.append((u, eid, t, lc, lcv))
        if lv < 0 and lc < 0:
            st.pop(u, None)
        else:
            st[u] = (lv, lc, lcv)
    return out, st


@st.composite
def funnel_batch(draw):
    n = draw(st.integers(0, 40))
    h12 = 12 * 3600 * 1_000_000
    rows = [
        (
            draw(st.integers(0, 3)),            # user
            i,                                   # event_id
            draw(st.integers(0, 4 * h12)),       # t (spans > window)
            draw(st.sampled_from(["view", "click", "purchase"])),
        )
        for i in range(n)
    ]
    state = {}
    for u in range(4):
        if draw(st.booleans()):
            lv = draw(st.one_of(st.just(-1), st.integers(0, 3 * h12)))
            lc = draw(st.one_of(st.just(-1), st.integers(0, 3 * h12)))
            lcv = (
                -1
                if lc < 0
                else draw(st.one_of(st.just(-1), st.integers(0, lc)))
            )
            if lv >= 0 or lc >= 0:
                state[u] = (lv, lc, lcv)
    return rows, state


@settings(max_examples=400, deadline=None)
@given(funnel_batch())
def test_funnel_fold_bucket_matches_sequential_rules(case):
    from go_batch_processor_spark.streaming.stateful import _funnel_fold_bucket

    rows, state = case
    want_out, want_state = _funnel_sequential(rows, state)
    pdf = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "event_id": [r[1] for r in rows],
            "ts": pd.to_datetime([r[2] for r in rows], unit="us"),
            "event_type": [r[3] for r in rows],
        }
    )
    got_out, got_state = _funnel_fold_bucket(pdf, state)
    assert got_out == want_out, (rows, state)
    assert got_state == want_state, (rows, state)


# -- Vectorized attribution fold == sequential _attribution_update rules -----


def _attribution_sequential(rows, state):
    """Transliteration of _attribution_update's loop with the encoded
    state convention (enc = ts*2 + is_click, -1 for none)."""
    from go_batch_processor_spark.streaming.stateful import ATTRIB_WINDOW_US

    out = []
    st = dict(state)
    for u, eid, t, et in sorted(rows, key=lambda r: (r[2], r[1])):
        e = st.get(u, -1)
        s_ts, s_click = (e >> 1, e & 1) if e >= 0 else (-1, 0)
        if et in ("view", "click"):
            if s_ts < 0 or t > s_ts:
                s_ts, s_click = t, int(et == "click")
            elif t == s_ts:
                # min(event_type): 'click' < 'view'
                s_click = max(s_click, int(et == "click"))
            st[u] = s_ts * 2 + s_click
        elif et == "purchase":
            if s_ts >= 0 and 0 <= t - s_ts <= ATTRIB_WINDOW_US:
                out.append(
                    (u, eid, t, s_ts, "click" if s_click else "view")
                )
    return out, st


@settings(max_examples=400, deadline=None)
@given(funnel_batch())
def test_attribution_fold_bucket_matches_sequential_rules(case):
    from go_batch_processor_spark.streaming.stateful import (
        _attribution_fold_bucket,
    )

    rows, fstate = case
    # reuse the funnel soup; encode its (lv, lc, lcv) states into the
    # attribution convention: latest touch = max(view enc, click enc)
    state = {}
    for u, (lv, lc, _lcv) in fstate.items():
        e = max(lv * 2 if lv >= 0 else -1, lc * 2 + 1 if lc >= 0 else -1)
        if e >= 0:
            state[u] = e
    want_out, want_state = _attribution_sequential(rows, state)
    pdf = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "event_id": [r[1] for r in rows],
            "ts": pd.to_datetime([r[2] for r in rows], unit="us"),
            "event_type": [r[3] for r in rows],
        }
    )
    got_out, got_state = _attribution_fold_bucket(pdf, state)
    assert got_out == want_out, (rows, state)
    assert got_state == want_state, (rows, state)


# -- Scaled-floor grain is cross-engine deterministic at half-boundaries -----
#
# r13 x10-sweep find: when a grained output value is an EXACT decimal
# half (z = 3.85225 from 4-decimal x 2-decimal / 2-decimal inputs), the
# two engines disagree on round(double, 4) of the SAME double — Spark
# rounds the exact binary expansion (3.85224999… -> 3.8522), DuckDB
# rounds the scaled product (-> 3.8523). The shared scaled-floor grain
# floor(x*1e4 + 0.5)/1e4 uses only IEEE-exact primitives, so both
# engines agree at every input, boundary or not. Pinned on the two
# operators the sweep caught (analytics_robust_zscore_mad,
# feature_target_encoding) via their literal failing inputs plus a
# hypothesis soup of exact decimal halves.


def _grain_pair(spark, xs: list[float]) -> tuple[list, list]:
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame([(x,) for x in xs], "x double")
    got_spark = [
        r.g
        for r in sdf.select(
            (F.floor(F.col("x") * F.lit(10000.0) + F.lit(0.5)).cast("double")
             / F.lit(10000.0)).alias("g")
        ).collect()
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": xs}))
    got_duck = [
        r[0]
        for r in con.sql(
            "SELECT floor(x * 10000.0 + 0.5) / 10000.0 FROM t"
        ).fetchall()
    ]
    con.close()
    return got_spark, got_duck


def test_scaled_floor_grain_agrees_on_caught_boundary_rows(spark):
    # the literal values the r13 x10 sweep caught flipping under
    # round(_, 4): robust z 0.6745*(172.59-34.72)/24.14 = 3.85225 and
    # the two LOO means that land on ...5 at the 4th decimal
    xs = [
        0.6745 * (172.59 - 34.72) / 24.14,
        308258.87625,
        265603.25375,
        -0.6745 * (172.59 - 34.72) / 24.14,
    ]
    got_spark, got_duck = _grain_pair(spark, xs)
    assert got_spark == got_duck, list(zip(xs, got_spark, got_duck))


@settings(
    max_examples=60,  # each example is a Spark job; boundary density is
    deadline=None,  # what matters, not example count
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        # v/20000 enumerates every half-step of the 1e-4 grain —
        # boundary cases by construction, plus sign
        st.integers(min_value=-4 * 10**9, max_value=4 * 10**9).map(
            lambda v: v / 20000.0
        ),
        min_size=1,
        max_size=40,
    )
)
def test_scaled_floor_grain_agrees_on_half_step_soup(spark, case):
    got_spark, got_duck = _grain_pair(spark, case)
    assert got_spark == got_duck, list(zip(case, got_spark, got_duck))
