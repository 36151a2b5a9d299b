"""Property-based check of the lag-gap-cumsum sessionizer against a direct
single-threaded reference implementation."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

GAP_S = 30 * 60


@st.composite
def event_times(draw):
    n_users = draw(st.integers(1, 3))
    rows = []
    eid = 0
    for u in range(n_users):
        n = draw(st.integers(1, 15))
        t = 0
        for _ in range(n):
            t += draw(st.integers(0, 4000))  # gaps straddle the 1800s cutoff
            rows.append((eid, u, t))
            eid += 1
    return rows


def reference_sessions(rows):
    """Single-threaded ground truth: sessions per user with GAP_S cutoff."""
    out = {}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for eid, u, t in rows:
        by_user.setdefault(u, []).append((t, eid))
    for u, evs in by_user.items():
        evs.sort()
        sid = 0
        last = None
        counts: dict[int, int] = {}
        for t, _ in evs:
            if last is None or t - last > GAP_S:
                sid += 1
            counts[sid] = counts.get(sid, 0) + 1
            last = t
        out[u] = sorted(counts.values())
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(event_times())
def test_sessionize_matches_reference(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "t"])
    df = spark.createDataFrame(
        pdf, schema="event_id long, user_id long, t long"
    ).select("event_id", "user_id", F.timestamp_seconds("t").alias("ts"),
             F.lit(1.0).alias("value"))

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_flag = F.when(
        (F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")) <= GAP_S, 0
    ).otherwise(1)
    sess = df.select(
        "user_id",
        F.sum(gap_flag)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    got_rows = (
        sess.groupBy("user_id", "session_id").count().collect()
    )
    got: dict[int, list[int]] = {}
    for r in got_rows:
        got.setdefault(r.user_id, []).append(r["count"])
    got = {u: sorted(v) for u, v in got.items()}
    assert got == reference_sessions(rows)
