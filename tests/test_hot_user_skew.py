"""Adversarial hot-user skew for the per-user window family (VERDICT
r12 item 2).

The funnel/sessionize/markov/lag keys partition windows by user_id, so
one hot user's entire history lands in ONE task's window frame
(acknowledged at streaming_batch.py's funnel docstring). Join/agg skew
was already tested (test_join_plans.py salted asof); this module pins
the WINDOW family:

- a skewed fixture where ONE user owns ~30% of all rows (the adversarial
  shape: per-user frames are user-history-sized),
- every window-partitioned oracled key must still match its DuckDB
  oracle bit-for-bit on that fixture (correctness is skew-invariant),
- and the documented mitigation must hold: the O(1)-state streaming
  funnel (stateful.py::_funnel_update, THREE longs per user regardless
  of history length) processes the same skewed input and equals the
  batch twin EXACTLY — no user-history-sized buffer anywhere.

Memory bound (not assertable cheaply in-suite, measured by
tools/skew_probe.py for SCALE.md's hot-key section): Spark's WindowExec
buffers each partition frame in ExternalAppendOnlyUnsafeRowArray, which
SPILLS past spark.sql.windowExec.buffer.spill.threshold (4096 rows
default) — a hot user costs a straggler task + disk, never an executor
OOM. The streaming path replaces even that with constant state.
"""
from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded
from tests.parity import assert_frames_match

_ensure_loaded()

N_ROWS = 60_000
HOT_USER = 1
HOT_SHARE = 0.3
N_COLD_USERS = 497

WINDOW_FAMILY = [
    "stream_funnel_conversion",
    "stream_sessionize",
    "stream_session_topk",
    "analytics_markov_transitions",
    "window_lag_lead",
]


def _skewed_events() -> pd.DataFrame:
    """Deterministic skewed events: user 1 owns 30% of rows; the rest
    spread over 497 cold users. Timestamps interleave hot and cold
    activity over ~35 days with sub-hour steps so sessions split and
    funnels complete; event types cycle view-heavy (60/30/10)."""
    i = pd.RangeIndex(N_ROWS).to_numpy()
    hot = (i % 10) < int(HOT_SHARE * 10)
    user = pd.Series(2 + (i * 2654435761) % N_COLD_USERS, dtype="int64")
    user[hot] = HOT_USER
    # event type from an LCG hash DECORRELATED from i % 10 (a linear
    # (i*k) % 10 is a function of i % 10, which also selects the hot
    # rows — the hot user would never purchase)
    tmod = ((i * 1103515245 + 12345) % (2**31)) % 10
    etype = pd.Series("view", index=range(N_ROWS))
    etype[(tmod == 6) | (tmod == 7) | (tmod == 8)] = "click"
    etype[tmod == 9] = "purchase"
    base = pd.Timestamp("2024-01-01 00:00:00")
    # ~50 s mean step, deterministic jitter; 60k rows ≈ 35 days
    ts = base + pd.to_timedelta(i * 50 + (i * 13) % 47, unit="s")
    return pd.DataFrame(
        {
            "event_id": i.astype("int64"),
            "ts": ts.astype("datetime64[us]"),
            "user_id": user,
            "event_type": etype,
            "value": ((i * 37) % 1000) / 10.0,
            "props": "{}",
        }
    )


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skew")
    pdf = _skewed_events()
    assert (pdf.user_id == HOT_USER).mean() == pytest.approx(HOT_SHARE, abs=0.01)
    pdf.to_parquet(d / "events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def skew_duck(skew_dir):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{skew_dir}/events.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", WINDOW_FAMILY)
def test_window_family_matches_oracle_under_skew(spark, skew_dir, skew_duck, name):
    """Correctness is skew-invariant: the per-user window keys must be
    bit-identical to their DuckDB oracles when one user owns 30% of the
    corpus (the frame-per-user shape the family's scale doctrine calls
    its worst case)."""
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, skew_dir).toPandas()
    oracle_pdf = skew_duck.sql(spec.oracle).df()
    assert len(spark_pdf), f"{name}: skew fixture must produce rows"
    assert_frames_match(spark_pdf, oracle_pdf, name=name)


def test_streaming_funnel_o1_state_handles_skewed_input(spark, skew_dir, tmp_path):
    """The documented mitigation, demonstrated under skew: the streaming
    funnel's per-user state is THREE timestamps no matter how many rows
    the hot user has — a single-batch availableNow run over the skewed
    fixture must emit EXACTLY the batch twin's conversions (which for
    the hot user means attributing across an 18k-row history without
    ever buffering it)."""
    from go_batch_processor_spark.streaming import rocksdb_state_store
    from go_batch_processor_spark.streaming.stateful import run_funnel_once

    schema = spark.read.parquet(f"{skew_dir}/events.parquet").schema
    ckpt = str(tmp_path / "ckpt")
    with rocksdb_state_store(spark):
        rows = run_funnel_once(spark, skew_dir, ckpt, schema).collect()
    got = {
        (r.user_id, r.purchase_id, r.purchase_ts, r.click_ts, r.view_ts,
         r.view_to_purchase_us)
        for r in rows
        if r.kind == "conversion"
    }
    want = {
        (r.user_id, r.purchase_id, r.purchase_ts, r.click_ts, r.view_ts,
         r.view_to_purchase_us)
        for r in REGISTRY["stream_funnel_conversion"].fn(spark, skew_dir).collect()
    }
    assert got == want
    hot = {g for g in got if g[0] == HOT_USER}
    assert hot, "the hot user must contribute conversions to the pin"
