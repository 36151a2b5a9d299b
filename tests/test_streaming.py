"""True Structured Streaming tests: the streaming variants must agree with
their oracle-checked batch twins (append-mode closed windows)."""

from __future__ import annotations

from go_batch_processor_spark.registry import REGISTRY, _ensure_loaded
from go_batch_processor_spark.streaming import (
    streaming_session_window,
    streaming_tumbling_window,
)

_ensure_loaded()


def test_streaming_tumbling_matches_batch_twin(spark, sf_dir):
    stream = {
        (r.win_start, r.n_events, r.total_value)
        for r in streaming_tumbling_window(spark, sf_dir).collect()
    }
    batch = {
        (r.win_start, r.n_events, r.total_value)
        for r in REGISTRY["stream_tumbling_window"].fn(spark, sf_dir).collect()
    }
    # Append mode emits only windows closed by the final watermark; with
    # Trigger.AvailableNow on a bounded source every window but the last
    # open one(s) closes. All emitted windows must match the batch twin.
    assert stream, "bounded streaming run should emit closed windows"
    assert stream <= batch
    # Windows with end > max(ts) - 1h watermark stay open: the 1-hour delay
    # can span at most two 1-hour window boundaries.
    assert len(batch) - len(stream) <= 2


def test_streaming_session_window_counts(spark, sf_dir):
    rows = streaming_session_window(spark, sf_dir).collect()
    assert rows
    batch_sessions = REGISTRY["stream_sessionize"].fn(spark, sf_dir)
    total_batch = sum(r.n_events for r in batch_sessions.collect())
    total_stream = sum(r.n_events for r in rows)
    # Closed sessions only — never more events than the batch ground truth.
    assert 0 < total_stream <= total_batch
    for r in rows:
        assert r.session_start <= r.session_end
