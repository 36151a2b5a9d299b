"""Custom stateful streaming operator via applyInPandasWithState.

The reference's pipeline keeps no cross-batch state (each batch is
independent, /root/reference/batch_processor.go:147-167); per-key running
state is the natural streaming extension (north-star §2.2.j). This
implements a per-user running aggregate (count + running sum + max gap
between consecutive events) maintained across micro-batches in the state
store — the operator shape for anything Spark's built-in windowed
aggregations cannot express.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from contextlib import contextmanager

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from go_batch_processor_spark.catalog import load_stream
from go_batch_processor_spark.streaming.stream_ops import run_stream_to_memory

# Production state-store provider: RocksDB keeps state off-heap and spills
# to local disk, so per-key state scales past executor heap (the default
# HDFSBackedStateStoreProvider holds every key in JVM memory — a hard wall
# for 100 TB keyspaces). Changelog checkpointing uploads per-batch deltas
# instead of full snapshots, cutting checkpoint I/O on large state.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_STATE_CONFS = {
    "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


@contextmanager
def rocksdb_state_store(spark: SparkSession) -> Iterator[None]:
    """Scope the RocksDB state-store provider onto the session (restoring
    prior confs on exit). Applies to queries STARTED inside the scope."""
    saved: dict[str, str | None] = {}
    for k, v in _STATE_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, max_gap_s double"
)
STATE_SCHEMA = "n long, total double, last_ts double, max_gap double"


def _update_user_state(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_ts, max_gap = state.get
    else:
        n, total, last_ts, max_gap = 0, 0.0, None, 0.0
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            t = ts.timestamp()
            if last_ts is not None:
                max_gap = max(max_gap, t - last_ts)
            last_ts = t
            n += 1
            total += float(value)
    state.update((n, total, last_ts, max_gap))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_gap_s": [round(max_gap, 1)],
        }
    )



def _drain_to_parquet_sink(
    spark: SparkSession,
    updated: DataFrame,
    checkpoint_dir: str,
    out_schema: str,
) -> DataFrame:
    """Shared availableNow drain for the stateful run_*_once operators
    (r13 self-review reuse find: five hand copies of this harness).
    foreachBatch APPENDS each micro-batch to a parquet sink beside the
    caller-owned checkpoint — memory-sink queries refuse to recover from
    an existing checkpoint, and the distributed write is the pattern
    that survives 100 TB. One sink subdir PER INVOCATION (run-N): the
    returned frame holds only THIS run's emissions, matching the
    restart-recovery contract (a rerun reports what IT emitted, not the
    union of all runs)."""
    import os

    sink_root = os.path.join(checkpoint_dir, "_sink")
    os.makedirs(sink_root, exist_ok=True)
    run_n = sum(1 for d in os.listdir(sink_root) if d.startswith("run-"))
    sink_dir = os.path.join(sink_root, f"run-{run_n}")
    query = (
        updated.writeStream.outputMode("update")
        .foreachBatch(
            lambda batch_df, _id: batch_df.write.mode("append").parquet(sink_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    if not os.path.isdir(sink_dir):  # zero-batch run
        return spark.createDataFrame([], schema=out_schema)
    return spark.read.schema(out_schema).parquet(sink_dir)


def run_user_running_stats_once(
    spark: SparkSession, src_dir: str, checkpoint_dir: str, schema
) -> DataFrame:
    """One availableNow pass of the stateful per-user aggregate over a
    file-stream source, against a CALLER-OWNED checkpoint.

    Restart recovery: invoking this again with the same ``checkpoint_dir``
    after new files land in ``src_dir`` resumes from the recorded source
    offsets AND the recovered state store — per-user counters continue
    instead of restarting from zero (tests/test_streaming.py pins this
    with the RocksDB provider).
    """
    ev = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .select("user_id", "ts", "value")
    )
    updated = ev.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _drain_to_parquet_sink(spark, updated, checkpoint_dir, OUTPUT_SCHEMA)


def streaming_user_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful per-user aggregate over the bounded events stream;
    returns the final per-user snapshot (update mode: last row per user
    wins)."""
    ev = load_stream(spark, sf_dir, "events").select("user_id", "ts", "value")
    updated = ev.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_stream_to_memory(updated, spark, output_mode="update")
    # Update mode may emit one snapshot per micro-batch; keep the last
    # (highest n_events) per user.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --- Per-user session top-k with event-time EVICTION (r11, the r10
# verdict item-8 streaming direction). State per live user is BOUNDED:
# (session_start, last_ts, n, top-k values) — at most SESSION_TOPK
# doubles regardless of session length — and the entry is REMOVED
# (state.remove()) when the event-time timeout fires, i.e. when the
# watermark passes last_ts + gap. Batch twin: the oracled registry key
# stream_session_topk (operators/streaming_batch.py); the equivalence
# gate runs in tests/test_streaming.py on a watermark-flushed bounded
# source.

SESSION_TOPK = 3
# MUST equal operators.streaming_batch.SESSION_GAP_MIN in micros — the
# batch twin (stream_session_topk) and its oracle sessionize on that
# constant and the availableNow batch-equivalence gate breaks silently
# if the two diverge. A direct import here is circular
# (operators/__init__ -> pipeline_ops -> this module), so the equality
# is PINNED by tests/test_streaming.py::test_session_gap_constants_agree
# instead (r11 self-review find).
SESSION_GAP_US = 30 * 60 * 1_000_000
SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, top1 double, top2 double, top3 double, "
    "closed_by string"
)
# start/last as exact integer micros: a float-seconds round trip can be
# 1 ns off after pd.to_datetime, which would break the bit-level
# equality with the batch twin's min(ts)/max(ts).
SESSION_STATE_SCHEMA = "start long, last long, n long, vals array<double>"


def _session_pdf(user_id, start_us, last_us, n, vals, closed_by):
    v = list(vals) + [None] * (SESSION_TOPK - len(vals))
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.to_datetime(start_us, unit="us")],
            "session_end": [pd.to_datetime(last_us, unit="us")],
            "n_events": [n],
            "top1": [v[0]],
            "top2": [v[1]],
            "top3": [v[2]],
            "closed_by": [closed_by],
        }
    )


def _update_session_topk(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, vals = state.get
        state.remove()  # EVICTION: the session leaves the state store
        yield _session_pdf(user_id, start, last, n, vals, "timeout")
        return
    if state.exists:
        start, last, n, vals = state.get
        vals = list(vals)
    else:
        start = last = None
        n, vals = 0, []
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out = []
    # closed-chain builder for in-watermark rows that predate the open
    # session by MORE than the gap (ADVICE r11 item 2): (start, last, n,
    # vals) of a straggler session that can never rejoin the open one
    early = None
    for ts, value in zip(rows["ts"], rows["value"]):
        t = int(pd.Timestamp(ts).value) // 1000  # exact micros
        if start is not None and start - t > SESSION_GAP_US:
            # Too old to merge backward: a row more than one gap before
            # the open session's start cannot belong to it under the
            # batch twin's semantics. Such stragglers sessionize among
            # THEMSELVES (this batch is sorted ascending, so their chain
            # closes before the open session's region begins) and emit
            # as closed "gap" sessions — exactly the batch twin's answer
            # for isolated or chained early stragglers. The one
            # remaining bounded-state divergence, documented here and
            # pinned in tests/test_streaming.py: a straggler chain that
            # BRIDGES to the open session (t1 <= start-gap < t2 <= start
            # with t2 - t1 <= gap) — the twin chains all three into one
            # session, but the straggler chain was already emitted.
            if early is not None and t - early[1] <= SESSION_GAP_US:
                evals = sorted(early[3] + [float(value)], reverse=True)[
                    :SESSION_TOPK
                ]
                early = (early[0], t, early[2] + 1, evals)
            else:
                if early is not None:
                    out.append(_session_pdf(user_id, *early, "gap"))
                early = (t, t, 1, [float(value)])
            continue
        if last is not None and t - last > SESSION_GAP_US:
            out.append(_session_pdf(user_id, start, last, n, vals, "gap"))
            start, last, n, vals = None, None, 0, []
        if start is None:
            start = t
        elif t < start:
            # in-watermark row from a LATER micro-batch that predates
            # the open session by AT MOST the gap: merge it backward
            # (r11 self-review find — `last` regressing could otherwise
            # emit session_end < session_start and phantom splits; a
            # single-batch run sorts rows, so this path never fires
            # there and the availableNow equivalence gate is unchanged)
            start = t
        if last is None or t > last:
            last = t  # event-time high-water of the session, never regresses
        n += 1
        # bounded-state top-k: insert + truncate, never the full session
        vals = sorted(vals + [float(value)], reverse=True)[:SESSION_TOPK]
    if early is not None:
        out.append(_session_pdf(user_id, *early, "gap"))
    state.update((start, last, n, vals))
    state.setTimeoutTimestamp(last // 1000 + SESSION_GAP_US // 1000)
    yield from out


def run_session_topk_once(
    spark: SparkSession, src_dir: str, checkpoint_dir: str, schema
) -> DataFrame:
    """One availableNow pass of the session-top-k operator against a
    caller-owned checkpoint (the run_user_running_stats_once harness
    shape: foreachBatch parquet sink, one run-N subdir per invocation).
    Sessions closed by a gap within the data emit during the pass;
    sessions whose timeout the advancing watermark crosses emit from
    the timeout path with their state REMOVED. A rerun after new files
    land resumes from the recovered offsets + state."""
    import os

    from pyspark.sql import functions as F

    ev = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        # naive-written parquet can infer TIMESTAMP_NTZ; the watermark
        # operator requires TimestampType (session TZ is pinned UTC, so
        # the cast is a pure type change)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "event_id", "ts", "value")
        .withWatermark("ts", "1 hour")
    )
    updated = ev.groupBy("user_id").applyInPandasWithState(
        _update_session_topk,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return _drain_to_parquet_sink(spark, updated, checkpoint_dir, SESSION_OUT_SCHEMA)


try:  # Spark >= 4.0; module import must survive older builds
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor as _StatefulProcessorBase,
    )
except ImportError:  # pragma: no cover — gated like table_formats
    _StatefulProcessorBase = object


class RunningStatsProcessor(_StatefulProcessorBase):
    """StatefulProcessor twin of _update_user_state on Spark 4's
    transformWithState API (the successor of applyInPandasWithState:
    typed per-key state handles — ValueState here — plus timers and
    TTL the legacy API lacks; REQUIRES the RocksDB state store, which
    registry.REQUIRED_CONFS pins on any session)."""

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._state = handle.getValueState("agg", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        (user_id,) = key
        if self._state.exists():
            n, total, last_ts, max_gap = self._state.get()
        else:
            n, total, last_ts, max_gap = 0, 0.0, None, 0.0
        for pdf in rows:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                t = ts.timestamp()
                if last_ts is not None:
                    max_gap = max(max_gap, t - last_ts)
                last_ts = t
                n += 1
                total += float(value)
        self._state.update((n, total, last_ts, max_gap))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "max_gap_s": [round(max_gap, 1)],
            }
        )

    def close(self) -> None:
        pass


def transform_with_state_available() -> bool:
    """transformWithState's DRIVER-side Python worker hard-imports
    google.protobuf (state serialization protocol); without it the worker
    exits -2 and every TWS query dies with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE (verified live in this
    container). Gate on the import, same policy as sources/table_formats."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return _StatefulProcessorBase is not object
    except ImportError:
        return False


def streaming_user_running_stats_tws(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The per-user running aggregate on transformWithStateInPandas —
    identical semantics and oracle as streaming_user_running_stats.

    ENV-GATED (not in the query registry): this container ships no
    protobuf and pip installs are unavailable, so the TWS runtime cannot
    start here; the implementation is complete and becomes registerable
    the moment the dependency exists (see transform_with_state_available).
    """
    if not transform_with_state_available():
        raise NotImplementedError(
            "transformWithState requires google.protobuf in the Python "
            "environment; not available in this container (see "
            "transform_with_state_available)"
        )
    ev = load_stream(spark, sf_dir, "events").select("user_id", "ts", "value")
    updated = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningStatsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
    out = run_stream_to_memory(updated, spark, output_mode="update")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# -- Funnel attribution: view -> click -> purchase --------------------------
#
# Streaming twin of the oracled batch key stream_funnel_conversion
# (operators/streaming_batch.py). Per-user state is THREE timestamps
# (latest view; latest click; the latest-view stamp AT that click),
# bounded regardless of history length. Timeout here is EVICTION-ONLY
# (emits a tombstone, no result row) — the complement of
# run_session_topk_once's emit-on-timeout: once the watermark passes
# every window the state could still serve (max(lv, lc) + W), no future
# purchase or click can use it, so it leaves the store.
#
# MUST equal operators.streaming_batch.FUNNEL_WINDOW_H in micros —
# pinned by tests/test_streaming.py (direct import is circular).
FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000
FUNNEL_OUT_SCHEMA = (
    "user_id long, purchase_id long, purchase_ts timestamp, "
    "click_ts timestamp, view_ts timestamp, view_to_purchase_us long, "
    "kind string"
)
# exact integer micros (the session-topk float-round-trip lesson)
FUNNEL_STATE_SCHEMA = "lv long, lc long, lcv long"


def _funnel_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()  # EVICTION: no window this state serves remains open
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "purchase_id": [None],
                "purchase_ts": [pd.NaT],
                "click_ts": [pd.NaT],
                "view_ts": [pd.NaT],
                "view_to_purchase_us": [None],
                "kind": ["evict"],
            }
        )
        return
    lv, lc, lcv = state.get if state.exists else (None, None, None)
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out = []
    for et, eid, ts in zip(rows["event_type"], rows["event_id"], rows["ts"]):
        t = int(pd.Timestamp(ts).value) // 1000  # exact micros
        if et == "view":
            # max(): an out-of-order view older than the stored one can
            # never be the "latest view" for any future click. A late
            # view NEWER than lv but OLDER than the stored click leaves
            # that click's lcv stamp stale (the batch twin would
            # re-attribute the click to it) — the same documented
            # cross-batch bounded-state class as late clicks/purchases
            # below; single-batch runs sort, so the availableNow
            # equivalence gate is unaffected.
            lv = t if lv is None else max(lv, t)
        elif et == "click":
            if lc is None or t >= lc:
                lc, lcv = t, lv
            # else: late click older than the stored latest — a future
            # purchase attributes to the LATEST click only; documented
            # cross-batch divergence (single-batch runs are sorted, so
            # the availableNow equivalence gate never hits this)
        elif et == "purchase":
            # 0 <= : a late purchase PREDATING the stored latest click
            # never attributes to it (the batch twin would attribute to
            # the click before the purchase — state no longer holds it;
            # same documented cross-batch class as late clicks above)
            if (
                lc is not None
                and 0 <= t - lc <= FUNNEL_WINDOW_US
                and lcv is not None
                and lc - lcv <= FUNNEL_WINDOW_US
            ):
                out.append(
                    pd.DataFrame(
                        {
                            "user_id": [user_id],
                            "purchase_id": [int(eid)],
                            "purchase_ts": [pd.to_datetime(t, unit="us")],
                            "click_ts": [pd.to_datetime(lc, unit="us")],
                            "view_ts": [pd.to_datetime(lcv, unit="us")],
                            "view_to_purchase_us": [t - lcv],
                            "kind": ["conversion"],
                        }
                    )
                )
    if lv is None and lc is None:
        # purchases only: nothing a future event could attribute to
        if state.exists:
            state.remove()
    else:
        state.update((lv, lc, lcv))
        horizon = max(v for v in (lv, lc) if v is not None)
        # Clamp to strictly-after-the-watermark (r12 self-review find):
        # purchases never advance lv/lc, so after an eviction-eligible
        # state survives a pass (timeouts flush on the NEXT batch), an
        # in-watermark purchase would re-arm a timeout EARLIER than the
        # current watermark — setTimeoutTimestamp raises
        # INVALID_TIMEOUT_TIMESTAMP and fails the whole query on normal
        # input (old click, much-later purchase). session-topk is immune
        # (its horizon `last` >= every processed row's t >= watermark);
        # the funnel's horizon is not row-monotone, hence the clamp.
        state.setTimeoutTimestamp(
            max(
                horizon // 1000 + FUNNEL_WINDOW_US // 1000,
                state.getCurrentWatermarkMs() + 1,
            )
        )
    yield from out


def run_funnel_once(
    spark: SparkSession, src_dir: str, checkpoint_dir: str, schema
) -> DataFrame:
    """One availableNow pass of the funnel-attribution operator against
    a caller-owned checkpoint (the run_session_topk_once harness shape:
    foreachBatch parquet sink, one run-N subdir per invocation).
    Conversions emit inline as purchases arrive; state evicts via
    EventTimeTimeout tombstones once the watermark passes max(lv, lc)
    + W. A rerun after new files land resumes from recovered offsets +
    state — cross-batch funnels complete on the recovered state."""
    import os

    from pyspark.sql import functions as F

    ev = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_id", "ts", "event_type")
        .withWatermark("ts", "1 hour")
    )
    updated = ev.groupBy("user_id").applyInPandasWithState(
        _funnel_update,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return _drain_to_parquet_sink(spark, updated, checkpoint_dir, FUNNEL_OUT_SCHEMA)


# -- Last-touch attribution: purchase -> latest prior touch ------------------
#
# Streaming twin of the oracled batch key analytics_attribution_last_touch
# (operators/analytics.py — the as-of machinery's canonical
# product-analytics use; VERDICT r12 item 4). The funnel state machine
# minus one stage: per-user state is ONE (touch_ts, touch_type) pair —
# the latest view/click seen — bounded regardless of history length.
# Purchases attribute to it if it lies within the attribution window.
#
# The batch key is UNWINDOWED ("latest touch at-or-before", unbounded
# lookback); unbounded lookback means unbounded state RETENTION, which a
# stream cannot honor. ATTRIB_WINDOW_US = 30 days is the production
# lookback policy (the standard marketing attribution window): equality
# with the unwindowed batch key holds exactly while every
# touch->purchase lag fits the window (true for the test fixtures —
# events span ~31 days and the max observed lag is ~4.4 days; pinned by
# tests/test_streaming.py), and state evicts via the funnel's
# EVICTION-ONLY EventTimeTimeout pattern once the watermark passes
# touch_ts + W.
#
# Tie semantics mirror the batch key's micro-ts dedup: touches are
# deduped to min(event_type) per (user, micro ts) — at an equal-ts tie
# the stored type becomes min(stored, new) ('click' < 'view'), so the
# as-of match can never disagree with the batch side on a tie.
ATTRIB_WINDOW_US = 30 * 24 * 3600 * 1_000_000
ATTRIB_OUT_SCHEMA = (
    "user_id long, purchase_id long, purchase_ts timestamp, "
    "touch_ts timestamp, touch_type string, latency_us long, kind string"
)
ATTRIB_STATE_SCHEMA = "t long, typ string"  # exact integer micros


def _attribution_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()  # EVICTION: the touch can serve no future purchase
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "purchase_id": [None],
                "purchase_ts": [pd.NaT],
                "touch_ts": [pd.NaT],
                "touch_type": [None],
                "latency_us": [None],
                "kind": ["evict"],
            }
        )
        return
    st, styp = state.get if state.exists else (None, None)
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    out = []
    for et, eid, ts in zip(rows["event_type"], rows["event_id"], rows["ts"]):
        t = int(pd.Timestamp(ts).value) // 1000  # exact micros
        if et in ("view", "click"):
            if st is None or t > st:
                st, styp = t, et
            elif t == st:
                # micro-ts tie: min(event_type) priority, mirroring the
                # batch key's groupBy(user, ts).agg(min(event_type))
                styp = min(styp, et)
            # else: a late touch OLDER than the stored latest can never
            # be the "latest touch" for any future purchase — but a
            # purchase BETWEEN it and the stored touch already attributed
            # to the stored one in the batch twin's answer only if it
            # came after; the documented cross-batch bounded-state class
            # shared with the funnel (single-batch runs sort, so the
            # availableNow equivalence gate never hits this)
        elif et == "purchase":
            # 0 <=: a late purchase PREDATING the stored touch never
            # attributes to it (same documented class)
            if st is not None and 0 <= t - st <= ATTRIB_WINDOW_US:
                out.append(
                    pd.DataFrame(
                        {
                            "user_id": [user_id],
                            "purchase_id": [int(eid)],
                            "purchase_ts": [pd.to_datetime(t, unit="us")],
                            "touch_ts": [pd.to_datetime(st, unit="us")],
                            "touch_type": [styp],
                            "latency_us": [t - st],
                            "kind": ["conversion"],
                        }
                    )
                )
    if st is None:
        # purchases only: nothing a future purchase could attribute to
        if state.exists:
            state.remove()
    else:
        state.update((st, styp))
        # same clamp as the funnel (r12 self-review find): purchases
        # never advance st, so an in-watermark purchase after a pass
        # would otherwise re-arm a timeout EARLIER than the watermark
        # (INVALID_TIMEOUT_TIMESTAMP fails the whole query)
        state.setTimeoutTimestamp(
            max(
                st // 1000 + ATTRIB_WINDOW_US // 1000,
                state.getCurrentWatermarkMs() + 1,
            )
        )
    yield from out


def run_attribution_once(
    spark: SparkSession, src_dir: str, checkpoint_dir: str, schema
) -> DataFrame:
    """One availableNow pass of the last-touch attribution operator
    against a caller-owned checkpoint (the run_funnel_once harness
    shape: foreachBatch parquet sink, one run-N subdir per invocation).
    Conversions emit inline as purchases arrive; state evicts via
    EventTimeTimeout tombstones once the watermark passes touch + W."""
    import os

    from pyspark.sql import functions as F

    ev = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_id", "ts", "event_type")
        .withWatermark("ts", "1 hour")
    )
    updated = ev.groupBy("user_id").applyInPandasWithState(
        _attribution_update,
        outputStructType=ATTRIB_OUT_SCHEMA,
        stateStructType=ATTRIB_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return _drain_to_parquet_sink(spark, updated, checkpoint_dir, ATTRIB_OUT_SCHEMA)


# -- Global heavy hitters: bucketed Misra-Gries sketch state -----------------
#
# Streaming twin of the oracled batch key agg_heavy_hitters
# (operators/ml.py:247 — MG candidate generation + exact recount). A
# THIRD state class for the streaming family: funnel/session/attribution
# hold O(1) state PER ENTITY; this holds O(HH_BUCKETS * HH_BUDGET) state
# TOTAL, independent of key cardinality — the sketch-state shape.
#
# The key space is hash-partitioned into HH_BUCKETS groups (the
# applyInPandasWithState grouping key); each bucket maintains a
# Misra-Gries summary of budget HH_BUDGET over ITS key subset, merged
# per micro-batch via the mergeable-summaries rule (merge exact
# batch counts into the summary, then one decrement reduction; the
# cumulative decrement `decr` carries the error bound). Guarantees,
# pinned by tests/test_streaming.py + a hypothesis property:
#   - survival: any key with true bucket count > decr survives. Each
#     reduction subtracts its cut from >= HH_BUDGET+1 counters, so
#     decr <= N_bucket/(HH_BUDGET+1) <= N/(HH_BUDGET+1); the HH
#     threshold is count > N/HH_K, so HH_BUDGET + 1 > HH_K makes every
#     true phi-heavy hitter survive EVEN IF every row hashes into one
#     bucket (N_bucket = N, the adversarial worst case — with the old
#     budget 64 < HH_K a single-bucket pile-up could evict a marginal
#     heavy hitter). Pinned by the constants test.
#   - bounds: stored count <= true bucket count <= stored + decr.
# The exact answer then needs one batch recount restricted to the
# candidate set — identical to the batch key's second pass.
#
# Each micro-batch emits the bucket's CURRENT summary stamped with the
# monotone rows-processed version `n`; the final summary per bucket is
# the max-n emission. No timeout: the state is the bounded sketch
# itself and must live for the stream's lifetime.
HH_BUCKETS = 32
HH_BUDGET = 150  # must stay >= operators.ml.HH_K (see survival note)
HH_OUT_SCHEMA = (
    "bucket int, user_id long, count_lb long, decr long, n long"
)
HH_STATE_SCHEMA = "users array<long>, counts array<long>, decr long, n long"


def _hh_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (bucket,) = key
    if state.exists:
        users, counts, decr, n = state.get
        counters = dict(zip(users, counts))
    else:
        counters, decr, n = {}, 0, 0
    rows = pd.concat(list(pdfs))
    for u, c in rows["user_id"].value_counts().items():
        counters[int(u)] = counters.get(int(u), 0) + int(c)
    n += int(len(rows))
    counters, cut = _mg_reduce_tracked(counters, HH_BUDGET)
    decr += cut
    state.update((list(counters.keys()), list(counters.values()), decr, n))
    yield pd.DataFrame(
        {
            "bucket": [int(bucket)] * len(counters),
            "user_id": list(counters.keys()),
            "count_lb": list(counters.values()),
            "decr": [decr] * len(counters),
            "n": [n] * len(counters),
        }
    )


def _mg_reduce_tracked(counters: dict, budget: int) -> tuple[dict, int]:
    """operators.ml._mg_reduce with the decrement RETURNED (the
    streaming summary must accumulate it for the error bound; the batch
    candidate pass only needs the surviving keys)."""
    if len(counters) <= budget:
        return counters, 0
    cut = sorted(counters.values(), reverse=True)[budget]
    return {k: c - cut for k, c in counters.items() if c - cut > 0}, cut


def run_heavy_hitters_once(
    spark: SparkSession, src_dir: str, checkpoint_dir: str, schema
) -> DataFrame:
    """One availableNow pass of the bucketed-MG heavy-hitter sketch
    against a caller-owned checkpoint (run_funnel_once harness shape).
    Returns ALL summary emissions; the final summary per bucket is the
    max-`n` group (n is the bucket's monotone rows-processed count)."""
    import os

    from pyspark.sql import functions as F

    ev = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .select("user_id")
        .withColumn("bucket", F.pmod(F.col("user_id"), F.lit(HH_BUCKETS)).cast("int"))
    )
    updated = ev.groupBy("bucket").applyInPandasWithState(
        _hh_update,
        outputStructType=HH_OUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _drain_to_parquet_sink(spark, updated, checkpoint_dir, HH_OUT_SCHEMA)


def hh_final_summaries(all_emissions: DataFrame) -> DataFrame:
    """The latest (max-n) summary rows per bucket from a
    run_heavy_hitters_once result."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("bucket")
    return (
        all_emissions.withColumn("_mx", F.max("n").over(w))
        .filter(F.col("n") == F.col("_mx"))
        .drop("_mx")
    )


# -- Bucketed + vectorized funnel: the throughput path -----------------------
#
# The skew probe measured the per-user funnel at ~18k rows/s/core —
# applyInPandasWithState pays per-GROUP overhead (state round-trip, pdf
# construction, Arrow slices) for every live user, and the per-row
# Python fold pays again inside. This variant removes both costs while
# keeping the SAME semantics as _funnel_update:
#   - grouping key = pmod(user_id, FUNNEL_BUCKETS): 32 groups per batch
#     instead of one per user;
#   - per-bucket state = parallel arrays (user, lv, lc, lcv) with -1 as
#     the NULL sentinel (timestamps are positive micros);
#   - the inner fold is VECTORIZED pandas (_funnel_fold_bucket): prefix
#     cummax for lv, last-click forward-fill for (lc, lcv), a per-row
#     state-vs-batch comparison replaying the sequential update rules
#     exactly (including the late-click "t >= lc" guard and micro-ts
#     tie order by (ts, event_id)) — hypothesis-pinned against a
#     straight sequential re-implementation in
#     tests/test_round13_property.py, and equal to the oracled batch
#     twin on the fixtures.
#   - eviction: ONE event-time timer per bucket at the min live horizon;
#     on fire (or at batch start) users whose max(lv, lc) + W the
#     watermark passed are dropped — same observable contract as the
#     per-user tombstones (a post-eviction purchase cannot convert),
#     emitted as one kind='evict' row per dropped user.
FUNNEL_BUCKETS = 32


def _funnel_fold_bucket(
    pdf: pd.DataFrame, state: dict
) -> tuple[list[tuple], dict]:
    """Vectorized funnel fold over one bucket's micro-batch rows.

    ``pdf`` columns: user_id, event_id, ts (datetime64), event_type.
    ``state`` maps user_id -> (lv, lc, lcv) exact-integer micros with -1
    for NULL. Returns (conversion rows, updated state); state entries
    for untouched users are preserved by the caller."""
    import numpy as np

    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    u = pdf["user_id"].to_numpy()
    t = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    et = pdf["event_type"].to_numpy()
    eid = pdf["event_id"].to_numpy()

    u_key = pd.Series(u)  # positional (RangeIndex) grouping key
    # lv within the batch: prefix max of view timestamps, in row order
    # (cythonized groupby cummax/ffill — no per-group Python)
    v_ts = pd.Series(np.where(et == "view", t, np.int64(-1)))
    lv_batch = v_ts.groupby(u_key).cummax().to_numpy()
    # state lv joins as the floor of the prefix max
    if state:
        smap = pd.DataFrame.from_dict(
            state, orient="index", columns=["lv", "lc", "lcv"]
        )
        joined = smap.reindex(u).fillna(-1).astype("int64")
        lv0 = joined["lv"].to_numpy()
        lc0 = joined["lc"].to_numpy()
        lcv0 = joined["lcv"].to_numpy()
    else:
        lv0 = lc0 = lcv0 = np.full(len(u), -1, dtype="int64")
    lv_eff = np.maximum(lv_batch, lv0)

    # last click pair within the batch, forward-filled in row order:
    # at click rows the pair is (t, lv_eff at that row); the sequential
    # "t >= lc" guard means a batch click only REPLACES the state pair
    # when its ts >= lc0 — evaluated per-row below
    is_click = et == "click"
    c_ts = pd.Series(np.where(is_click, t, np.int64(-1)))
    lc_batch = c_ts.groupby(u_key).cummax().to_numpy()
    # lcv of the LAST click so far: ffill over click rows
    lcv_series = pd.Series(
        np.where(
            is_click,
            np.where(lv_eff >= 0, lv_eff, np.int64(-1)).astype("float64"),
            np.nan,
        )
    )
    lcv_batch = lcv_series.groupby(u_key).ffill().to_numpy()
    use_batch = lc_batch >= lc0  # sorted batch clicks: last == max
    lc_eff = np.where(use_batch & (lc_batch >= 0), lc_batch, lc0)
    lcv_eff = np.where(
        use_batch & (lc_batch >= 0),
        np.where(np.isnan(lcv_batch), np.int64(-1), lcv_batch),
        lcv0,
    ).astype("int64")

    is_p = et == "purchase"
    ok = (
        is_p
        & (lc_eff >= 0)
        & (t - lc_eff >= 0)
        & (t - lc_eff <= FUNNEL_WINDOW_US)
        & (lcv_eff >= 0)
        & (lc_eff - lcv_eff <= FUNNEL_WINDOW_US)
    )
    out = [
        (int(u[i]), int(eid[i]), int(t[i]), int(lc_eff[i]), int(lcv_eff[i]))
        for i in np.flatnonzero(ok)
    ]

    # end-of-batch state per touched user = the LAST row's effective
    # stamps for that user (rows are grouped-in-order, so the last
    # occurrence positionally is the group tail)
    tail = ~pd.Series(u).duplicated(keep="last").to_numpy()
    new_state = dict(state)
    for i in np.flatnonzero(tail):
        lv_f, lc_f, lcv_f = int(lv_eff[i]), int(lc_eff[i]), int(lcv_eff[i])
        if lv_f < 0 and lc_f < 0:
            new_state.pop(int(u[i]), None)  # purchases only: nothing to serve
        else:
            new_state[int(u[i])] = (lv_f, lc_f, lcv_f)
    return out, new_state


FUNNEL_BUCKET_STATE_SCHEMA = (
    "users array<long>, lv array<long>, lc array<long>, lcv array<long>"
)


def _funnel_bucket_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (_bucket,) = key
    if state.exists:
        users, lvs, lcs, lcvs = state.get
        st = {
            int(u): (int(a), int(b), int(c))
            for u, a, b, c in zip(users, lvs, lcs, lcvs)
        }
    else:
        st = {}
    wm_us = state.getCurrentWatermarkMs() * 1000

    def evict(st: dict) -> tuple[dict, list[int]]:
        """Drop users whose last possible window the watermark passed —
        the same observable contract as the per-user operator's timeout
        tombstones (a post-eviction purchase cannot convert)."""
        gone = [
            u
            for u, (lv, lc, lcv) in st.items()
            if max(lv, lc) + FUNNEL_WINDOW_US < wm_us
        ]
        for u in gone:
            del st[u]
        return st, gone

    out_rows: list[tuple] = []
    if state.hasTimedOut:
        st, gone = evict(st)
        evict_pdf = _funnel_bucket_out([], gone)
        if not st:
            state.remove()
            if len(evict_pdf):
                yield evict_pdf
            return
    else:
        # data path: evict FIRST (per-user timers would have fired on an
        # earlier batch; without this a post-eviction purchase could
        # still see the stale stamp), then fold the batch vectorized
        st, gone = evict(st)
        rows = pd.concat(list(pdfs))
        conv, st = _funnel_fold_bucket(rows, st)
        out_rows = conv
        evict_pdf = _funnel_bucket_out([], gone)

    if st:
        state.update(
            (
                list(st.keys()),
                [v[0] for v in st.values()],
                [v[1] for v in st.values()],
                [v[2] for v in st.values()],
            )
        )
        horizon = min(max(lv, lc) + FUNNEL_WINDOW_US for lv, lc, _ in st.values())
        state.setTimeoutTimestamp(
            max(horizon // 1000, state.getCurrentWatermarkMs() + 1)
        )
    elif state.exists:
        state.remove()
    out = _funnel_bucket_out(out_rows, [])
    if len(evict_pdf):
        out = pd.concat([out, evict_pdf], ignore_index=True)
    if len(out):
        yield out


def _funnel_bucket_out(conv_rows: list[tuple], evicted: list[int]) -> pd.DataFrame:
    """Conversion tuples (u, eid, t, lc, lcv) + eviction tombstones into
    the shared FUNNEL_OUT_SCHEMA frame."""
    frames = {
        "user_id": [r[0] for r in conv_rows] + list(evicted),
        "purchase_id": [r[1] for r in conv_rows] + [None] * len(evicted),
        "purchase_ts": pd.to_datetime(
            [r[2] for r in conv_rows] + [None] * len(evicted), unit="us"
        ),
        "click_ts": pd.to_datetime(
            [r[3] for r in conv_rows] + [None] * len(evicted), unit="us"
        ),
        "view_ts": pd.to_datetime(
            [r[4] for r in conv_rows] + [None] * len(evicted), unit="us"
        ),
        "view_to_purchase_us": [r[2] - r[4] for r in conv_rows]
        + [None] * len(evicted),
        "kind": ["conversion"] * len(conv_rows) + ["evict"] * len(evicted),
    }
    return pd.DataFrame(frames)


def run_funnel_bucketed_once(
    spark: SparkSession, src_dir: str, checkpoint_dir: str, schema
) -> DataFrame:
    """Bucket-keyed, VECTORIZED variant of run_funnel_once — the
    throughput path. Identical output contract (FUNNEL_OUT_SCHEMA,
    conversions + per-user eviction tombstones); grouping key is
    pmod(user_id, FUNNEL_BUCKETS) so a micro-batch pays per-group
    overhead 32 times instead of once per live user, and the inner fold
    is cythonized pandas (_funnel_fold_bucket) instead of a per-row
    Python loop. Measured by tools/skew_probe.py --bucketed; semantics
    pinned equal to the per-user operator's batch twin in
    tests/test_streaming.py and to the sequential rules by hypothesis."""
    from pyspark.sql import functions as F

    ev = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_id", "ts", "event_type")
        .withWatermark("ts", "1 hour")
        .withColumn(
            "bucket", F.pmod(F.col("user_id"), F.lit(FUNNEL_BUCKETS)).cast("int")
        )
    )
    updated = ev.groupBy("bucket").applyInPandasWithState(
        _funnel_bucket_update,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_BUCKET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return _drain_to_parquet_sink(spark, updated, checkpoint_dir, FUNNEL_OUT_SCHEMA)


# -- Bucketed + vectorized attribution: same lever as the funnel -------------
#
# The last-touch machine is one stage simpler than the funnel, and its
# fold vectorizes with ONE encoded cummax: e = touch_ts * 2 + (1 if
# click else 0). Maximizing e picks the latest touch timestamp, and at
# an exact micro-ts tie the +1 makes 'click' win — which IS the batch
# key's min(event_type) dedup ('click' < 'view'), so the sequential tie
# rule costs nothing extra. State merges as max(e0, prefix cummax).
ATTRIB_BUCKET_STATE_SCHEMA = "users array<long>, enc array<long>"


def _attribution_fold_bucket(
    pdf: pd.DataFrame, state: dict
) -> tuple[list[tuple], dict]:
    """Vectorized last-touch fold over one bucket's micro-batch rows.

    ``state`` maps user_id -> encoded touch (ts*2 + is_click), -1 for
    none. Returns (attribution rows (u, eid, t, touch_ts, typ), new
    state). Late purchases predating the stored touch do not attribute
    (the 0 <= lag guard), matching _attribution_update."""
    import numpy as np

    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    u = pdf["user_id"].to_numpy()
    t = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    et = pdf["event_type"].to_numpy()
    eid = pdf["event_id"].to_numpy()

    is_touch = (et == "view") | (et == "click")
    enc = np.where(is_touch, t * 2 + (et == "click").astype("int64"), np.int64(-1))
    enc_batch = pd.Series(enc).groupby(pd.Series(u)).cummax().to_numpy()
    if state:
        e0 = (
            pd.Series(u).map(state).fillna(-1).astype("int64").to_numpy()
        )
    else:
        e0 = np.full(len(u), -1, dtype="int64")
    e_eff = np.maximum(enc_batch, e0)

    is_p = et == "purchase"
    touch_t = np.where(e_eff >= 0, e_eff >> 1, np.int64(-1))
    ok = (
        is_p
        & (e_eff >= 0)
        & (t - touch_t >= 0)
        & (t - touch_t <= ATTRIB_WINDOW_US)
    )
    out = [
        (
            int(u[i]),
            int(eid[i]),
            int(t[i]),
            int(touch_t[i]),
            "click" if e_eff[i] & 1 else "view",
        )
        for i in np.flatnonzero(ok)
    ]

    tail = ~pd.Series(u).duplicated(keep="last").to_numpy()
    new_state = dict(state)
    for i in np.flatnonzero(tail):
        e_f = int(e_eff[i])
        if e_f < 0:
            new_state.pop(int(u[i]), None)  # purchases only
        else:
            new_state[int(u[i])] = e_f
    return out, new_state


def _attribution_bucket_update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (_bucket,) = key
    if state.exists:
        users, encs = state.get
        st = {int(a): int(b) for a, b in zip(users, encs)}
    else:
        st = {}
    wm_us = state.getCurrentWatermarkMs() * 1000

    def evict(st: dict) -> tuple[dict, list[int]]:
        gone = [u for u, e in st.items() if (e >> 1) + ATTRIB_WINDOW_US < wm_us]
        for u in gone:
            del st[u]
        return st, gone

    out_rows: list[tuple] = []
    if state.hasTimedOut:
        st, gone = evict(st)
        evict_pdf = _attribution_bucket_out([], gone)
        if not st:
            state.remove()
            if len(evict_pdf):
                yield evict_pdf
            return
    else:
        st, gone = evict(st)  # stale touches die before the fold
        rows = pd.concat(list(pdfs))
        out_rows, st = _attribution_fold_bucket(rows, st)
        evict_pdf = _attribution_bucket_out([], gone)

    if st:
        state.update((list(st.keys()), list(st.values())))
        horizon = min((e >> 1) + ATTRIB_WINDOW_US for e in st.values())
        state.setTimeoutTimestamp(
            max(horizon // 1000, state.getCurrentWatermarkMs() + 1)
        )
    elif state.exists:
        state.remove()
    out = _attribution_bucket_out(out_rows, [])
    if len(evict_pdf):
        out = pd.concat([out, evict_pdf], ignore_index=True)
    if len(out):
        yield out


def _attribution_bucket_out(
    conv_rows: list[tuple], evicted: list[int]
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in conv_rows] + list(evicted),
            "purchase_id": [r[1] for r in conv_rows] + [None] * len(evicted),
            "purchase_ts": pd.to_datetime(
                [r[2] for r in conv_rows] + [None] * len(evicted), unit="us"
            ),
            "touch_ts": pd.to_datetime(
                [r[3] for r in conv_rows] + [None] * len(evicted), unit="us"
            ),
            "touch_type": [r[4] for r in conv_rows] + [None] * len(evicted),
            "latency_us": [r[2] - r[3] for r in conv_rows]
            + [None] * len(evicted),
            "kind": ["conversion"] * len(conv_rows) + ["evict"] * len(evicted),
        }
    )


def run_attribution_bucketed_once(
    spark: SparkSession, src_dir: str, checkpoint_dir: str, schema
) -> DataFrame:
    """Bucket-keyed, VECTORIZED variant of run_attribution_once — same
    output contract (ATTRIB_OUT_SCHEMA); the funnel's 9.7x lever applied
    to the simpler one-pair machine. Semantics hypothesis-pinned against
    the sequential rules and twin-pinned in tests/test_streaming.py."""
    from pyspark.sql import functions as F

    ev = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_id", "ts", "event_type")
        .withWatermark("ts", "1 hour")
        .withColumn(
            "bucket", F.pmod(F.col("user_id"), F.lit(FUNNEL_BUCKETS)).cast("int")
        )
    )
    updated = ev.groupBy("bucket").applyInPandasWithState(
        _attribution_bucket_update,
        outputStructType=ATTRIB_OUT_SCHEMA,
        stateStructType=ATTRIB_BUCKET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return _drain_to_parquet_sink(spark, updated, checkpoint_dir, ATTRIB_OUT_SCHEMA)
