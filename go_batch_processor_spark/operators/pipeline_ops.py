"""The reference pipeline itself as a checkable query (SURVEY.md §2.2.j
``pipeline_foreachbatch``): source -> transform -> finalize over Structured
Streaming, then read the sink back so the result is oracle-comparable.

This exercises R5-R9 end-to-end: Spark's micro-batch scheduler plays the
poll loop, the processor is the transform stage, the parquet append inside
foreachBatch plus the callback is the finalize stage.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_batch_processor_spark.pipeline.foreach_batch import (
    ForeachBatchPipeline,
    events_stream,
)
from go_batch_processor_spark.registry import register


@register(
    "pipeline_foreachbatch",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type <> 'error'
    """,
)
def pipeline_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the bounded pipeline (Trigger.AvailableNow) with a filtering
    processor and a parquet-append finalize; return the sink contents."""
    sink = tempfile.mkdtemp(prefix="gbp_pipeline_sink_")
    shutil.rmtree(sink, ignore_errors=True)

    def processor(batch: DataFrame) -> DataFrame:
        return batch.filter(F.col("event_type") != "error").select(
            "event_id", "user_id", "value"
        )

    outcomes: list[tuple[bool, Exception | None]] = []
    pipe = ForeachBatchPipeline(
        spark,
        events_stream(spark, sf_dir),
        processor,
        sink,
        finalizer=lambda out, err: outcomes.append((out is not None, err)),
    )
    pipe.run_available_now()
    assert pipe.batches_seen >= 1 and not pipe.errors
    # drop the epoch=N partition column the idempotent sink layout adds
    return spark.read.parquet(sink).select("event_id", "user_id", "value")


@register(
    "stream_stateful_running",
    oracle="""
    WITH g AS (
      SELECT user_id, value,
             epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts ASC, event_id ASC)) AS gap
      FROM events
    )
    SELECT user_id,
           count(*)                         AS n_events,
           round(sum(value), 2)             AS total_value,
           round(coalesce(max(gap), 0), 1)  AS max_gap_s
    FROM g
    GROUP BY user_id
    """,
)
def stream_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running count/sum/max-inter-event-gap maintained in the state store
    across micro-batches; final snapshot oracle-checked against the batch
    window/aggregate equivalent."""
    from go_batch_processor_spark.streaming import streaming_user_running_stats

    return streaming_user_running_stats(spark, sf_dir)


def _maybe_register_tws() -> None:
    """Probe-register the transformWithState twin (VERDICT r7 item 6).

    The implementation (streaming/stateful.py:streaming_user_running_stats_tws)
    is complete but its runtime hard-requires google.protobuf, absent from
    this container — so registration is conditional on the same probe that
    gates execution. The day the image ships protobuf, the key
    ``stream_user_running_stats_tws`` appears in the registry with zero
    code changes (identical semantics + oracle as stream_stateful_running);
    until then the registry is unchanged. Pinned both ways by
    tests/test_streaming.py::test_tws_probe_registration.
    """
    from go_batch_processor_spark.streaming.stateful import (
        transform_with_state_available,
    )

    if not transform_with_state_available():
        return

    @register(
        "stream_user_running_stats_tws",
        oracle="""
        WITH g AS (
          SELECT user_id, value,
                 epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                 ORDER BY ts ASC, event_id ASC)) AS gap
          FROM events
        )
        SELECT user_id,
               count(*)                         AS n_events,
               round(sum(value), 2)             AS total_value,
               round(coalesce(max(gap), 0), 1)  AS max_gap_s
        FROM g
        GROUP BY user_id
        """,
    )
    def stream_user_running_stats_tws(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-user running stats on transformWithStateInPandas — the
        modern (Spark 4) stateful-processor API twin of
        stream_stateful_running's applyInPandasWithState."""
        from go_batch_processor_spark.streaming.stateful import (
            streaming_user_running_stats_tws as _tws,
        )

        return _tws(spark, sf_dir)


_maybe_register_tws()


@register(
    "stream_mv_incremental",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT)    AS n,
           round(sum(o_totalprice), 2) AS s
    FROM orders
    GROUP BY o_custkey
    """,
)
def stream_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental materialized-view maintenance, end to end:
    orders split into 4 files, streamed one file per micro-batch
    (Trigger.AvailableNow), each batch's partial aggregate merged into
    epoch-versioned parquet state (streaming/mv_refresh.py — replay-safe:
    an epoch always merges onto the latest version strictly before
    itself). The final committed state must equal the from-scratch batch
    aggregate, which is exactly what the oracle recomputes — the
    streaming twin of mv_incremental_agg's merge algebra.

    Scale: per-batch cost is O(delta) + O(|keys|) merge; state versions
    are retained for replay and would be vacuumed by retention policy."""
    import os

    from go_batch_processor_spark.catalog import load_table
    from go_batch_processor_spark.streaming.mv_refresh import run_orders_mv_refresh

    work = tempfile.mkdtemp(prefix="gbp_stream_mv_")
    orders_dir = os.path.join(work, "orders_files")
    load_table(spark, sf_dir, "orders").repartition(4).write.parquet(orders_dir)
    try:
        state = run_orders_mv_refresh(spark, orders_dir)
        return state.select(
            "o_custkey",
            F.col("n").cast("long").alias("n"),
            F.round("s", 2).alias("s"),
        )
    finally:
        # the returned plan reads the state dir lazily; only the split
        # input can be dropped here (state dirs are tempdirs the OS owns)
        shutil.rmtree(orders_dir, ignore_errors=True)


@register(
    "stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join, run through real Structured
    Streaming (readStream + per-micro-batch broadcast hash join against
    the static customer dimension)."""
    from go_batch_processor_spark.streaming.stream_ops import (
        streaming_static_enrich,
    )

    return streaming_static_enrich(spark, sf_dir)


@register(
    "stream_stream_interval_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           date_diff('microsecond', c.ts, p.ts) AS lag_us
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 12 HOUR
    """,
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream interval join (two watermarked streams, evictable
    join state) — the streaming twin of join_interval_events, same oracle."""
    from go_batch_processor_spark.streaming.stream_ops import (
        streaming_interval_join,
    )

    return streaming_interval_join(spark, sf_dir)


@register(
    "stream_dedup_watermark",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once -> exactly-once: watermark-bounded streaming dedup of
    a doubled event stream (see streaming/stream_ops.py
    ::streaming_dedup_watermark for the state-eviction story)."""
    from go_batch_processor_spark.streaming.stream_ops import (
        streaming_dedup_watermark,
    )

    return streaming_dedup_watermark(spark, sf_dir)


@register(
    "stream_mv_join_rollup",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT)      AS n,
           round(sum(o.o_totalprice), 2) AS s
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def stream_mv_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of a JOIN-then-ROLLUP view — the most common
    production IVM shape (fact stream ⋈ dimension → rolled-up revenue
    view, always fresh): orders stream in one file per micro-batch, each
    batch broadcast-joins the static customer dimension, aggregates to a
    per-segment delta, and merges into the epoch-versioned replay-safe
    state the agg view uses (streaming/mv_refresh.py — a re-delivered
    epoch rebuilds from the state strictly before itself, so foreachBatch
    replays cannot double-count). Final committed state must equal the
    from-scratch batch join+rollup, which is what the oracle recomputes.

    Delta-join algebra note: with one streaming side and a static
    dimension, J_t = J_{t-1} ∪ agg(ΔA ⋈ B) — the ΔA⋈ΔB and A⋈ΔB terms of
    the two-sided algebra (mv_incremental_join) vanish. Per-batch cost:
    O(|ΔA|) join (broadcast dim) + O(|segments|) merge; history is never
    re-scanned.
    """
    import os

    from go_batch_processor_spark.catalog import TABLE_SCHEMAS, load_table
    from go_batch_processor_spark.streaming.mv_refresh import IncrementalMVRefresh

    work = tempfile.mkdtemp(prefix="gbp_stream_mvj_")
    orders_dir = os.path.join(work, "orders_files")
    load_table(spark, sf_dir, "orders").repartition(4).write.parquet(orders_dir)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    mv = IncrementalMVRefresh(
        spark,
        os.path.join(work, "state"),
        key="c_mktsegment",
        value="o_totalprice",
    )

    def enrich_and_merge(batch_df: DataFrame, epoch_id: int) -> None:
        mv.merge_batch(
            batch_df.join(
                F.broadcast(dim), batch_df.o_custkey == dim.c_custkey
            ),
            epoch_id,
        )

    source = (
        spark.readStream.schema(TABLE_SCHEMAS["orders"])
        .option("maxFilesPerTrigger", "1")
        .parquet(orders_dir)
    )
    checkpoint = os.path.join(work, "ckpt")
    query = (
        source.writeStream.foreachBatch(enrich_and_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.awaitTermination()
    finally:
        shutil.rmtree(orders_dir, ignore_errors=True)
    state = mv.current_state()
    assert state is not None, "stream produced no batches"
    return state.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n"),
        F.round("s", 2).alias("s"),
    )


@register(
    "stream_windowed_topk",
    oracle="""
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS win_start, user_id,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT win_start, user_id, n_events,
             CAST(row_number() OVER (PARTITION BY win_start
                                     ORDER BY n_events DESC, user_id)
                  AS BIGINT) AS rk
      FROM counts
    )
    SELECT win_start, user_id, n_events, rk FROM ranked WHERE rk <= 3
    """,
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained per-window top-k — the rank-over-stream
    pattern Structured Streaming cannot express incrementally: the
    streaming half is a plain watermarked windowed count (incremental,
    bounded state) and each foreachBatch tick re-ranks only the updated
    frame into a parquet sink partitioned by window start (see
    streaming/stream_ops.py::streaming_windowed_topk for the
    complete-mode overwrite contract). The oracle is the equivalent
    batch rank — the whole point of the split: the streamed sink must
    equal the batch answer at every availableNow quiescence.
    """
    import shutil as _shutil
    import tempfile as _tempfile

    from go_batch_processor_spark.streaming.stream_ops import (
        streaming_windowed_topk,
    )

    sink = _tempfile.mkdtemp(prefix="gbp_topk_sink_")
    try:
        out = streaming_windowed_topk(spark, sf_dir, sink)
        # Materialize away from the about-to-vanish sink dir.
        rows = out.select(
            F.col("win_start").cast("timestamp"),
            F.col("user_id").cast("long"),
            F.col("n_events").cast("long"),
            F.col("rk").cast("long"),
        )
        pdf = rows.toPandas()
    finally:
        _shutil.rmtree(sink, ignore_errors=True)
    return spark.createDataFrame(pdf, schema=rows.schema).select(
        "win_start", "user_id", "n_events", "rk"
    )
