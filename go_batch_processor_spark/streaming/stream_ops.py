"""True Structured Streaming variants of the §2.2.j operators.

The batch twins in operators/streaming_batch.py carry the DuckDB oracles;
these run the same logic through readStream + withWatermark so the
event-time/watermark machinery itself is exercised (tests compare their
output against the batch twins where semantics allow).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_batch_processor_spark.catalog import load_stream


def run_stream_to_memory(
    df: DataFrame, spark: SparkSession, output_mode: str = "append"
) -> DataFrame:
    """Run a (bounded) streaming DataFrame to completion into a memory sink
    and return the collected result as a batch DataFrame."""
    name = f"stream_out_{uuid.uuid4().hex[:10]}"
    query = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="gbp_stream_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def streaming_tumbling_window(
    spark: SparkSession, sf_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """1-hour tumbling count/sum with a watermark — streaming twin of the
    batch ``stream_tumbling_window`` query."""
    ev = load_stream(spark, sf_dir, "events")
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "total_value")
    )
    return run_stream_to_memory(agg, spark, output_mode="append")


def streaming_session_window(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """Native session_window sessionization — streaming twin of the batch
    lag-gap-cumsum ``stream_sessionize`` query."""
    ev = load_stream(spark, sf_dir, "events")
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
    return run_stream_to_memory(agg, spark, output_mode="append")


def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the events STREAM enriched against the static
    customer dimension. Structured Streaming plans the static side as a
    normal batch relation — with a broadcast hint the stream side never
    shuffles (per-micro-batch broadcast hash join), the standard
    enrichment shape for dimension lookups at any scale."""
    from go_batch_processor_spark.catalog import load_table

    ev = load_stream(spark, sf_dir, "events").select("event_id", "user_id")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    joined = ev.join(
        F.broadcast(c), ev.user_id == c.c_custkey, "inner"
    ).select("event_id", "user_id", "c_name", "c_mktsegment")
    return run_stream_to_memory(joined, spark, output_mode="append")


def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream interval join (the streaming twin of the batch
    join_interval_events): clicks and purchases read as two independent
    streams, joined on user_id with the purchase constrained to
    [click_ts, click_ts + 12h], watermarks on BOTH sides so the join
    state is evictable (the time-range condition + watermarks bound how
    long a click waits for purchases — Spark derives the state watermark
    from the interval, the mechanism that keeps stream-stream join state
    finite at 100 TB/day)."""
    clicks = (
        load_stream(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        load_stream(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (clicks.user_id == purchases.p_user_id)
        & (purchases.p_ts >= clicks.c_ts)
        & (purchases.p_ts <= clicks.c_ts + F.expr("INTERVAL 12 HOURS")),
        "inner",
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("c_ts"))).alias(
            "lag_us"
        ),
    )
    return run_stream_to_memory(joined, spark, output_mode="append")


def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once dedup of an at-least-once stream:
    dropDuplicatesWithinWatermark keyed on event_id over a DOUBLED source
    (the same events read as two independent streams and unioned — the
    redelivery model of every at-least-once bus). The watermark bounds the
    dedup state: keys older than the delay are evicted, which is what
    keeps the state store finite on an unbounded stream — the exact
    mechanism (and API) Spark ships for idempotent ingestion.

    The batch oracle is plain DISTINCT: every event exactly once.
    """
    a = load_stream(spark, sf_dir, "events")
    b = load_stream(spark, sf_dir, "events")
    doubled = a.unionAll(b).select("event_id", "user_id", "event_type", "ts")
    deduped = (
        doubled.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    return run_stream_to_memory(deduped, spark, output_mode="append")


def streaming_windowed_topk(
    spark: SparkSession,
    sf_dir: str,
    sink_dir: str,
    k: int = 3,
    watermark: str = "1 hour",
    checkpoint_dir: str | None = None,
):
    """Continuously-maintained top-k (top-k users per 1-hour window by
    event count) — the rank-over-stream pattern Structured Streaming
    cannot express directly (rank is not an incremental aggregate in
    append mode): the streaming half is a plain incremental windowed
    count (fully incremental, watermark-bounded state), and each
    foreachBatch tick re-ranks ONLY the updated frame and overwrites a
    per-window parquet sink partitioned by window start.

    This is the canonical split of a continuous query into its
    incremental core + a tiny non-incremental epilogue: the rank runs
    over |windows|·|users-per-window| updated rows per tick, never the
    stream history. The epilogue rewrites the WHOLE sink each tick
    (static full overwrite) — correct precisely because outputMode is
    "complete", so every tick's batch_df holds every live window; a
    switch to "update" mode would require dynamic partition overwrite
    (spark.sql.sources.partitionOverwriteMode=dynamic) or windows absent
    from a batch would be dropped from the sink.

    A caller-supplied checkpoint_dir enables restart/resume across
    invocations; when omitted a private tempdir is used and removed
    after the availableNow run terminates.

    Returns the final ranked result read back from the sink."""
    from pyspark.sql import Window as W

    ev = load_stream(spark, sf_dir, "events").withWatermark("ts", watermark)
    counts = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n_events"))

    def epilogue(batch_df, batch_id):
        ranked = (
            batch_df.withColumn(
                "rk",
                F.row_number().over(
                    W.partitionBy("w").orderBy(
                        F.col("n_events").desc(), F.col("user_id")
                    )
                ),
            )
            .filter(F.col("rk") <= k)
            .select(
                F.col("w.start").alias("win_start"),
                "user_id",
                "n_events",
                F.col("rk").cast("long").alias("rk"),
            )
        )
        (
            ranked.write.mode("overwrite")
            .partitionBy("win_start")
            .parquet(sink_dir)
        )

    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="gbp_topk_ckpt_")
    try:
        query = (
            counts.writeStream.outputMode("complete")
            .foreachBatch(epilogue)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(sink_dir)
