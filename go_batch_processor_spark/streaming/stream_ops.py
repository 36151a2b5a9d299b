"""True Structured Streaming variants of the §2.2.j operators.

The batch twins in operators/streaming_batch.py carry the DuckDB oracles;
these run the same logic through readStream + withWatermark so the
event-time/watermark machinery itself is exercised (tests compare their
output against the batch twins where semantics allow).
"""

from __future__ import annotations

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
