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

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from go_batch_processor_spark.catalog import load_stream
from go_batch_processor_spark.streaming.stream_ops import run_stream_to_memory

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
