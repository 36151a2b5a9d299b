"""ForeachBatchPipeline: the reference pipeline semantics (R5-R9) on
Structured Streaming — source -> transform -> finalize with an error channel,
riding Spark's own micro-batch scheduler (SURVEY.md §3.4).

Micro-batches within one streaming query are serialized by Spark (deliberate
semantic delta from the reference's concurrent batches, SURVEY.md §7.4);
parallelism lives inside each batch as tasks.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from go_batch_processor_spark.catalog import load_stream


class ForeachBatchPipeline:
    """Bounded-stream pipeline: readStream source -> processor ->
    foreachBatch sink writer -> finalizer callback per micro-batch."""

    def __init__(
        self,
        spark: SparkSession,
        source: DataFrame,
        processor: Callable[[DataFrame], DataFrame],
        sink_path: str,
        finalizer: Optional[
            Callable[[Optional[DataFrame], Optional[Exception]], None]
        ] = None,
    ):
        self._spark = spark
        self._source = source
        self._processor = processor
        self._sink_path = sink_path
        self._finalizer = finalizer
        self.batches_seen = 0
        self.errors: list[Exception] = []

    def _handle_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.batches_seen += 1
        try:
            out = self._processor(batch_df)
            self._write_idempotent(out, epoch_id)
            if self._finalizer:
                self._finalizer(out, None)
        except Exception as exc:  # error channel to the finalizer (R8/R9)
            self.errors.append(exc)
            if self._finalizer:
                self._finalizer(None, exc)

    def _write_idempotent(self, out: DataFrame, epoch_id: int) -> None:
        """Exactly-once sink: one overwritten directory per epoch, so a
        replayed micro-batch (foreachBatch may re-deliver an epoch after a
        failure) rewrites its own partition instead of appending duplicates.
        This epoch-keyed layout + Spark's offset log is the standard
        end-to-end exactly-once recipe for non-transactional sinks."""
        out.write.mode("overwrite").parquet(
            os.path.join(self._sink_path, f"epoch={epoch_id}")
        )

    def run_available_now(self) -> None:
        """Process everything currently in the source, then stop — the
        bounded twin of the reference's poll-until-Stop loop (R5/R11)."""
        checkpoint = tempfile.mkdtemp(prefix="gbp_fbp_ckpt_")
        query = (
            self._source.writeStream.foreachBatch(self._handle_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the events fixture (file-stream parquet)."""
    return load_stream(spark, sf_dir, "events")
