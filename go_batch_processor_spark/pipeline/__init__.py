from go_batch_processor_spark.pipeline.batch_pipeline import (
    BatchPipeline,
    BatchTimeoutError,
    FnFinalizer,
    FnProcessor,
    FnSupplier,
    DEFAULT_NO_BATCH_SLEEP_MS,
    DEFAULT_PROCESSOR_TIMEOUT_MS,
)
from go_batch_processor_spark.pipeline.foreach_batch import (
    ForeachBatchPipeline,
    events_stream,
)

__all__ = [
    "BatchPipeline",
    "BatchTimeoutError",
    "FnFinalizer",
    "FnProcessor",
    "FnSupplier",
    "ForeachBatchPipeline",
    "events_stream",
    "DEFAULT_NO_BATCH_SLEEP_MS",
    "DEFAULT_PROCESSOR_TIMEOUT_MS",
]
