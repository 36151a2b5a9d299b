from go_batch_processor_spark.streaming.stream_ops import (
    run_stream_to_memory,
    streaming_session_window,
    streaming_tumbling_window,
)

__all__ = [
    "run_stream_to_memory",
    "streaming_session_window",
    "streaming_tumbling_window",
]
