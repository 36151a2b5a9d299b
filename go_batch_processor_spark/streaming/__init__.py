from go_batch_processor_spark.streaming.stream_ops import (
    run_stream_to_memory,
    streaming_session_window,
    streaming_tumbling_window,
)
from go_batch_processor_spark.streaming.stateful import (
    rocksdb_state_store,
    run_attribution_bucketed_once,
    run_attribution_once,
    run_funnel_bucketed_once,
    run_heavy_hitters_once,
    run_session_topk_once,
    run_user_running_stats_once,
    streaming_user_running_stats,
    streaming_user_running_stats_tws,
)

__all__ = [
    "rocksdb_state_store",
    "run_attribution_bucketed_once",
    "run_attribution_once",
    "run_funnel_bucketed_once",
    "run_heavy_hitters_once",
    "run_stream_to_memory",
    "run_session_topk_once",
    "run_user_running_stats_once",
    "streaming_session_window",
    "streaming_tumbling_window",
    "streaming_user_running_stats",
    "streaming_user_running_stats_tws",
]
