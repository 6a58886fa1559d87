from fluvio_duck_spark.streaming.consume_stream import (
    event_stream,
    fluvio_consume_stream,
    record_log_stream,
    run_stream_to_parquet,
    run_stream_to_table,
)
from fluvio_duck_spark.streaming.stateful import aggregate_fold_stream
from fluvio_duck_spark.streaming.windows import (
    session_window_agg,
    stream_dedup_keys,
    tumbling_window_agg,
)

__all__ = [
    "aggregate_fold_stream",
    "event_stream",
    "fluvio_consume_stream",
    "record_log_stream",
    "run_stream_to_parquet",
    "run_stream_to_table",
    "session_window_agg",
    "stream_dedup_keys",
    "tumbling_window_agg",
]
