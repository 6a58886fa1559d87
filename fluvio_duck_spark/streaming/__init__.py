from fluvio_duck_spark.streaming.consume_stream import (
    fluvio_consume_stream,
    run_stream_to_table,
)
from fluvio_duck_spark.streaming.windows import (
    session_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "fluvio_consume_stream",
    "run_stream_to_table",
    "session_window_agg",
    "tumbling_window_agg",
]
