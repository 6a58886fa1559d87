"""fluvio_duck_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of infinyon/fluvio-duck.

The reference (a Rust DuckDB extension, see /root/reference) exposes three
table functions — ``fluvio_consume``, ``fluvio_topics``, ``fluvio_partitions``
(reference src/lib.rs:37-39) — plus per-record JSON column mapping, offset
algebra, and server-side transform chains, delegating all relational
processing to the host SQL engine.  Here the host engine is Spark SQL /
Catalyst, the sources are DataFrame builders, and the transform chain is a
composition of DataFrame operators.
"""

from fluvio_duck_spark.options import ConsumeOptions, ConsumeOptError, parse_consume_opts
from fluvio_duck_spark.session import get_spark
from fluvio_duck_spark.sinks import copy_to_parquet, register_view, write_bucketed
from fluvio_duck_spark.sources.consume import fluvio_consume
from fluvio_duck_spark.sources.metadata import fluvio_partitions, fluvio_topics
from fluvio_duck_spark.sources.sql import consume_sql
from fluvio_duck_spark.streaming.consume_stream import (
    fluvio_consume_stream,
    run_stream_to_parquet,
    run_stream_to_table,
)

__all__ = [
    "ConsumeOptError",
    "ConsumeOptions",
    "consume_sql",
    "copy_to_parquet",
    "fluvio_consume",
    "fluvio_consume_stream",
    "fluvio_partitions",
    "fluvio_topics",
    "get_spark",
    "parse_consume_opts",
    "register_view",
    "run_stream_to_parquet",
    "run_stream_to_table",
    "write_bucketed",
]

__version__ = "0.1.0"
