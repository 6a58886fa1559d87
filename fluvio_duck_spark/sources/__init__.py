from fluvio_duck_spark.sources.consume import fluvio_consume, record_log
from fluvio_duck_spark.sources.metadata import fluvio_partitions, fluvio_topics
from fluvio_duck_spark.sources.sql import consume_sql

__all__ = [
    "consume_sql",
    "fluvio_consume",
    "fluvio_partitions",
    "fluvio_topics",
    "record_log",
]
