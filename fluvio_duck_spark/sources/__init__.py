from fluvio_duck_spark.sources.consume import fluvio_consume, record_log
from fluvio_duck_spark.sources.metadata import fluvio_partitions, fluvio_topics

__all__ = ["fluvio_consume", "fluvio_partitions", "fluvio_topics", "record_log"]
