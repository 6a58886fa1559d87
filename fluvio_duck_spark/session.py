"""SparkSession construction tuned for this engine.

Local mode is a stand-in for a real cluster: shuffle partition count tracks
core count, AQE is on so plans re-size at runtime (coalesce tiny shuffle
partitions, skew-join splitting), Arrow is on for any pandas-UDF paths, and
the session timezone is pinned to UTC so timestamp semantics match the
DuckDB correctness oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fluvio-duck-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    # single-JVM local mode defaults to a 1g heap regardless of machine
    # size — with 32 executor threads that is ~32 MB of working heap per
    # task, an OOM trap for any shuffle-heavy operator.  Size the heap
    # like a real executor (env-overridable); only effective when this
    # process launches the JVM (i.e. before any getOrCreate).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # binary multimodal payloads can be MBs each: bound the Arrow batch
        # row count so mapInPandas batches stay memory-safe with media bytes
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
