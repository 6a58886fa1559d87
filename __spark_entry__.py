"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — the SURVEY §2 operator inventory, each
implemented Spark-first in fluvio_duck_spark and paired with an ANSI-SQL
DuckDB oracle (see fluvio_duck_spark/queries/).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference README's transit demo shape
    (README.md:152-184) on the events stand-in — consume the topic from the
    beginning with a typed JSON column mapping, then aggregate over the
    mapped column grouped by a route-like derived key."""
    from pyspark.sql import functions as F

    from fluvio_duck_spark.sources.consume import fluvio_consume

    sf_dir = "/root/testdata/sf0.001"
    mapped = fluvio_consume(
        spark, "events -A -B --rows 1000000 -c k:i=k -c kd:d=k", sf_dir=sf_dir
    )
    return (
        mapped.groupBy((F.col("k") % 10).alias("route"))
        .agg(
            F.count("*").alias("n"),
            F.avg("kd").alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("route")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fluvio_duck_spark.queries import all_queries

    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from fluvio_duck_spark.queries import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
