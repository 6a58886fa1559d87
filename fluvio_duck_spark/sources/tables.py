"""Star-schema table access + temp-view registration.

The reference's relational surface is "whatever DuckDB can do over the
registered views" (reference README.md:149-184); here the same role is
played by Spark SQL over these parquet tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # ns-timestamp handling lives in one place
        from fluvio_duck_spark.sources.consume import read_events

        return read_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """CREATE TEMP VIEW per table — mirrors the DuckDB-side view
    pre-registration the driver does for oracle SQL."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
