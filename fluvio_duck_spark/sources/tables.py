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


#: (path, mtime) → inferred parquet schema.  ``spark.read.parquet``
#: without a schema re-runs footer inference on the driver per call
#: (~135 ms measured) — and nearly every registered query starts with
#: 1-5 ``load()`` calls, so this was the single largest uniform
#: construction cost in the bench.  The schema is static table METADATA
#: (the role a catalog/metastore plays in production — guide §6 lists
#: avoiding repeated file-level metadata work as a core reason table
#: formats exist); the mtime key invalidates on rewrite.  No row data
#: is cached, and the pinned schema is byte-identical to what inference
#: would return (it IS the cached inference result).
_SCHEMA_CACHE: dict[tuple[str, float], object] = {}


def table_schema(spark: SparkSession, path: str):
    key = (path, os.path.getmtime(path))
    if key not in _SCHEMA_CACHE:
        _SCHEMA_CACHE[key] = spark.read.parquet(path).schema
    return _SCHEMA_CACHE[key]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # ns-timestamp handling lives in one place
        from fluvio_duck_spark.sources.consume import read_events

        return read_events(spark, sf_dir)
    path = os.path.join(sf_dir, f"{name}.parquet")
    return spark.read.schema(table_schema(spark, path)).parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """CREATE TEMP VIEW per table — mirrors the DuckDB-side view
    pre-registration the driver does for oracle SQL."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
