"""Sinks — the reference's documented output paths (SURVEY §2.2).

K1: parquet export — the reference delegates to DuckDB ``COPY ... TO ...
(FORMAT 'parquet')`` (reference README.md:188-205); here it's the native
distributed parquet writer.
K2: view registration — ``CREATE VIEW t AS SELECT * FROM fluvio_consume(...)``
(reference README.md:152-156) → a Spark temp view.

There is no write-back-to-Fluvio producer in the reference (no producer
code anywhere in its src/) — deliberately not implemented here either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def copy_to_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    coalesce: int | None = None,
) -> None:
    """K1 — ``COPY (...) TO 'path' (FORMAT 'parquet')`` equivalent.

    ``partition_by`` / ``coalesce`` are scale knobs the reference lacks:
    at 100 TB you partition output by a pruning key rather than emit one
    directory of unsplittable files.
    """
    if coalesce is not None:
        df = df.coalesce(coalesce)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def register_view(df: DataFrame, name: str) -> DataFrame:
    """K2 — temp-view registration; returns the df for chaining."""
    df.createOrReplaceTempView(name)
    return df
