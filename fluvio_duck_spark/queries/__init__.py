"""Query registry: every implemented operator from SURVEY.md §2 appears here
as a named (spark_fn, oracle_sql) pair.  The driver runs the Spark side and
the DuckDB oracle side-by-side and hash-compares results (BASELINE.md t2).

Submodules register into their own ``QUERIES`` dict; ``all_queries()``
merges them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


def all_queries() -> dict[str, QuerySpec]:
    from fluvio_duck_spark.queries import (
        consume_queries,
        llm,
        multimodal_queries,
        relational,
        streaming_queries,
    )

    merged: dict[str, QuerySpec] = {}
    for module in (consume_queries, relational, llm, streaming_queries,
                   multimodal_queries):
        overlap = merged.keys() & module.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(module.QUERIES)
    return merged
