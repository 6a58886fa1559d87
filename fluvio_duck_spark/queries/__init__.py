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


#: Queries with a green row in the round-1 driver correctness file
#: (CORRECTNESS_r01.json).  The driver's snapshot covered only these 50
#: (see QUERIES.md for the live registry count), so ``all_queries()`` orders
#: the *unverified* remainder first: if the driver's next run is
#: time-bounded, it reaches the never-verified entries before
#: re-checking known-green ones.
_DRIVER_VERIFIED_R01 = frozenset({
    "agg_approx", "agg_cube", "agg_distinct",
    "agg_filtered_revenue", "agg_grouping_sets", "agg_market_share",
    "agg_part_value_share", "agg_pricing_summary", "agg_rollup",
    "agg_salted_hotkey", "agg_supplier_cnt", "consume_beginning_rows",
    "consume_compact_latest", "consume_compact_tombstones", "consume_default_end_empty",
    "consume_head_rows", "consume_heavy_hitters", "consume_mapped_typed",
    "consume_partition_select", "consume_smartmodule_filter", "consume_sql_avg_by_route",
    "consume_sql_topic_leo", "consume_start_end", "consume_tail_default",
    "consume_topic_tail", "consume_transform_chain", "consume_transform_jolt",
    "fluvio_partitions", "fluvio_topics", "join_asof",
    "join_asof_broadcast", "join_asof_forward", "join_asof_tolerance",
    "join_disjunctive_bands", "join_excess_shippers", "join_min_cost_supplier",
    "join_order_count_dist", "join_profit_by_nation_year", "join_range_band",
    "join_returned_top_customers", "join_revenue_by_nation", "join_session_error_overlap",
    "join_shipping_priority", "join_top_supplier", "join_volume_shipping",
    "join_waiting_suppliers", "partitions_sum_leo", "scd2_intervals",
    "sql_passthrough", "unpivot_metrics",
})


def all_queries() -> dict[str, QuerySpec]:
    from fluvio_duck_spark.queries import (
        consume_queries,
        llm,
        multimodal_queries,
        pipeline,
        quality,
        relational,
        streaming_queries,
    )

    merged: dict[str, QuerySpec] = {}
    for module in (consume_queries, relational, llm, streaming_queries,
                   multimodal_queries, pipeline, quality):
        overlap = merged.keys() & module.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(module.QUERIES)
    # Never-driver-verified entries first (see _DRIVER_VERIFIED_R01).
    ordered = {k: v for k, v in merged.items() if k not in _DRIVER_VERIFIED_R01}
    ordered.update((k, v) for k, v in merged.items() if k in _DRIVER_VERIFIED_R01)
    return ordered
