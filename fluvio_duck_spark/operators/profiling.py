"""Column profiling — the data-quality summary a pipeline runs before
trusting a new drop of data (null rates, cardinalities, value bounds).
The reference's closest surface is eyeballing ``fluvio_consume`` output
through DuckDB `SUMMARIZE`; this is the distributed, single-pass form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sql_str(s: str) -> str:
    """A safely-quoted SQL string literal for the column label."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: (col_name, n_rows, n_null,
    n_distinct, min_val, max_val) with bounds rendered as strings so
    heterogeneous column types stack into one result.

    Single corpus pass: every metric for every column computes in ONE
    aggregation (multiple distinct aggregates → Catalyst's Expand
    rewrite, still one shuffle); the per-column long form is a stack()
    over the 1-row result — no per-column scans, unlike the naive
    UNION-ALL-of-aggregates form the oracle uses.

    ``n_distinct`` is exact; swap in approx_count_distinct at corpus
    scale if a 2% error buys the cheaper sketch path.
    """
    # positional internal aliases: column names never appear inside the
    # stack() SQL text, so dots/spaces/quotes in source columns are safe
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for i, c in enumerate(cols):
        col = df[c]
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"_c{i}_nnull"),
            F.countDistinct(col).alias(f"_c{i}_ndist"),
            F.min(col).cast("string").alias(f"_c{i}_min"),
            F.max(col).cast("string").alias(f"_c{i}_max"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"{_sql_str(c)}, _c{i}_nnull, _c{i}_ndist, _c{i}_min, _c{i}_max"
        for i, c in enumerate(cols)
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_null, n_distinct, min_val, max_val)",
        "_rows AS n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")
