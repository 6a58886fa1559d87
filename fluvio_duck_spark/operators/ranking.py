"""Distributed exact global ranking and quantile binning.

A bare ``row_number() OVER (ORDER BY …)`` collapses the whole dataset
into ONE reducer (Spark plans a single-partition sort) — the canonical
global-ordering anti-pattern.  The scalable shape is the classic
range-partitioned rank:

1. ``repartitionByRange`` on the order key — ONE data-sized exchange,
   each partition holds a contiguous key range;
2. ``sortWithinPartitions`` — per-partition sort, no further movement;
3. per-partition row numbers from ``monotonically_increasing_id`` (its
   per-row counter is consecutive inside a task) minus the partition's
   own minimum id;
4. global offset = exclusive running sum of per-partition counts — a
   P-row aggregate (P = #partitions), windowed on the driver-sized side
   and broadcast-joined back.

The only data-sized exchange is the range partitioner; everything else
touches P rows.  Correctness does not depend on where the sampled range
boundaries land, because ranks are derived from the actual sorted order,
not the boundary positions — a skewed sample costs balance, never
correctness.  Ties must be broken by a unique column in ``order_cols``
or ranks (and any downstream binning) become nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    n_partitions: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """Attach a dense 1-based global rank by ``order_cols`` (which must
    end in a tie-breaking unique key) without a single-partition sort."""
    ranged = df.repartitionByRange(n_partitions, *order_cols).sortWithinPartitions(
        *order_cols
    )
    tagged = ranged.select(
        "*",
        F.spark_partition_id().alias("__pid"),
        F.monotonically_increasing_id().alias("__mid"),
    )
    per_part = tagged.groupBy("__pid").agg(
        F.min("__mid").alias("__mmin"), F.count("*").alias("__cnt")
    )
    # exclusive cumsum over ≤ n_partitions rows — the single-partition
    # window here is fine: its input is P rows, not the data
    offs = per_part.select(
        "__pid",
        "__mmin",
        (
            F.sum("__cnt").over(
                W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
            )
        ).alias("__off"),
    ).fillna({"__off": 0})
    return (
        tagged.join(F.broadcast(offs), "__pid")
        .withColumn(
            rank_col, (F.col("__mid") - F.col("__mmin") + 1 + F.col("__off"))
        )
        .drop("__pid", "__mid", "__mmin", "__off")
    )


def quantile_bins(
    df: DataFrame,
    order_cols: list[str],
    n_bins: int = 10,
    n_partitions: int = 32,
    bin_col: str = "bin",
) -> DataFrame:
    """Exact global quantile bin per row: bin = floor((rank-1)·n/N) + 1,
    the uniform split of the true sorted order (bins differ by ≤1 row).
    One count aggregate supplies N as a 1-row crossJoin — no driver
    action, no vanilla NTILE single-reducer sort."""
    n_total = df.agg(F.count("*").alias("__n"))
    ranked = global_rank(df, order_cols, n_partitions, rank_col="__rank")
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .withColumn(
            bin_col,
            (
                F.floor(
                    (F.col("__rank") - 1) * F.lit(n_bins) / F.col("__n")
                ).cast("int")
                + 1
            ),
        )
        .drop("__rank", "__n")
    )
