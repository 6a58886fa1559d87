"""Skew-mitigation joins/aggregations — 100 TB survival patterns.

AQE's skew-join splitting (on in session.py) handles sort-merge skew at
runtime, but two cases still need explicit salting on a real cluster:

* joining a skewed fact key against a non-broadcastable dimension (AQE
  can split the fact side's partitions but every split still reads the
  same hot dim partition), and
* high-cardinality aggregations where one key dominates (a single reducer
  receives the hot key's entire volume).

``salted_join`` replicates the dim side n_salts times (dim is the small
side — replication is bounded) and scatters the fact side's hot keys
uniformly across the salt space, so the hot key's rows land on n_salts
reducers instead of one.  ``salted_agg_count`` is the two-phase
aggregation: partial agg on (key, salt) → final agg on key; the second
shuffle carries one row per (key, salt), i.e. nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dim side replicated across ``n_salts`` salt
    values and the fact side salted by a uniform hash of its row — the
    hot-key shuffle partition is split n_salts ways.

    The salt column is derived from ``rand``-free deterministic hashing of
    the fact row's full key set (monotonically_increasing_id would break
    retry idempotence on a cluster; xxhash64 of the row content is stable
    across task retries)."""
    fact_salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    ).cast("int")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    dim_rep = dim.withColumn("__salt", salts)
    return (
        fact.withColumn("__salt", fact_salt)
        .join(dim_rep, [key, "__salt"], how)
        .drop("__salt")
    )


def salted_agg_count(
    df: DataFrame, key: str, n_salts: int = 8, count_alias: str = "n"
) -> DataFrame:
    """COUNT(*) BY key as two-phase salted aggregation: shuffle 1 on
    (key, salt) spreads a hot key over n_salts reducers; shuffle 2 carries
    n_salts rows per key.  Semantically identical to a plain groupBy —
    use when one key holds >~1/partitions of the data.

    (For built-in aggregates Spark's partial aggregation usually makes
    this unnecessary — map-side combine already bounds reducer input by
    distinct-keys-per-task.  The pattern matters for aggregates without
    partial implementations, e.g. collect_list or exact percentiles.)"""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias(count_alias))


def explain_shuffle_count(df: DataFrame) -> int:
    """Count Exchange nodes in the executed plan — used by tests to assert
    an operator's shuffle budget."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")
