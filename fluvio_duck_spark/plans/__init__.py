"""Physical-plan inspection helpers.

The engine's performance contract is enforced as *plan-shape assertions*
(SCALE.md's audit table): a query claims "one shuffle, dims broadcast,
no Python in the hot path" and a test checks the executed plan says so.
These helpers are the shared vocabulary for those checks — no custom
Catalyst rules live here (SURVEY §4: nothing in the reference's surface
needs one; the builders construct pushdown-friendly plans and Catalyst
does the rest).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Executed physical plan text (runs AQE re-planning if the query has
    already been executed; call after an action for final-plan audits)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text — each operator printed once with an id,
    so node counts are not inflated by AQE's repeated subtree printing."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def plan_ops(df: DataFrame) -> Counter:
    """Operator-name → count from the formatted plan (e.g. ``Exchange``,
    ``BroadcastHashJoin``, ``ArrowEvalPython``, ``Scan parquet``).
    Codegen-id suffixes are stripped so counts group by operator."""
    ops = Counter()
    for line in formatted_plan(df).splitlines():
        m = re.match(r"^\s*\(\d+\)\s+(.*)$", line)
        if m:
            ops[m.group(1).split(" [")[0].strip()] += 1
    return ops


def scan_selected_partitions(df: DataFrame) -> tuple[int, str]:
    """(number of Hive-style partition directories the file scan will
    actually read, partition-filter text) for a single-scan plan.
    ``selectedPartitions`` is resolved at physical planning with the
    partition filters applied, so this is the *physical* pruning proof —
    a pruned probe returns 1/n_cells of the directories, not a plan
    string claim."""
    leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    # Spark 4: selectedPartitions is a ScanFileListing
    n = leaf.selectedPartitions().partitionCount()
    return n, leaf.partitionFilters().toString()


def assert_plan(df: DataFrame, **bounds: int) -> Counter:
    """Assert upper bounds on operator counts, e.g.
    ``assert_plan(df, Exchange=1, SortMergeJoin=0)``.  Underscores in
    keyword names stand for spaces (``Scan_parquet=1``).  Returns the
    counts for further checks."""
    ops = plan_ops(df)
    for name, bound in bounds.items():
        key = name.replace("_", " ")
        actual = ops.get(key, 0)
        assert actual <= bound, (
            f"plan has {actual} × {key!r}, expected ≤ {bound}:\n{formatted_plan(df)}"
        )
    return ops


def join_cardinality_audit(left, right, lkey: str, rkey: str, label: str):
    """Optimizer-statistics audit: the textbook equi-join cardinality
    estimate |A|·|B| / max(ndv_A, ndv_B) next to the ACTUAL join count —
    the sanity check a planner's statistics pipeline runs to know whether
    its NDV stats predict reality (for FK joins the two should agree
    almost exactly; a big ratio flags stale stats or key skew).  Exact
    NDVs on purpose: the audit is the ground truth the approximate
    ANALYZE path is judged against."""
    from pyspark.sql import functions as F

    a = left.agg(
        F.count(lkey).alias("n_a"), F.count_distinct(lkey).alias("ndv_a")
    )
    b = right.agg(
        F.count(rkey).alias("n_b"), F.count_distinct(rkey).alias("ndv_b")
    )
    actual = (
        left.join(right, left[lkey] == right[rkey])
        .agg(F.count("*").alias("actual"))
    )
    est = F.floor(
        F.col("n_a").cast("double") * F.col("n_b")
        / F.greatest("ndv_a", "ndv_b")
    ).cast("long")
    return (
        a.crossJoin(b).crossJoin(actual)
        .select(
            F.lit(label).alias("join_name"),
            "n_a", "ndv_a", "n_b", "ndv_b",
            est.alias("est_rows"),
            "actual",
            F.round(F.col("actual") / est.cast("double"), 6).alias("actual_over_est"),
        )
    )
