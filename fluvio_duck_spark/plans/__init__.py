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
