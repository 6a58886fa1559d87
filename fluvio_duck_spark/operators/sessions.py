"""Batch sessionization — the bounded-data counterpart of
``streaming/windows.py::session_window_agg`` (Structured Streaming's
``session_window``), for backfills and training-data pipelines that
sessionize historical logs.

Plan shape: one shuffle on the key (the window partition), two in-
partition window passes (lag → boundary flags, running sum → session
ids), then the per-session aggregation reuses the same partitioning —
Catalyst plans a single Exchange for the whole operator because the
groupBy keys are a superset of the window partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "1 hour",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign a session id per (key, run of events with < gap between
    consecutive timestamps).  Returns the input plus ``session_id``
    (dense per key, 1-based in time order).

    ``order_tiebreak`` column makes the ordering total when timestamps
    can tie (deterministic session assignment on reruns)."""
    order_cols = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    gap_expr = F.expr(f"INTERVAL {gap}")
    new_session = (
        F.when(F.lag(ts_col).over(w).isNull(), 1)
        .when(F.col(ts_col) - F.lag(ts_col).over(w) >= gap_expr, 1)
        .otherwise(0)
    )
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "1 hour",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-session spans and sizes: (key, session_id, start, end, n) with
    ``end = last event + gap`` matching Structured Streaming's
    half-open session-window semantics."""
    s = sessionize(df, key_col, ts_col, gap, order_tiebreak)
    return s.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        (F.max(ts_col) + F.expr(f"INTERVAL {gap}")).alias("session_end"),
        F.count("*").alias("n"),
    )
