"""Grid-bucketed interval-overlap join.

``a JOIN b ON a.start < b.end AND b.start < a.end`` is a pure inequality
join — Catalyst can only plan it as a nested-loop (broadcast if one side
is small, cartesian otherwise).  The scale-correct plan when BOTH sides
are large is time-grid bucketization: replicate each interval to the
grid cells it touches, equi-join on the cell (one hash shuffle each
side), and keep the overlap predicate as the residual.

Duplicate elimination is free: a pair overlapping across k shared cells
would match k times, so the join keeps only the cell containing
``max(a.start, b.start)`` — a pure predicate (that cell is shared by
construction), no ``distinct`` shuffle afterwards.

Replication factor = interval length / cell width + 1; pick the cell
width near the typical interval length.  Long outliers replicate more —
cap them upstream or union a broadcast side-channel for the tail.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(ts: Column, width: int) -> Column:
    return F.floor(F.unix_timestamp(ts) / width).cast("long")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    cell_seconds: int,
    keys: list[tuple[str, str]] | None = None,
    how: str = "inner",
    closed: bool = False,
) -> DataFrame:
    """Join rows whose time intervals overlap — half-open ``[start, end)``
    by default (``a.start < b.end AND b.start < a.end``), closed
    ``[start, end]`` with ``closed=True`` (``<=``; what point-like or
    last-event-timestamp interval ends need) — optionally also matching
    on equality ``keys`` [(a_col, b_col), ...].  Column name collisions
    must be resolved by the caller (alias before joining).  ``how`` is
    'inner' only — outer overlap joins need the unmatched sides unioned
    back by the caller."""
    if how != "inner":
        raise ValueError("interval_overlap_join supports inner joins only")
    lt = (lambda x, y: x <= y) if closed else (lambda x, y: x < y)
    w = int(cell_seconds)
    ae = a.withColumn(
        "__cell",
        F.explode(F.sequence(_cell(F.col(a_start), w), _cell(F.col(a_end), w))),
    )
    be = b.withColumn(
        "__cell",
        F.explode(F.sequence(_cell(F.col(b_start), w), _cell(F.col(b_end), w))),
    )
    cond = ae["__cell"] == be["__cell"]
    for ka, kb in keys or []:
        cond &= ae[ka] == be[kb]
    cond &= lt(ae[a_start], be[b_end])
    cond &= lt(be[b_start], ae[a_end])
    # emit each overlapping pair exactly once: in the cell of the later
    # start (always a shared cell — both intervals cover that instant)
    later_start = F.greatest(ae[a_start], be[b_start])
    cond &= ae["__cell"] == _cell(later_start, w)
    return ae.join(be, cond, "inner").drop("__cell")
