"""2-D skyline (Pareto-frontier) operator.

Rows not dominated on a (minimize, maximize) criteria pair — e.g. parts
that are Pareto-optimal on (price low, size high).  A row is dominated
if some other row is ≤ on the minimized column and ≥ on the maximized
column with at least one strict inequality; ties on BOTH columns are
mutually non-dominating, so duplicate frontier points all survive.

Design for 100 TB — the naive form is an all-pairs NOT EXISTS (n²).
The scalable identity: every global skyline point is also a skyline
point of ANY subset containing it, so

  1. per-partition local skyline (sort + one linear sweep inside an
     Arrow batch — no shuffle, output bounded by the frontier size),
  2. global skyline of the union of local frontiers (k-bounded — runs
     the same sweep on one coalesced partition, like a top-k merge).

The result is the exact skyline, independent of partitioning; the
oracle checks it against the quadratic NOT EXISTS definition.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _sweep(pdf: pd.DataFrame, min_col: str, max_col: str) -> pd.DataFrame:
    """Exact skyline of one in-memory frame: sort by the minimized
    column, keep rows beating the best maximized value seen at strictly
    lower cost; within one cost tier only the tier max survives (ties on
    the pair all survive)."""
    if pdf.empty:
        return pdf
    tier_max = pdf.groupby(min_col)[max_col].transform("max")
    # best maximized value among strictly-cheaper tiers
    tiers = pdf.groupby(min_col, sort=True)[max_col].max()
    best_before = tiers.cummax().shift(1)  # NaN for the cheapest tier
    bb = pdf[min_col].map(best_before)
    keep = (pdf[max_col] == tier_max) & (bb.isna() | (pdf[max_col] > bb))
    return pdf[keep]


def skyline2d(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Exact Pareto frontier minimizing ``min_col``, maximizing
    ``max_col``; all original columns ride through."""
    schema = df.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _sweep(pdf, min_col, max_col)

    candidates = df.mapInPandas(local, schema=schema)

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [b for b in batches if not b.empty]
        if not frames:
            return
        yield _sweep(pd.concat(frames), min_col, max_col)

    # frontier-of-frontiers is small: one partition, one final sweep.
    # repartition(1), NOT coalesce(1) — coalesce would fuse upstream and
    # run the whole scan + local sweep in a single task; the shuffle here
    # moves only the k-bounded candidate frontiers.
    return candidates.repartition(1).mapInPandas(merge, schema=schema)
