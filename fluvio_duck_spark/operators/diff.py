"""Snapshot diff: generate a change feed by comparing two keyed snapshots.

The inverse of ``operators/merge.py`` (which APPLIES a change feed):
given yesterday's landed snapshot and today's, emit one row per changed
key classified added / removed / changed — the audit artifact every
incremental pipeline wants before it trusts an ingest, and the input a
downstream CDC consumer replays.

Design for 100 TB: ONE full-outer join on the key; equality of the
compared columns is a single codegen conjunction, so unchanged rows
(the overwhelming majority of a daily diff) are filtered before the
result ever shuffles again.  Partitioning-independent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Rows: (key, change ∈ added|removed|changed, one ``old_``/``new_``
    pair per compared column).  Unchanged keys are dropped.

    NULL-safe comparison (``eqNullSafe``): a column going NULL→value or
    value→NULL counts as changed, NULL→NULL does not.
    """
    compare_cols = compare_cols or [c for c in old.columns if c != key]
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")

    has_old = F.col(f"o.{key}").isNotNull()
    has_new = F.col(f"n.{key}").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        same = eq if same is None else (same & eq)

    change = (
        F.when(~has_old, F.lit("added"))
        .when(~has_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )  # unchanged -> NULL -> filtered

    out = [F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
           change.alias("change")]
    for c in compare_cols:
        out.append(F.col(f"o.{c}").alias(f"old_{c}"))
        out.append(F.col(f"n.{c}").alias(f"new_{c}"))
    return joined.select(*out).filter(F.col("change").isNotNull())
