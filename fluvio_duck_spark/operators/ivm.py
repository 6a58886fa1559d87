"""Incremental view maintenance (IVM) for aggregate views.

What a materialized-view engine does under ``REFRESH INCREMENTALLY``:
given an aggregate view's mergeable state, a batch of inserted rows and
a batch of retracted rows, produce the updated view WITHOUT rescanning
the base table — update cost is ∝ |Δ| plus the affected groups, which
is the entire point of maintaining a view over 100 TB.

Measure algebra:
* ``count`` / ``sum`` are ADDITIVE: state merges with agg(Δ⁺) and
  un-merges with agg(Δ⁻) exactly (sums accumulate in DECIMAL, so
  retraction is exact, not a float cancellation hazard).
* ``min`` / ``max`` are NOT retraction-safe (removing the current min
  needs the runner-up), so affected groups — only those present in the
  delta — recompute from the post-delta base via a key semi-join: a
  pruned scan of the affected slice, never the full table.
* Group liveness is tracked by an INTERNAL ``__n`` = count(*) measure
  the state always carries (ADVICE r3): groups leave the view exactly
  when their row count reaches 0.  A user-declared ``count`` measure is
  a VALUE count (``COUNT(col)`` skips NULLs) and is never used for the
  exit decision — a count over a nullable column must not evict a group
  that still has rows, nor may a view with no count measure keep zombie
  groups (zero sums / stale min-max) after full retraction.

Determinism: merges are commutative DECIMAL/long arithmetic; the
recompute is a plain agg — partitioning-independent by construction.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ("count", "sum", "min", "max")

#: internal row-count measure: always present in view state, drives the
#: group-exit filter.  count(*) semantics (rows, not non-NULL values).
ROWCOUNT = "__n"


@dataclass(frozen=True)
class IvmMeasure:
    name: str
    col: str
    kind: str
    scale: int = 2  # DECIMAL scale for exact additive sums

    def __post_init__(self) -> None:
        if self.kind not in KINDS:
            raise ValueError(f"unknown IVM measure kind {self.kind!r}")
        if self.name == ROWCOUNT:
            raise ValueError(f"{ROWCOUNT!r} is reserved for internal state")

    @property
    def _dec(self) -> str:
        return f"decimal(28,{self.scale})"


def _aggs(measures: list[IvmMeasure]) -> list:
    out = []
    for m in measures:
        c = F.col(m.col)
        if m.kind == "count":
            out.append(F.count(c).alias(m.name))
        elif m.kind == "sum":
            out.append(F.sum(c.cast(m._dec)).alias(m.name))
        elif m.kind == "min":
            out.append(F.min(c).alias(m.name))
        else:
            out.append(F.max(c).alias(m.name))
    return out


def agg_state(df: DataFrame, keys: list[str], measures: list[IvmMeasure]) -> DataFrame:
    """The view's mergeable state: one row per key group.  Carries the
    internal ``__n`` row count alongside the declared measures — part of
    the state contract so retraction can decide group exit exactly."""
    return df.groupBy(*keys).agg(
        *_aggs(measures), F.count(F.lit(1)).alias(ROWCOUNT)
    )


def apply_delta(
    view: DataFrame,
    base_after: DataFrame,
    delta_plus: DataFrame,
    delta_minus: DataFrame,
    keys: list[str],
    measures: list[IvmMeasure],
) -> DataFrame:
    """Updated view state after applying Δ⁺ (inserts) and Δ⁻
    (retractions).  ``base_after`` is the post-delta base relation,
    consulted ONLY for min/max recomputes of affected groups (key
    semi-join → pruned scan).  Output is itself valid state (it keeps
    ``__n``), so delta applications chain."""
    additive = [m for m in measures if m.kind in ("count", "sum")]
    order_stats = [m for m in measures if m.kind in ("min", "max")]

    dp = agg_state(delta_plus, keys, measures).alias("dp")
    dm = agg_state(delta_minus, keys, measures).alias("dm")
    v = view.alias("v")

    merged = v.join(dp, keys, "full_outer").join(dm, keys, "full_outer")
    cols = [F.col(k) for k in keys]
    zero_n = F.lit(0).cast("long")
    for m in additive:
        zero = zero_n if m.kind == "count" else F.lit(0).cast(m._dec)
        cols.append(
            (
                F.coalesce(F.col(f"v.{m.name}"), zero)
                + F.coalesce(F.col(f"dp.{m.name}"), zero)
                - F.coalesce(F.col(f"dm.{m.name}"), zero)
            ).alias(m.name)
        )
    for m in order_stats:
        cols.append(F.col(f"v.{m.name}").alias(m.name))  # placeholder
    cols.append(
        (
            F.coalesce(F.col(f"v.{ROWCOUNT}"), zero_n)
            + F.coalesce(F.col(f"dp.{ROWCOUNT}"), zero_n)
            - F.coalesce(F.col(f"dm.{ROWCOUNT}"), zero_n)
        ).alias(ROWCOUNT)
    )
    # group exit: the internal count(*) reaches zero — unconditional,
    # never a user count (which may skip NULLs) and never absent
    out = merged.select(*cols).filter(F.col(ROWCOUNT) > 0)

    if order_stats:
        affected = (
            delta_plus.select(*keys).unionAll(delta_minus.select(*keys)).distinct()
        )
        recomputed = (
            base_after.join(F.broadcast(affected), keys, "left_semi")
            .groupBy(*keys)
            .agg(*_aggs(order_stats))
        )
        r = recomputed.alias("r")
        out = out.alias("o").join(r, keys, "left").select(
            *[F.col(k) for k in keys],
            *[
                F.col(f"o.{m.name}").alias(m.name)
                for m in additive
            ],
            *[
                F.coalesce(F.col(f"r.{m.name}"), F.col(f"o.{m.name}"))
                .alias(m.name)
                for m in order_stats
            ],
            F.col(f"o.{ROWCOUNT}").alias(ROWCOUNT),
        )
    return out
