"""As-of and range joins — temporal operators the reference delegates to
its SQL engine (reference SURVEY §2.6: zero join code in src/; joins over
fluvio-sourced views are the engine's job, reference README.md:149-184).
DuckDB ships ASOF JOIN natively, so a user of the reference can run one;
Spark has no built-in, so we provide the scale-correct composition.

``asof_join`` uses the union + ordered-window merge instead of the naive
inequality join + dedup:

* naive plan: ``left JOIN right ON key AND r.t <= l.t`` explodes to
  |left| x |matching right| intermediate rows, then a window prunes them —
  at 100 TB the intermediate is the bottleneck.
* this plan: union both sides (map-only), one shuffle on ``key``, one
  in-partition sort by (t, side), and a running ``last(value,
  ignorenulls=True)`` carries each right row forward to the left rows it
  is as-of for.  Intermediate size = |left| + |right|, the theoretical
  minimum, and the single shuffle is the same one any grouped operator
  over ``key`` would pay.

``range_band_join`` is the broadcast-nested-loop banding join: the band
table is tiny by construction, so the correct 100 TB plan is "broadcast
the bands, keep the fact side map-only" — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the right row with the
    greatest ``right_time`` <= ``left_time`` (direction='backward',
    inclusive) or the smallest ``right_time`` >= ``left_time``
    (direction='forward') sharing the join key.  Left rows with no
    matching right row get NULLs (left-outer semantics, matching DuckDB
    ``ASOF LEFT JOIN``).  Forward is the same union+window merge with the
    time sort reversed — identical shuffle/intermediate cost.

    Right side should be unique per (key, time) — pre-aggregate if not,
    or the carried values are an arbitrary survivor of the tie.

    ``tolerance_seconds`` (pandas ``merge_asof`` tolerance semantics)
    bounds the match window: a right row further than the tolerance from
    the left timestamp yields NULLs instead.  Implemented by carrying the
    matched right time through the same merge and null-masking after —
    no extra shuffle, identical plan cost.  Works for TIMESTAMP time
    columns (gap in seconds) and numeric ones (gap in column units).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")

    lcols = left.columns
    # side 0 sorts before side 1 at equal timestamps, so a right row with
    # right_time == left_time is visible to that left row (inclusive <=).
    carry = list(value_cols)
    if tolerance_seconds is not None:
        carry.append("__mt")  # the matched right row's own timestamp
        right = right.withColumn("__mt", F.col(right_time))
    l_tagged = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carry],
    )
    r_tagged = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in carry],
    )
    merged = l_tagged.unionByName(r_tagged)

    # backward scans time ascending; forward scans descending.  Either way
    # right rows (side 0) sort before left rows at equal __t, so an exact
    # timestamp match is visible to its left row (inclusive <= / >=).
    t_order = F.asc("__t") if direction == "backward" else F.desc("__t")
    w = (
        Window.partitionBy("__k")
        .orderBy(t_order, F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c) for c in carry
    ]
    out = (
        merged.select("__side", *lcols, *carried)
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
    if tolerance_seconds is None:
        return out
    if isinstance(
        left.schema[left_time].dataType, (T.TimestampType, T.TimestampNTZType)
    ):
        # cast NTZ → TZ (session-zone) so unix_micros accepts both flavors;
        # both sides shift identically, so the gap is unaffected.
        gap = (
            F.abs(
                F.unix_micros(F.col(left_time).cast("timestamp"))
                - F.unix_micros(F.col("__mt").cast("timestamp"))
            )
            / F.lit(1_000_000.0)
        )
    else:
        gap = F.abs(F.col(left_time) - F.col("__mt"))
    ok = F.col("__mt").isNotNull() & (gap <= F.lit(float(tolerance_seconds)))
    return out.select(
        *lcols, *[F.when(ok, F.col(c)).alias(c) for c in value_cols]
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof(direction=
    'nearest')``): each left row takes the right row with the smallest
    absolute time gap, ties to the backward (at-or-before) side.

    Same union merge as ``asof_join`` with BOTH direction scans evaluated
    over ONE partitioning: the backward window (time ascending) and the
    forward window (time descending) share the ``key`` exchange — Spark
    plans 1 Exchange + 2 in-partition Sorts, so nearest costs one extra
    sort over a single-direction as-of, never a second shuffle.  The
    matched right timestamps ride along per direction; a final map-side
    CASE picks the closer side.  Same contracts as ``asof_join`` (right
    unique per (key, time), left-outer semantics)."""
    lcols = left.columns
    carry = list(value_cols) + ["__mt"]
    right = right.withColumn("__mt", F.col(right_time))
    l_tagged = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carry],
    )
    r_tagged = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in carry],
    )
    merged = l_tagged.unionByName(r_tagged)

    frame = (Window.unboundedPreceding, Window.currentRow)
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__t"), F.asc("__side"))
        .rowsBetween(*frame)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(F.desc("__t"), F.asc("__side"))
        .rowsBetween(*frame)
    )
    picked = merged.select(
        "__side",
        "__t",
        *lcols,
        *[F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}") for c in carry],
        *[F.last(f"__r_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}") for c in carry],
    ).filter(F.col("__side") == 1)

    bt, ft = F.col("__b___mt"), F.col("__f___mt")
    # gaps compare in the column's native scale; timestamps via micros
    if isinstance(
        left.schema[left_time].dataType, (T.TimestampType, T.TimestampNTZType)
    ):
        t = F.unix_micros(F.col("__t").cast("timestamp"))
        gb = t - F.unix_micros(bt.cast("timestamp"))
        gf = F.unix_micros(ft.cast("timestamp")) - t
    else:
        gb = F.col("__t") - bt
        gf = ft - F.col("__t")
    use_backward = bt.isNotNull() & (ft.isNull() | (gb <= gf))
    return picked.select(
        *lcols,
        *[
            F.when(use_backward, F.col(f"__b_{c}"))
            .otherwise(F.col(f"__f_{c}"))
            .alias(c)
            for c in value_cols
        ],
    )


def scd2_intervals(
    changelog: DataFrame,
    key: str,
    time: str,
    payload: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Type-2 slowly-changing-dimension build: a (key, time, payload)
    changelog becomes one validity interval per version —
    ``[valid_from, valid_to)``, open-ended NULL ``valid_to`` for the
    current version.  This is the materialized form of what
    ``asof_broadcast_join`` derives inline; persist it (e.g. bucketed or
    z-ordered by key) and every downstream temporal join is a plain
    interval join.  One shuffle on ``key`` (the lead window), map-only
    otherwise — at scale the changelog is the small side by construction.
    Rows must be unique per (key, time), same contract as the as-of
    operators."""
    w = Window.partitionBy(key).orderBy(F.asc(time))
    return changelog.select(
        F.col(key),
        F.col(time).alias(valid_from),
        F.lead(time).over(w).alias(valid_to),
        *[F.col(c) for c in payload],
    )


def asof_broadcast_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join for a SMALL right side (dimension changelog /
    SCD-2 history): identical semantics and output contract to
    ``asof_join(direction='backward')``, different physical plan.

    Each right row becomes a validity interval ``[t, next t)`` via
    ``lead`` (one window over the small side only), then the fact side
    broadcast-hash-joins on key equality with the interval residual —
    the FACT SIDE NEVER SHUFFLES, vs the union+window merge's one
    fact-sized shuffle.  The right plan when |right| fits a broadcast
    (say ≤ tens of MB) and |left| is the 100 TB log: map-only over the
    log.  Use ``asof_join`` when both sides are large.

    Right side must be unique per (key, time) — same contract as
    ``asof_join`` (degenerate zero-width intervals otherwise).
    ``value_cols`` must not collide with left column names (the values
    are re-aliased to their bare names in the output), and left columns
    must not use the reserved ``__rk/__rt/__until/__r_*`` aliases —
    both are checked eagerly here, mirroring ``interval_overlap_join``'s
    documented uniqueness contract.
    """
    lcols = left.columns
    clash = set(value_cols) & set(lcols)
    if clash:
        raise ValueError(
            f"value_cols collide with left columns: {sorted(clash)}; "
            f"pre-alias one side before asof_broadcast_join"
        )
    reserved = {"__rk", "__rt", "__until"} | {f"__r_{c}" for c in value_cols}
    bad = [c for c in lcols if c in reserved or c.startswith("__r_")]
    if bad:
        raise ValueError(f"left columns use reserved internal aliases: {bad}")
    w = Window.partitionBy("__rk").orderBy(F.asc("__rt"))
    intervals = (
        right.select(
            F.col(right_key).alias("__rk"),
            F.col(right_time).alias("__rt"),
            *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        )
        .withColumn("__until", F.lead("__rt").over(w))
    )
    cond = (
        (left[left_key] == intervals["__rk"])
        & (left[left_time] >= intervals["__rt"])  # inclusive backward
        & (intervals["__until"].isNull() | (left[left_time] < intervals["__until"]))
    )
    return (
        left.join(F.broadcast(intervals), cond, "left")
        .select(*lcols, *[F.col(f"__r_{c}").alias(c) for c in value_cols])
    )


def range_band_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Inner join of a fact table onto a small band table on
    ``lo <= value < hi``.  The band side is broadcast explicitly: Catalyst
    plans BroadcastNestedLoopJoin and the fact side never shuffles."""
    cond = (fact[value_col] >= bands[lo_col]) & (fact[value_col] < bands[hi_col])
    return fact.join(F.broadcast(bands), cond, "inner")
