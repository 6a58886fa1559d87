"""Event-log analytics operators: ordered funnels, cohort retention,
and CDC upsert-apply.  The reference's event workloads are the
``events_10k`` transit/transform demos (reference ``examples/README.md``);
these operators cover the analysis layer a user would run over those
consumed streams once landed (SURVEY §2.7/§2.8 composition shapes).

All three are pure Catalyst compositions — no UDFs, no driver actions —
so filters/pruning push into the scan and each shuffle is on an explicit
key the caller can reason about at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    max_gap: str | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: for each stage i, count users who
    performed ``stages[0..i]`` in strict timestamp order (each step
    strictly after the previous one — the classic product funnel).
    ``max_gap`` (e.g. ``"7 days"``) additionally requires each step to
    land within that interval of the previous step — the conversion
    window every real funnel metric carries.

    Plan shape: one filtered aggregation per stage, each grouped on the
    user key.  Stage i's survivors join stage i-1's min-timestamps on
    the user key — after the first groupBy every subsequent join and
    groupBy reuses the same hash partitioning, so AQE coalesces them
    into aligned exchanges; survivor sets only shrink.  No windows over
    the full log, no event collection per user (a collect_list-based
    funnel would break on heavy-hitter users; this never materializes a
    user's history).

    Returns one row per stage: (stage, stage_name, users).
    """
    if not stages:
        raise ValueError("funnel_stages requires at least one stage")
    counts: list[DataFrame] = []
    reached: DataFrame | None = None  # (user, t_i) users who reached stage i
    for i, stage in enumerate(stages):
        ev = events.filter(F.col(type_col) == stage)
        if reached is None:
            reached = ev.groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        else:
            prev = reached.withColumnRenamed("_t", "_t_prev")
            cond = F.col(ts_col) > F.col("_t_prev")
            if max_gap is not None:
                cond = cond & (
                    F.col(ts_col) <= F.col("_t_prev") + F.expr(f"INTERVAL {max_gap}")
                )
            reached = (
                ev.join(prev, user_col)
                .filter(cond)
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("_t"))
            )
        counts.append(
            reached.agg(
                F.lit(i + 1).cast("int").alias("stage"),
                F.lit(stage).alias("stage_name"),
                F.count("*").alias("users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention: cohort = the Monday-truncated week of a
    user's first event; a user "retained at offset w" means they had any
    event during cohort_week + w weeks.

    Plan shape: first-touch aggregation (one shuffle on the user key),
    distinct (user, week) activity (shuffle on user+week — the distinct
    happens partially map-side), then a user-key join that reuses the
    first aggregation's partitioning, and a final small aggregation on
    (cohort_week, offset).  Nothing is per-user materialized, so
    heavy-hitter users cost only their distinct-week count.

    Returns (cohort_week date, week_offset int, active_users).
    """
    week = lambda c: F.date_trunc("week", F.col(c)).cast("date")  # noqa: E731
    firsts = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    activity = events.select(
        F.col(user_col), week(ts_col).alias("active_week")
    ).distinct()
    return (
        activity.join(firsts, user_col)
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("active_users"))
    )


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    op_col: str,
    val_cols: list[str],
    tiebreak_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Apply a CDC change feed to a snapshot: the latest change per key
    wins (ordered by ``ts_col`` then ``tiebreak_col``); a ``delete_op``
    change removes the key; an upsert replaces ``val_cols``; keys with
    no change pass through; keys only in the feed are inserts.  This is
    the batch MERGE a warehouse applies per load window.

    Plan shape: latest-change reduction is a max_by-style aggregation on
    the key (one shuffle, partial map-side — NOT a row_number window,
    which would sort every change run; at 100 TB a key's change history
    can be long and only its max survives).  Then one full-outer join
    snapshot⋈latest on the same key.  Both sides hash-partition on the
    key, so AQE aligns the exchanges; with bucketed tables (sinks.py::
    write_bucketed) the operator runs shuffle-free.

    Columns: (key, *val_cols) — snapshot and changes must both carry
    ``val_cols``.
    """
    order = F.struct(
        *([F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else []))
    )
    latest = changes.groupBy(key_col).agg(
        F.max_by(F.col(op_col), order).alias("_op"),
        *[F.max_by(F.col(c), order).alias(f"_new_{c}") for c in val_cols],
    )
    snap = snapshot.select(key_col, *val_cols)
    joined = snap.join(latest, key_col, "full_outer")
    kept = joined.filter(
        F.col("_op").isNull() | (F.col("_op") != F.lit(delete_op))
    )
    return kept.select(
        F.col(key_col),
        *[
            F.when(F.col("_op").isNotNull(), F.col(f"_new_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in val_cols
        ],
    )
