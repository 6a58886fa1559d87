"""Time-series repair operators: calendar-spine gap filling and
last-observation-carried-forward — the two fixes every telemetry rollup
needs before a model or dashboard consumes it (the reference's transit
demo rolls up `hsl:60sec` buckets, reference ``examples/README.md``;
these close the holes such rollups leave).

Both are pure Catalyst: the spine is derived lazily from a 1-row
min/max aggregate (the LEO pattern — no driver action at plan-build),
and LOCF is a running ``last(ignorenulls)`` window, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calendar_gapfill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step: str = "1 hour",
    agg=None,
    fill=None,
) -> DataFrame:
    """Aggregate ``df`` per (key, time-bucket) and fill every missing
    bucket of every key with ``fill`` values over the table's global
    [min, max] bucket span.

    ``agg``: dict {out_name: Column-aggregate} applied per bucket
    (default {"n": count(*)}).  ``fill``: dict {out_name: literal} for
    empty buckets (default 0 for every agg output).

    Plan shape: the dense spine is (global 1-row min/max agg) ×
    sequence-explode × (distinct keys) — rows = #keys × #buckets, built
    with two tiny inputs and one crossJoin of a 1-row frame (no driver
    action, no collect).  The observed aggregates left-join onto the
    spine on (key, bucket); the spine side is small relative to the
    fact table at any scale where gap-filling makes sense, so AQE
    broadcast-plans it; output cardinality is explicit and bounded.
    """
    agg = agg or {"n": F.count("*")}
    fill = fill or {name: 0 for name in agg}
    bucket = F.date_trunc("hour", F.col(ts_col)) if step == "1 hour" else None
    if bucket is None:
        # generic step via epoch arithmetic: floor to step seconds.  The
        # interval must be normalized to DAY TO SECOND before the long
        # cast — a bare `CAST(INTERVAL 15 MINUTES AS LONG)` yields 15
        # (the interval's own unit), which would silently bucket on the
        # wrong grid and drop observed counts off the spine.
        secs = F.unix_timestamp(F.col(ts_col))
        step_s = (
            F.expr(f"INTERVAL {step}")
            .cast("interval day to second")
            .cast("long")
        )
        bucket = F.timestamp_seconds(
            F.floor(secs / step_s).cast("long") * step_s
        )

    observed = df.groupBy(
        F.col(key_col), bucket.alias("bucket")
    ).agg(*[c.alias(name) for name, c in agg.items()])

    span = df.agg(
        F.min(bucket).alias("_lo"), F.max(bucket).alias("_hi")
    )
    spine = (
        span.select(
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
            ).alias("bucket")
        )
        .crossJoin(df.select(key_col).distinct())
    )
    out = spine.join(observed, [key_col, "bucket"], "left")
    return out.select(
        key_col,
        "bucket",
        *[
            F.coalesce(F.col(name), F.lit(fill[name])).alias(name)
            for name in agg
        ],
    )


def locf_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col,
    out_col: str = "filled",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Last-observation-carried-forward: per key in time order, replace
    NULLs in ``val_col`` (a column name or a Column expression whose
    NULLs mark 'no observation') with the most recent non-NULL value.
    Rows before the first observation stay NULL.

    One window, one shuffle on the key, running frame — state per task
    is a single value, so arbitrarily long keys stream through.  The
    ``tiebreak_col`` makes the order total when timestamps tie
    (deterministic fill on reruns, same contract as sessionize).
    """
    val = F.col(val_col) if isinstance(val_col, str) else val_col
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(val, ignorenulls=True).over(w))


def interp_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    out_col: str = "filled",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-weighted linear interpolation: per key in time order, replace
    NULL ``val_col`` rows bracketed by observations with
    ``prev + (next − prev) · (t − t_prev) / (t_next − t_prev)``.
    Trailing NULLs (no next observation) carry the last value forward
    (LOCF); leading NULLs (no prev) stay NULL.  Adds ``{out_col}_src`` ∈
    {'obs','interp','locf','none'}.

    Two mirrored running windows (backward last-non-null, forward
    first-non-null) over ONE key shuffle — Spark plans both frames in a
    single Window node pair on the same sort, state per task is O(1), so
    arbitrarily long keys stream through.  The time axis is microseconds
    (sub-second series keep exact weights; month-scale deltas stay
    < 2^53 so the double cast is exact), and the interpolation itself is
    a single row-local double expression: with identical (prev, next, t)
    inputs any engine produces the identical double.  Degenerate
    brackets (prev and next at the identical instant) fall back to LOCF
    rather than emitting 0/0.  ``tiebreak_col`` totalizes the order when
    timestamps tie (deterministic fill on reruns — same contract as
    ``locf_fill``).
    """
    t = F.unix_micros(F.col(ts_col))
    v = F.col(val_col)
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    back = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(v.isNotNull(), t)
    prev_v = F.last(v, ignorenulls=True).over(back)
    prev_t = F.last(obs_t, ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    next_t = F.first(obs_t, ignorenulls=True).over(fwd)
    interp = prev_v + (next_v - prev_v) * (
        (t - prev_t).cast("double") / (next_t - prev_t).cast("double")
    )
    can_interp = (
        prev_v.isNotNull() & next_v.isNotNull() & (next_t != prev_t)
    )
    filled = (
        F.when(v.isNotNull(), v)
        .when(can_interp, interp)
        .when(prev_v.isNotNull(), prev_v)
    )
    src = (
        F.when(v.isNotNull(), F.lit("obs"))
        .when(can_interp, F.lit("interp"))
        .when(prev_v.isNotNull(), F.lit("locf"))
        .otherwise(F.lit("none"))
    )
    return df.withColumn(out_col, filled).withColumn(f"{out_col}_src", src)
