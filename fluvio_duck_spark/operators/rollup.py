"""Hypertable-style time-bucket rollups (continuous aggregates).

The reference has no rollup operator (its aggregate surface is DuckDB SQL
plus the SmartModule aggregate fold, reference src/consume.rs:687-695);
this is one of the brief's beyond-the-reference operators for time-series
/ training-data pipelines, built the way TimescaleDB continuous
aggregates and Druid rollups work — but expressed as plain DataFrame
aggregation so Catalyst plans it.

Design for 100 TB:

* ``hypertable_rollup`` computes the *finest* rollup once from raw data —
  one shuffle on (bucket, keys), partial aggregation map-side.
* Every measure is stored as **mergeable state**, not a final value:
  sums accumulate in DECIMAL (exact, order-independent — see
  functions/exact.py), counts are longs, min/max are closed under merge.
* ``cascade_rollup`` derives any coarser granularity by re-aggregating a
  finer rollup — it never rescans raw data.  An hourly rollup of a 100 TB
  hypertable is GBs; the daily/weekly/monthly cascade is then effectively
  free, and correctness is *provable*: cascaded results are bit-identical
  to a direct GROUP BY on raw (the paired oracle query checks exactly
  that).
* ``finalize_rollup`` turns state into user-facing values (double sums,
  derived averages) — applied only at the serving edge.
* Distinct counts are NOT exactly mergeable, so the ``approx_distinct``
  kind stores an HLL sketch (Datasketches binary, built-in
  ``hll_sketch_agg``) as its state: sketches union losslessly under
  ``cascade_rollup``, so a daily distinct-estimate derived from hourly
  sketches equals the direct daily estimate exactly — the standard
  trade (bounded ~2% error for mergeability) every rollup store makes.

Bucketing uses integer floor of epoch seconds so Spark and ANSI engines
agree exactly: ``timestamp_seconds(floor(epoch(ts)/w)*w)``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KINDS = ("sum", "count", "min", "max", "avg", "approx_distinct", "hist")


@dataclass(frozen=True)
class Measure:
    """One rolled-up measure: ``kind`` ∈ sum|count|min|max|avg|
    approx_distinct|hist over ``col``, surfaced as ``name``.  ``scale``
    is the DECIMAL scale used for exact sum accumulation of float inputs.

    ``hist`` state is a fixed-bin count histogram over ``[lo, hi)``
    (``nbuckets`` equal bins; values outside clamp to the edge bins) —
    an ``array<bigint>`` that merges by elementwise addition, so
    cascaded quantiles are *bit-identical* to direct ones (the property
    HLL gives distinct counts, here for percentiles).  ``pcts`` are the
    percentiles finalize emits, each estimated as the lower bound of the
    bin holding rank ``ceil(p·n)`` — deterministic (max error = one bin
    width), hence oracle-checkable, unlike engine-specific quantile
    sketches."""

    name: str
    col: str
    kind: str
    scale: int = 2
    lo: float = 0.0
    hi: float = 1.0
    nbuckets: int = 32
    pcts: tuple = (0.5,)

    def __post_init__(self) -> None:
        if self.kind not in KINDS:
            raise ValueError(f"unknown measure kind {self.kind!r}; use one of {KINDS}")
        if self.kind == "hist" and not (self.hi > self.lo and self.nbuckets >= 1):
            raise ValueError("hist needs hi > lo and nbuckets >= 1")

    @property
    def _dec(self) -> str:
        return f"decimal(28,{self.scale})"

    @property
    def _bin_width(self) -> float:
        return (self.hi - self.lo) / self.nbuckets

    def _bin_index(self) -> Column:
        """Clamped bin index of ``col`` — plain JVM arithmetic."""
        raw = F.floor((F.col(self.col) - F.lit(self.lo)) / F.lit(self._bin_width))
        return F.least(
            F.greatest(raw.cast("int"), F.lit(0)), F.lit(self.nbuckets - 1)
        )


def time_bucket(ts: Column | str, width_seconds: int) -> Column:
    """Floor ``ts`` to a ``width_seconds`` bucket start (TIMESTAMP)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    w = int(width_seconds)
    return F.timestamp_seconds(
        (F.floor(F.unix_timestamp(c) / w) * w).cast("long")
    )


def _with_hist_bins(df: DataFrame, measures: list[Measure]) -> DataFrame:
    """Project each hist measure's clamped bin index ONCE per row
    (``__bin_<name>``) before the aggregation consumes it nbuckets
    times.  Dropped implicitly by the groupBy."""
    for m in measures:
        if m.kind == "hist":
            df = df.withColumn(f"__bin_{m.name}", m._bin_index())
    return df


def _initial_aggs(measures: list[Measure]) -> list[Column]:
    out: list[Column] = []
    for m in measures:
        c = F.col(m.col)
        if m.kind == "sum":
            out.append(F.sum(c.cast(m._dec)).alias(m.name))
        elif m.kind == "count":
            out.append(F.count(c).alias(m.name))
        elif m.kind == "min":
            out.append(F.min(c).alias(m.name))
        elif m.kind == "max":
            out.append(F.max(c).alias(m.name))
        elif m.kind == "avg":  # mergeable (sum, count) pair
            out.append(F.sum(c.cast(m._dec)).alias(f"{m.name}_sum"))
            out.append(F.count(c).alias(f"{m.name}_cnt"))
        elif m.kind == "hist":
            # one-hot expansion: nbuckets conditional counts in ONE
            # partial+final agg pass (all whole-stage codegen; no UDF,
            # no collect) packed into the array state.  The clamped bin
            # index is PRE-PROJECTED by _with_hist_bins — referencing
            # the raw expression here made Catalyst inline the whole
            # floor/divide/clamp chain into every one of the nbuckets
            # conditional counts (nbuckets arithmetic evaluations per
            # row, visible verbatim in the plan's Functions list).
            # Built as ONE parsed SQL string: the per-bucket Column-API
            # loop cost nbuckets × ~10 py4j round trips of plan
            # CONSTRUCTION per query call — driver-side latency the
            # bench pays on every invocation (guide §7.3: very large
            # expression trees are built, not just executed)
            cnts = ", ".join(
                f"count(CASE WHEN (`__bin_{m.name}` = {i}) "
                f"AND (`{m.col}` IS NOT NULL) THEN true END)"
                for i in range(m.nbuckets)
            )
            out.append(F.expr(f"array({cnts})").alias(m.name))
        else:  # approx_distinct → HLL sketch state (binary, mergeable)
            out.append(F.hll_sketch_agg(c).alias(m.name))
    return out


def _merge_aggs(measures: list[Measure]) -> list[Column]:
    out: list[Column] = []
    for m in measures:
        if m.kind in ("sum",):
            out.append(F.sum(F.col(m.name).cast(m._dec)).alias(m.name))
        elif m.kind == "count":
            out.append(F.sum(m.name).alias(m.name))
        elif m.kind == "min":
            out.append(F.min(m.name).alias(m.name))
        elif m.kind == "max":
            out.append(F.max(m.name).alias(m.name))
        elif m.kind == "avg":
            out.append(F.sum(F.col(f"{m.name}_sum").cast(m._dec)).alias(f"{m.name}_sum"))
            out.append(F.sum(f"{m.name}_cnt").alias(f"{m.name}_cnt"))
        elif m.kind == "hist":
            # elementwise array addition as nbuckets scalar sums — the
            # exact merge that makes cascaded quantiles ≡ direct ones
            # (one parsed SQL string, same construction-cost note as
            # the one-hot pass above)
            sums = ", ".join(
                f"sum(`{m.name}`[{i}])" for i in range(m.nbuckets)
            )
            out.append(F.expr(f"array({sums})").alias(m.name))
        else:
            out.append(F.hll_union_agg(m.name).alias(m.name))
    return out


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    keys: list[str],
    measures: list[Measure],
    bucket_col: str = "bucket",
) -> DataFrame:
    """The finest-granularity continuous aggregate: one shuffle on
    (bucket, keys); every measure lands as mergeable state."""
    return (
        _with_hist_bins(df, measures)
        .withColumn(bucket_col, time_bucket(ts_col, width_seconds))
        .groupBy(bucket_col, *keys)
        .agg(*_initial_aggs(measures))
    )


def cascade_rollup(
    rollup: DataFrame,
    width_seconds: int,
    keys: list[str],
    measures: list[Measure],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Coarsen an existing rollup by re-aggregating its mergeable state —
    never touches raw data.  ``width_seconds`` must be a multiple of the
    input rollup's width for buckets to nest exactly."""
    return (
        rollup.withColumn(bucket_col, time_bucket(bucket_col, width_seconds))
        .groupBy(bucket_col, *keys)
        .agg(*_merge_aggs(measures))
    )


def finalize_rollup(rollup: DataFrame, measures: list[Measure]) -> DataFrame:
    """State → user-facing values: decimal sums emit double, averages are
    one double division of exact state (deterministic on any cluster)."""
    cols = [c for c in rollup.columns]
    state = {m.name for m in measures} | {
        n for m in measures if m.kind == "avg" for n in (f"{m.name}_sum", f"{m.name}_cnt")
    }
    out: list[Column] = [F.col(c) for c in cols if c not in state]
    for m in measures:
        if m.kind == "sum":
            out.append(F.col(m.name).cast("double").alias(m.name))
        elif m.kind == "avg":
            out.append(
                (F.col(f"{m.name}_sum").cast("double") / F.col(f"{m.name}_cnt"))
                .alias(m.name)
            )
        elif m.kind == "approx_distinct":
            out.append(F.hll_sketch_estimate(m.name).alias(m.name))
        elif m.kind == "hist":
            for p in m.pcts:
                out.append(
                    _hist_percentile(m, p).alias(
                        f"{m.name}_p{int(round(p * 100))}"
                    )
                )
        else:
            out.append(F.col(m.name))
    return rollup.select(*out)


def _hist_percentile(m: Measure, p: float) -> Column:
    """Deterministic estimator: lower bound of the bin holding rank
    ``max(ceil(p·n), 1)`` under the cumulative bin counts.  Pure array
    expressions (one ``aggregate`` scan over nbuckets elements per row)
    — no UDF, no sort, reproducible on any engine."""
    arr = F.col(m.name)
    total = F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)
    rank = F.greatest(F.ceil(F.lit(p) * total).cast("long"), F.lit(1).cast("long"))
    zero = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(-1).alias("idx"),
        F.lit(0).alias("i"),
    )
    found = F.aggregate(
        arr,
        zero,
        lambda acc, x: F.struct(
            (acc.cum + x).alias("cum"),
            F.when((acc.idx < 0) & (acc.cum + x >= rank), acc.i)
            .otherwise(acc.idx)
            .alias("idx"),
            (acc.i + 1).alias("i"),
        ),
    )
    est = F.lit(m.lo) + found.idx.cast("double") * F.lit(m._bin_width)
    return F.when(found.idx >= 0, est).cast("double")


def ohlc_bars(
    df: DataFrame,
    time_col: str,
    order_col: str,
    value_col: str,
    key_cols: list[str],
    width_seconds: int = 3600,
    sum_scale: int = 6,
) -> DataFrame:
    """OHLC (open/high/low/close) bars per time bucket and key — the
    classic streaming-analytics rollup (candlesticks, per-route speed
    bars, sensor envelopes).

    ``open``/``close`` are the first/last value by ``order_col`` (the log
    offset — the stream's total order; a raw timestamp may tie), taken
    with ``min_by``/``max_by`` so they are MERGEABLE aggregate state:
    partial bars combine map-side and one shuffle on (bucket, keys)
    finishes the job — no per-bucket sort, no window over raw events.
    ``volume`` accumulates in DECIMAL (order-independent bits,
    functions/exact.py).  The whole bar is one partial+final hash
    aggregate pass — the same plan shape as ``hypertable_rollup`` —
    and cascades: a daily bar re-aggregates hourly bars with
    ``min_by(open, first_order)`` etc., never raw data.
    """
    from fluvio_duck_spark.functions.exact import dsum

    bucket = time_bucket(F.col(time_col), width_seconds).alias("bucket")
    return df.groupBy(bucket, *[F.col(k) for k in key_cols]).agg(
        F.min_by(value_col, order_col).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, order_col).alias("close"),
        F.count("*").alias("n_events"),
        dsum(value_col, scale=sum_scale).alias("volume"),
    )


def refresh_rollup(
    existing: DataFrame | None,
    new_raw: DataFrame,
    ts_col: str,
    width_seconds: int,
    keys: list[str],
    measures: list[Measure],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Incremental continuous-aggregate maintenance: the merged state for
    ONLY the buckets the new data touches.

    The delta batch is rolled up (one shuffle over the delta, never the
    history), the affected bucket set (tiny — bounded by delta time span
    / bucket width) broadcast-semi-joins the existing rollup, and the two
    mergeable states re-aggregate.  Cost scales with the delta + the
    touched slice of the rollup, not with history size — the property
    that makes a 100 TB hypertable's hourly rollup maintainable by a
    5-minute batch job.
    """
    delta = hypertable_rollup(new_raw, ts_col, width_seconds, keys, measures,
                              bucket_col=bucket_col)
    if existing is None:
        return delta
    affected = delta.select(bucket_col).distinct()
    touched = existing.join(F.broadcast(affected), bucket_col, "left_semi")
    return cascade_rollup(
        touched.unionByName(delta), width_seconds, keys, measures,
        bucket_col=bucket_col,
    )


def write_rollup(rollup: DataFrame, path: str, bucket_col: str = "bucket",
                 mode: str = "overwrite") -> None:
    """Materialize rollup state bucket-partitioned, so refreshes can
    replace exactly the touched partitions and bucket-range queries
    prune at the directory level."""
    (
        rollup.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(bucket_col)
        .parquet(path)
    )


def refresh_rollup_materialized(
    spark,
    path: str,
    new_raw: DataFrame,
    ts_col: str,
    width_seconds: int,
    keys: list[str],
    measures: list[Measure],
    bucket_col: str = "bucket",
) -> None:
    """Read-merge-write refresh of a materialized rollup at ``path``:
    dynamic partition overwrite rewrites only the affected bucket
    directories; every untouched partition's files are left byte-for-byte
    in place (asserted in tests via file mtimes)."""
    try:
        existing = spark.read.parquet(path)
    except Exception:
        existing = None
    merged = refresh_rollup(existing, new_raw, ts_col, width_seconds, keys,
                            measures, bucket_col=bucket_col)
    write_rollup(merged, path, bucket_col=bucket_col, mode="overwrite")
