"""Event-time windowing over the record stream (ST6 — not present in the
reference, exposed as the Spark-native extension SURVEY §2.11 recommends).

Watermarks bound state: a 1000-executor job aggregating event-time windows
over an unbounded stream must drop state for windows no late event can
still join — ``withWatermark`` is that contract.  For bounded-parity runs
(AvailableNow + complete/update mode) the same plan works unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "timestamp",
    key_col: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` differs) event-time window counts
    + exact decimal value sums over the mapped ``k`` payload field."""
    keyed = stream.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window, slide or window)]
    if key_col:
        keys.append(F.col(key_col))
    out = keyed.groupBy(*keys).agg(F.count("*").alias("n"))
    cols = [
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
    ]
    if key_col:
        cols.append(F.col(key_col))
    return out.select(*cols, "n")


def session_window_agg(
    stream: DataFrame,
    gap: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "timestamp",
    key_col: str = "partition",
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge; a gap
    ≥ ``gap`` starts a new session (half-open window semantics)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n",
        )
    )


def stream_rollup(
    stream: DataFrame,
    width_seconds: int,
    keys: list[str],
    measures,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Continuously-maintained hypertable rollup: the streaming twin of
    ``operators.rollup.hypertable_rollup`` — identical mergeable state
    (DECIMAL sums, counts, min/max, HLL sketches), maintained
    incrementally per micro-batch with watermark-bounded state.  Tumbling
    windows align to epoch floor, so ``window.start`` equals the batch
    operator's ``time_bucket`` exactly; ``finalize_rollup`` applies
    unchanged downstream.  This is how the hourly level stays fresh at
    100 TB: the stream maintains the finest rollup, the batch cascade
    derives every coarser granularity from it."""
    from fluvio_duck_spark.operators.rollup import (
        _initial_aggs,
        _with_hist_bins,
    )

    out = (
        _with_hist_bins(stream, measures)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), f"{width_seconds} seconds"), *keys)
        .agg(*_initial_aggs(measures))
    )
    state = [c for c in out.columns if c != "window" and c not in keys]
    return out.select(
        F.col("window.start").alias(bucket_col), *keys, *state
    )


def stream_dedup_keys(
    stream: DataFrame,
    key_cols: list[str],
    watermark: str = "1 day",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each key within the
    watermark horizon survives; state for keys older than the watermark
    is dropped, so memory is bounded by keys-per-horizon, not by stream
    length — the streaming counterpart of operators/dedup.exact_dedup.

    Emits only the key columns: *which* record survives per key is a
    race across micro-batches, but the surviving key set is exact."""
    return (
        stream.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols + [])
        .select(*key_cols)
    )
