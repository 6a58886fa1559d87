"""Hypertable rollup: cascade losslessness, avg derivation, bucketing."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluvio_duck_spark.operators.rollup import (
    Measure,
    cascade_rollup,
    finalize_rollup,
    hypertable_rollup,
    time_bucket,
)
from fluvio_duck_spark.sources.tables import load

MEASURES = [
    Measure("total", "value", "sum"),
    Measure("n", "value", "count"),
    Measure("lo", "value", "min"),
    Measure("hi", "value", "max"),
    Measure("avg_value", "value", "avg"),
]


def _by_key(rows):
    return {(r.bucket, r.event_type): r for r in rows}


def test_cascade_equals_direct_rollup(spark, sf_dir):
    """Daily-from-hourly must be bit-identical to daily-from-raw."""
    ev = load(spark, sf_dir, "events")
    hourly = hypertable_rollup(ev, "ts", 3600, ["event_type"], MEASURES)
    cascaded = finalize_rollup(
        cascade_rollup(hourly, 86400, ["event_type"], MEASURES), MEASURES
    )
    direct = finalize_rollup(
        hypertable_rollup(ev, "ts", 86400, ["event_type"], MEASURES), MEASURES
    )
    got, want = _by_key(cascaded.collect()), _by_key(direct.collect())
    assert set(got) == set(want)
    for k in want:
        for f in ("total", "n", "lo", "hi", "avg_value"):
            assert getattr(got[k], f) == getattr(want[k], f), (k, f)


def test_rollup_counts_partition_raw_rows(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    hourly = hypertable_rollup(ev, "ts", 3600, ["event_type"], MEASURES)
    assert hourly.agg(F.sum("n")).first()[0] == ev.count()


def test_avg_is_sum_over_count(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    out = finalize_rollup(
        hypertable_rollup(ev, "ts", 86400, ["event_type"], MEASURES), MEASURES
    )
    for r in out.collect():
        assert r.avg_value == r.total / r.n


def test_time_bucket_floors_to_width(spark):
    df = spark.createDataFrame(
        [("2024-03-05 10:59:59",), ("2024-03-05 11:00:00",)], ["s"]
    ).select(F.col("s").cast("timestamp").alias("ts"))
    got = [r[0].isoformat() for r in df.select(time_bucket("ts", 3600)).collect()]
    assert got == ["2024-03-05T10:00:00", "2024-03-05T11:00:00"]


def test_hll_cascade_estimate_equals_direct(spark, sf_dir):
    """HLL sketch state unions losslessly: daily-from-hourly estimates
    must equal direct daily estimates, and land near the exact count."""
    m = [Measure("users", "user_id", "approx_distinct")]
    ev = load(spark, sf_dir, "events")
    hourly = hypertable_rollup(ev, "ts", 3600, ["event_type"], m)
    cascaded = finalize_rollup(
        cascade_rollup(hourly, 86400, ["event_type"], m), m
    )
    direct = finalize_rollup(
        hypertable_rollup(ev, "ts", 86400, ["event_type"], m), m
    )
    got, want = _by_key(cascaded.collect()), _by_key(direct.collect())
    assert set(got) == set(want)
    assert all(got[k].users == want[k].users for k in want)
    exact = {
        (r.bucket, r.event_type): r.cnt
        for r in ev.select(
            time_bucket("ts", 86400).alias("bucket"), "event_type", "user_id"
        ).groupBy("bucket", "event_type")
        .agg(F.countDistinct("user_id").alias("cnt"))
        .collect()
    }
    for k in want:
        assert abs(got[k].users - exact[k]) <= max(2, 0.05 * exact[k]), k


def test_rollup_state_sum_is_decimal(spark, sf_dir):
    """Mergeable state: sums must stay DECIMAL until finalize."""
    ev = load(spark, sf_dir, "events")
    hourly = hypertable_rollup(ev, "ts", 3600, ["event_type"], MEASURES)
    assert dict(hourly.dtypes)["total"].startswith("decimal")
    final = finalize_rollup(hourly, MEASURES)
    assert dict(final.dtypes)["total"] == "double"
