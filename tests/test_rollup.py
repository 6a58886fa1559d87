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


def test_incremental_refresh_equals_full_recompute(spark, sf_dir, tmp_path):
    """refresh_rollup_materialized: backfill 80% of the log, refresh with
    the final 20%, and the materialized state must equal a from-scratch
    rollup of everything — while untouched bucket partitions keep their
    original files (dynamic partition overwrite rewrites only the dirty
    directories)."""
    import os
    import time

    from fluvio_duck_spark.operators.rollup import (
        Measure,
        finalize_rollup,
        hypertable_rollup,
        refresh_rollup_materialized,
        write_rollup,
    )
    from fluvio_duck_spark.sources.consume import read_events

    ev = read_events(spark, sf_dir)
    cut = int(ev.count() * 0.8)
    old = ev.filter(F.col("event_id") < cut)
    new = ev.filter(F.col("event_id") >= cut)
    m = [
        Measure("total", "value", "sum"),
        Measure("n", "value", "count"),
        Measure("avg_value", "value", "avg"),
        Measure("users", "user_id", "approx_distinct"),
    ]
    path = str(tmp_path / "rollup")
    write_rollup(hypertable_rollup(old, "ts", 21600, ["event_type"], m), path)

    before = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path) if d.startswith("bucket=")
    }
    time.sleep(1.1)
    refresh_rollup_materialized(spark, path, new, "ts", 21600, ["event_type"], m)

    # only buckets present in the delta were rewritten
    touched = {
        "bucket=" + str(r.bucket).replace(" ", "%20").replace(":", "%3A")
        for r in hypertable_rollup(new, "ts", 21600, ["event_type"], m)
        .select("bucket").distinct().collect()
    }
    for d, mt in before.items():
        now = os.path.getmtime(os.path.join(path, d))
        if d in touched:
            assert now > mt, f"dirty partition {d} not rewritten"
        else:
            assert now == mt, f"clean partition {d} was rewritten"

    got = finalize_rollup(spark.read.parquet(path), m)
    want = finalize_rollup(hypertable_rollup(ev, "ts", 21600, ["event_type"], m), m)
    key = lambda r: (str(r.bucket), r.event_type)  # noqa: E731
    g = {key(r): (r.total, r.n, round(r.avg_value, 9), r.users) for r in got.collect()}
    w = {key(r): (r.total, r.n, round(r.avg_value, 9), r.users) for r in want.collect()}
    assert g == w


def test_hist_cascade_state_bit_identical(spark, sf_dir):
    """Histogram bin-count arrays merge by elementwise addition, so the
    cascaded daily state equals the direct daily state exactly — the
    mergeability property that makes the quantile rollup maintainable
    incrementally at scale."""
    m = [Measure("v", "value", "hist", lo=0.0, hi=500.0, nbuckets=50,
                 pcts=(0.5, 0.95))]
    ev = load(spark, sf_dir, "events")
    hourly = hypertable_rollup(ev, "ts", 3600, ["event_type"], m)
    casc = cascade_rollup(hourly, 86400, ["event_type"], m)
    direct = hypertable_rollup(ev, "ts", 86400, ["event_type"], m)
    a = {(r.bucket, r.event_type): list(r.v) for r in casc.collect()}
    b = {(r.bucket, r.event_type): list(r.v) for r in direct.collect()}
    assert a == b and len(a) > 0


def test_hist_percentile_within_one_bin_of_order_stat(spark, sf_dir):
    """The estimator returns the lower bound of the bin CONTAINING the
    rank-⌈p·n⌉ order statistic, so 0 <= stat - estimate < one bin width
    by construction (vs the order statistic, not the interpolating
    percentile, which is unbounded for 2-element groups)."""
    width = 10.0
    m = [Measure("v", "value", "hist", lo=0.0, hi=500.0, nbuckets=50,
                 pcts=(0.5,))]
    ev = load(spark, sf_dir, "events")
    fin = finalize_rollup(
        hypertable_rollup(ev, "ts", 86400, ["event_type"], m), m
    )
    est = {(r.bucket, r.event_type): r.v_p50 for r in fin.collect()}
    # rank-⌈0.5·n⌉ order statistic, exactly the estimator's target rank
    stat = {
        (r.bucket, r.event_type): r.stat
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("bucket"), "event_type"
        )
        .agg(F.sort_array(F.collect_list("value")).alias("vs"))
        .select(
            "bucket", "event_type",
            F.col("vs")[
                (F.ceil(F.size("vs") * 0.5).cast("int") - 1)
            ].alias("stat"),
        )
        .collect()
    }
    assert est.keys() == stat.keys() and len(est) > 0
    assert all(0 <= stat[k] - est[k] < width for k in est)


def test_hist_empty_bins_give_null_percentile(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "a", None)], "ts string, k string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    m = [Measure("v", "value", "hist", lo=0.0, hi=10.0, nbuckets=4, pcts=(0.5,))]
    fin = finalize_rollup(hypertable_rollup(df, "ts", 3600, ["k"], m), m)
    assert fin.collect()[0].v_p50 is None
