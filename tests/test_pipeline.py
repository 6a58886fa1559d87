"""End-to-end pipeline integration (scripts/demo_pipeline.py) and
approximate-aggregate error bounds."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/scripts")


def test_curation_pipeline_end_to_end(spark, sf_dir, tmp_path):
    from demo_pipeline import curate

    n0, n1, n2, n3, n4, n5, stats = curate(
        spark, sf_dir, str(tmp_path / "curated")
    )
    assert n0 >= n1 >= n2 >= n3 >= n4 > 0  # each stage only removes docs
    assert n5 >= n4  # chunking only splits, never drops surviving docs
    out = spark.read.parquet(str(tmp_path / "curated"))
    assert out.count() == n4
    # partitioned layout by (language, split); epoch order rides along
    assert {"lang", "split", "shuffle_key"} <= set(out.columns)
    assert {r.split for r in out.select("split").distinct().collect()} <= {
        "train", "val", "test"
    }
    total = sum(r.docs for r in stats.collect())
    assert total == n4
    # model-ready chunk table: z-ordered write round-trips, budget holds
    chunks = spark.read.parquet(str(tmp_path / "curated_chunks"))
    assert chunks.count() == n5
    assert chunks.agg(F.max("n_chunk_tokens")).first()[0] <= 64


def test_approx_distinct_within_bounds(spark, sf_dir):
    """approx_count_distinct is engine-specific (hence rows-only in the
    oracle gate) but must stay within its documented ~2.3% rsd —
    asserted at 5% against the exact count."""
    from fluvio_duck_spark.sources.tables import load

    li = load(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_partkey").alias("n")).collect()[0].n
    approx = li.select(F.approx_count_distinct("l_partkey").alias("n")).collect()[0].n
    assert abs(approx - exact) / exact < 0.05

    p50_exact = li.select(F.expr("percentile(l_extendedprice, 0.5)").alias("p")).collect()[0].p
    p50_approx = li.select(
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("p")
    ).collect()[0].p
    assert abs(p50_approx - p50_exact) / p50_exact < 0.05
