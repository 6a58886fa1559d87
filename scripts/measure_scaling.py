#!/usr/bin/env python
"""Measure warm per-query wall time across scale factors and print
SCALE.md-ready markdown rows.

Usage: python scripts/measure_scaling.py <query> [<query> ...]

One Spark session; each query is warmed once per sf (codegen compile,
parquet footer cache), then the median of 3 timed runs through the noop
sink is reported.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    from fluvio_duck_spark.queries import all_queries
    from fluvio_duck_spark.session import get_spark

    names = sys.argv[1:]
    if not names:
        sys.exit("usage: measure_scaling.py <query> [...]")
    spark = get_spark("measure-scaling")
    specs = all_queries()
    rows = {}
    for name in names:
        fn = specs[name].fn
        per_sf = []
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            per_sf.append(statistics.median(times))
        rows[name] = per_sf
    print()
    for name, (a, b, c) in rows.items():
        ratio = f"{c / a:.1f}x" if a else "-"
        print(f"| {name} | {a:.2f} | {b:.2f} | {c:.2f} | {ratio} |")


if __name__ == "__main__":
    main()
