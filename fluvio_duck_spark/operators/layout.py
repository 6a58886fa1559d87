"""Physical-layout maintenance operators — Z-order clustering keys with a
data-skipping audit, and small-file compaction planning.

Extensions beyond the reference surface (the reference is a streaming
scan + SQL delegate; it has no table-maintenance story), but these are
the operations that decide whether the OTHER 337 queries touch 100 TB or
100 GB: at scale, a parquet lake's effective speed is set by how many
files a filter can skip and how few files a scan must open.  Both
operators are pure DataFrame expressions — integer bit arithmetic and
window sums — so the same code runs on the catalog-sized metadata of a
real lake.

* :func:`zorder_key` — Morton (bit-interleaved) clustering key over two
  bucketed dimensions.  Sorting/range-partitioning by this key before a
  write gives every file a bounded min/max envelope in BOTH dimensions,
  so point/range predicates on either column prune files (linear layouts
  prune only their leading sort column).  The bit-spread is four
  shift/mask steps per dimension — plain 64-bit integer ops that stay
  inside whole-stage codegen and reproduce exactly in any SQL engine
  (:func:`zorder_sql` emits the identical expression for the oracle).
  This is the EXACT key over pre-bucketed integer dimensions; the
  data-driven variant that buckets raw double/skewed columns by
  ``approxQuantile`` first (and the writers for both) lives in
  ``operators/zorder.py`` — the two are deliberately split because only
  the exact key is engine-reproducible and therefore oracle-pairable.
* :func:`skipping_audit` — given per-row dimension buckets and a file
  assignment, computes each file's min/max envelope and a per-layout
  summary (envelope widths + how many files a probe predicate must
  scan).  This is the measurement half of a clustering decision: run it
  over candidate layouts and keep the one with fewer files hit.  Cost at
  scale: one scan + two file-count-sized aggregations, no wide state.
* :func:`compaction_plan` — next-fit-decreasing bin packing of a file
  listing into target-size compaction groups, as one window cumsum per
  table partition.  True first-fit-decreasing is inherently sequential
  (each file's bin depends on every earlier bin's residual); NFD over a
  size-descending order is the standard scalable compromise — within
  2× optimal, deterministic, and expressible as a prefix sum, so a
  million-file catalog plans in one window pass with no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Shift/mask steps that spread a 16-bit value's bits into the even bit
#: positions of a 32-bit lane (classic Morton encoding):
#: abcdefgh -> a0b0c0d0e0f0g0h0.  Applying the same four steps to both
#: dimensions and OR-ing one shifted left by 1 interleaves them.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(c: Column) -> Column:
    c = c.cast("long")
    for shift, mask in _SPREAD_STEPS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def zorder_key(x: Column, y: Column) -> Column:
    """Morton-interleave two bucket columns (each in [0, 2^16)) into one
    clustering key: bit i of ``x`` lands at position 2i, bit i of ``y``
    at 2i+1.  All shift/mask integer ops — codegen-friendly, engine
    reproducible."""
    return _spread_bits(x).bitwiseOR(F.shiftleft(_spread_bits(y), 1))


def zorder_sql(x_expr: str, y_expr: str) -> str:
    """The SQL twin of :func:`zorder_key` — emits the identical
    shift/mask chain over two (small, cheap-to-repeat) SQL expressions,
    so a DuckDB oracle computes bit-identical keys."""

    def spread(e: str) -> str:
        for shift, mask in _SPREAD_STEPS:
            e = f"((({e}) | (({e}) << {shift})) & {mask})"
        return e

    return f"({spread(x_expr)} | ({spread(y_expr)} << 1))"


def skipping_audit(
    df: DataFrame,
    layouts: dict[str, Column],
    x: Column,
    y: Column,
    probe_x: int,
    probe_y: int,
) -> DataFrame:
    """Data-skipping audit over candidate file layouts.

    ``layouts`` maps a layout name to that layout's file-id expression
    (a pure function of the row, e.g. ``zorder_key(x, y) / width``).
    For each layout this computes every file's min/max envelope in both
    dimensions, then one summary row per layout:

    ``n_files, n_rows, sum_x_span, sum_y_span`` (exact BIGINTs — divide
    by ``n_files`` for the mean envelope width) and
    ``files_hit_x / files_hit_y`` — how many files a point predicate on
    that dimension (``probe_x`` / ``probe_y``) cannot skip, i.e. the
    fraction of the table an engine with min/max file statistics reads.

    Plan shape: the row is expanded once per layout (bounded fan-out =
    len(layouts)), then two hash aggregations — the first keyed on
    (layout, file_id) with map-side combine, the second file-count-sized.
    At 100 TB the audit costs one table scan; everything downstream is
    metadata-sized.
    """
    tagged = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("layout"),
                        fid.cast("long").alias("file_id"),
                        x.cast("long").alias("xb"),
                        y.cast("long").alias("yb"),
                    )
                    for name, fid in layouts.items()
                ]
            )
        ).alias("s")
    ).select("s.*")
    per_file = tagged.groupBy("layout", "file_id").agg(
        F.min("xb").alias("min_x"),
        F.max("xb").alias("max_x"),
        F.min("yb").alias("min_y"),
        F.max("yb").alias("max_y"),
        F.count("*").alias("n"),
    )
    hit = lambda lo, hi, p: F.count(  # noqa: E731 — local plumbing
        F.when((F.col(lo) <= p) & (F.lit(p) <= F.col(hi)), 1)
    )
    return per_file.groupBy("layout").agg(
        F.count("*").alias("n_files"),
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(F.col("max_x") - F.col("min_x") + 1).cast("long").alias("sum_x_span"),
        F.sum(F.col("max_y") - F.col("min_y") + 1).cast("long").alias("sum_y_span"),
        hit("min_x", "max_x", probe_x).cast("long").alias("files_hit_x"),
        hit("min_y", "max_y", probe_y).cast("long").alias("files_hit_y"),
    )


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    partition_cols: list[str] | None = None,
    file_id_cols: list[str] | None = None,
    bytes_col: str = "bytes",
) -> DataFrame:
    """Assign each file to a compaction bin: next-fit-decreasing bin
    packing as a window prefix sum.

    Files are ordered size-descending (ties broken by ``file_id_cols``
    so the plan is a pure function of the listing) within each table
    partition; a file's bin is ``floor(exclusive_prefix_sum / target)``
    where each file contributes ``min(bytes, target)`` to the prefix.
    The clamp makes an oversized file (> target) consume exactly one
    window — it lands alone in its bin and the next file starts at a
    fresh window boundary instead of inheriting the oversized file's
    fractional remainder (unclamped, a 99 999-byte file at target 4 000
    leaves 1 byte of window, splitting the small files that follow
    across two bins).  It also makes bin ids provably contiguous from 0
    per partition: each prefix step is ≤ target, so floor() advances by
    at most 1.

    The window partitions by ``partition_cols`` (compaction never merges
    across table partitions), so a real lake's plan parallelizes per
    partition — no global sort, and each task's state is one running
    sum.  Input is a file *listing* (catalog metadata, ~1 row per file),
    so even a 100 TB / million-file table plans in seconds.

    Returns one row per (partition, bin): file count, total bytes, and
    the min/max file size folded in (the min shows how small a file the
    bin rescues; bins with n_files == 1 and total >= target are already
    compact and can be skipped by the rewrite job).
    """
    parts = partition_cols or []
    order = [F.col(bytes_col).desc()] + [F.col(c) for c in (file_id_cols or [])]
    w = (
        Window.partitionBy(*parts).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    clamped = F.least(F.col(bytes_col), F.lit(target_bytes).cast("long"))
    binned = files.withColumn(
        "bin",
        F.floor(
            (F.sum(clamped).over(w) - clamped) / F.lit(target_bytes)
        ).cast("long"),
    )
    return binned.groupBy(*parts, "bin").agg(
        F.count("*").alias("n_files"),
        F.sum(bytes_col).cast("long").alias("total_bytes"),
        F.min(bytes_col).cast("long").alias("min_file_bytes"),
        F.max(bytes_col).cast("long").alias("max_file_bytes"),
    )
