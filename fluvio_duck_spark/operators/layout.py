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

* :func:`zorder_key` — Morton (bit-interleaved) clustering key over
  2–7 bucketed dimensions (real lakes cluster (ts, user, type), not
  just two).  Sorting/range-partitioning by this key before a write
  gives every file a bounded min/max envelope in EVERY dimension, so
  point/range predicates on any column prune files (linear layouts
  prune only their leading sort column).  The bit-spread is a handful
  of shift/mask steps per dimension (:func:`morton_geometry` derives
  the chain for any stride) — plain 64-bit integer ops that stay
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

def morton_geometry(n_dims: int) -> tuple[int, tuple[tuple[int, int], ...]]:
    """(bits_per_dim, ((shift, mask), ...)) for a stride-``n_dims`` bit
    spread: source bit i lands at interleaved position ``i * n_dims``.

    The chain generalizes the classic 2-d Morton shift/mask steps
    (8/0x00FF00FF, 4/0x0F0F0F0F, 2/0x33333333, 1/0x55555555): halving
    group sizes g = B/2 … 1, each step shifts by ``g * (n_dims - 1)``
    and masks to "g consecutive bits every g * n_dims positions".
    bits_per_dim is the largest power of two with
    ``bits * n_dims <= 63`` (the interleaved key must stay positive in
    a signed 64-bit long): 16 bits for 2–3 dims, 8 bits for 4–7.
    """
    if not 2 <= n_dims <= 7:
        raise ValueError(f"n_dims must be in [2, 7], got {n_dims}")
    bits = 16
    while bits * n_dims > 63:
        bits //= 2
    steps = []
    g = bits
    while g > 1:
        g //= 2
        mask = 0
        pos = 0
        while pos + g <= 63:
            mask |= ((1 << g) - 1) << pos
            pos += g * n_dims
        steps.append((g * (n_dims - 1), mask))
    return bits, tuple(steps)


def _spread_bits(c: Column, steps: tuple[tuple[int, int], ...]) -> Column:
    c = c.cast("long")
    for shift, mask in steps:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def zorder_key(*dims: Column) -> Column:
    """Morton-interleave N bucket columns (each in [0, 2^bits_per_dim),
    see :func:`morton_geometry`) into one clustering key: bit i of
    dimension j lands at position ``i * N + j``.  All shift/mask integer
    ops — codegen-friendly, engine reproducible, for 2–7 dimensions
    (real lakes cluster e.g. (ts, user, type))."""
    _, steps = morton_geometry(len(dims))
    key = _spread_bits(dims[0], steps)
    for j, d in enumerate(dims[1:], start=1):
        key = key.bitwiseOR(F.shiftleft(_spread_bits(d, steps), j))
    return key


def zorder_sql(*exprs: str) -> str:
    """The SQL twin of :func:`zorder_key` — emits the identical
    shift/mask chain over N (small, cheap-to-repeat) SQL expressions,
    so a DuckDB oracle computes bit-identical keys.  Each input is cast
    to BIGINT first: an INT32-typed expression would overflow the wider
    strides' shifts (e.g. 65535 << 16) before SQL integer promotion."""
    _, steps = morton_geometry(len(exprs))

    def spread(e: str) -> str:
        e = f"CAST(({e}) AS BIGINT)"
        for shift, mask in steps:
            e = f"((({e}) | (({e}) << {shift})) & {mask})"
        return e

    parts = [spread(exprs[0])] + [
        f"({spread(e)} << {j})" for j, e in enumerate(exprs[1:], start=1)
    ]
    return "(" + " | ".join(parts) + ")"


def skipping_audit_nd(
    df: DataFrame,
    layouts: dict[str, Column],
    dims: dict[str, Column],
    probes: dict[str, int],
) -> DataFrame:
    """Data-skipping audit over candidate file layouts, N dimensions.

    ``layouts`` maps a layout name to that layout's file-id expression
    (a pure function of the row, e.g. ``zorder_key(*dims) / width``);
    ``dims`` maps a dimension name to its bucket column; ``probes`` maps
    each dimension name to a point-probe value.  For each layout this
    computes every file's min/max envelope in every dimension, then one
    summary row per layout:

    ``n_files, n_rows`` plus, per dimension ``d``: ``sum_<d>_span``
    (exact BIGINT — divide by ``n_files`` for the mean envelope width)
    and ``files_hit_<d>`` — how many files a point predicate on that
    dimension cannot skip, i.e. the fraction of the table an engine with
    min/max file statistics reads.

    Plan shape: the row is expanded once per layout (bounded fan-out =
    len(layouts)), then two hash aggregations — the first keyed on
    (layout, file_id) with map-side combine, the second file-count-sized.
    At 100 TB the audit costs one table scan; everything downstream is
    metadata-sized.
    """
    if set(dims) != set(probes):
        raise ValueError(f"dims/probes mismatch: {set(dims) ^ set(probes)}")
    tagged = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("layout"),
                        fid.cast("long").alias("file_id"),
                        *[
                            c.cast("long").alias(f"__{d}")
                            for d, c in dims.items()
                        ],
                    )
                    for name, fid in layouts.items()
                ]
            )
        ).alias("s")
    ).select("s.*")
    per_file = tagged.groupBy("layout", "file_id").agg(
        F.count("*").alias("n"),
        *[
            agg
            for d in dims
            for agg in (
                F.min(f"__{d}").alias(f"min_{d}"),
                F.max(f"__{d}").alias(f"max_{d}"),
            )
        ],
    )
    hit = lambda lo, hi, p: F.count(  # noqa: E731 — local plumbing
        F.when((F.col(lo) <= p) & (F.lit(p) <= F.col(hi)), 1)
    )
    return per_file.groupBy("layout").agg(
        F.count("*").alias("n_files"),
        F.sum("n").cast("long").alias("n_rows"),
        *[
            F.sum(F.col(f"max_{d}") - F.col(f"min_{d}") + 1)
            .cast("long")
            .alias(f"sum_{d}_span")
            for d in dims
        ],
        *[
            hit(f"min_{d}", f"max_{d}", probes[d])
            .cast("long")
            .alias(f"files_hit_{d}")
            for d in dims
        ],
    )


def skipping_audit(
    df: DataFrame,
    layouts: dict[str, Column],
    x: Column,
    y: Column,
    probe_x: int,
    probe_y: int,
) -> DataFrame:
    """Two-dimensional form of :func:`skipping_audit_nd` (column names
    ``sum_x_span/sum_y_span/files_hit_x/files_hit_y``)."""
    return skipping_audit_nd(
        df, layouts, {"x": x, "y": y}, {"x": probe_x, "y": probe_y}
    )


def compaction_bins(
    files: DataFrame,
    target_bytes: int,
    partition_cols: list[str] | None = None,
    file_id_cols: list[str] | None = None,
    bytes_col: str = "bytes",
) -> DataFrame:
    """Per-FILE bin assignment (the input listing plus a ``bin``
    column) — the executable half of :func:`compaction_plan`: feed it to
    ``sinks.apply_compaction_plan`` to drive the physical rewrite, or
    aggregate it (as ``compaction_plan`` does) for the plan summary.
    Binning logic documented on :func:`compaction_plan`."""
    parts = partition_cols or []
    order = [F.col(bytes_col).desc()] + [F.col(c) for c in (file_id_cols or [])]
    w = (
        Window.partitionBy(*parts).orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    clamped = F.least(F.col(bytes_col), F.lit(target_bytes).cast("long"))
    return files.withColumn(
        "bin",
        F.floor(
            (F.sum(clamped).over(w) - clamped) / F.lit(target_bytes)
        ).cast("long"),
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
    binned = compaction_bins(
        files, target_bytes, partition_cols, file_id_cols, bytes_col
    )
    return binned.groupBy(*parts, "bin").agg(
        F.count("*").alias("n_files"),
        F.sum(bytes_col).cast("long").alias("total_bytes"),
        F.min(bytes_col).cast("long").alias("min_file_bytes"),
        F.max(bytes_col).cast("long").alias("max_file_bytes"),
    )
