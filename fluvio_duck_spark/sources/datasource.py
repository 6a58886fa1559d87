"""``spark.read.format("fluvio")`` — the topic scan as a registered
Spark 4 Python DataSource.

The reference exposes its connector as a table function the host engine
plans like any other relation (``fluvio_consume('<topic> <flags>')``,
reference src/lib.rs:37-39).  Spark 4's Python DataSource API is the
first-class equivalent: after ``spark.dataSource.register(
FluvioDataSource)`` the topic reads as

    spark.read.format("fluvio")
         .option("topic", "events").option("args", "-B --rows 3000")
         .option("sf_dir", "/root/testdata/sf0.01").load()

with one ``InputPartition`` per Fluvio partition, so partition
parallelism is the cluster's, not the driver's.  Offset algebra
(-B/-H/-T/--start/--end) evaluates worker-side against the parquet
stand-in; the log-end offset for ``-T`` comes from parquet FOOTER
STATISTICS (row-group max), not a data scan.

Contract notes:
* ``fluvio_consume()`` (sources/consume.py) remains the performance
  path — it plans a native vectorized parquet scan that Catalyst fuses
  with the query on top.  This DataSource is the connector-ergonomics
  surface: same semantics, Arrow-batched Python reads (one Python
  worker hop per batch).
* ALL offset algebra resolves at PLAN time, driver-side in
  ``partitions()`` — each ``InputPartition`` carries a concrete
  ``[lo, hi]`` offset window, so ``read()`` is a pure bounded scan.
  This mirrors how a real connector plans (offset resolution via the
  cluster's offset/metadata API at plan time, record fetch at execute
  time); over the parquet stand-in the "offset API" is footer
  statistics for the dense whole-log case and a 2–3-column driver read
  for sparse selections (sub-topics / pinned partitions), whose tail
  anchor and row budget depend on which offsets the selection owns.
* ``--rows`` compiles three ways (the builder's two-plan logic at
  sources/consume.py:160-204 is the spec): a dense-offset-range bound
  for ``-A`` on a whole-log topic (``hi = lo + rows - 1``); a LOCAL
  top-n when a single partition is pinned (that partition is the whole
  selection); and for ``-A`` over a sparse sub-topic the planner
  resolves the global budget to an offset bound — the rows-th smallest
  matching offset at/above the start — before partition planning, so
  the per-partition readers need no cross-partition coordination
  (closes the VERDICT r3 parity gap with ``fluvio_consume``).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from fluvio_duck_spark.options import parse_consume_opts

_SCHEMA = "offset bigint, timestamp timestamp, partition int, value string"
_N_PARTITIONS = 4  # events stand-in: user_id % 4 (sources/consume.py)
_WHOLE_LOG_TOPICS = {"events", "*"}


def _log_fragments(sf_dir: str) -> list[str]:
    """Parquet fragment files of the events log: a single file (the
    driver fixtures) or the part-files of a directory layout (any real
    multi-file ingest — at scale a topic is never one file).  Footer-
    statistics walks iterate these; bulk reads go through
    ``pq.read_table``, which handles both layouts natively."""
    import glob
    import os

    path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path]


class _FluvioPartition(InputPartition):
    """One Fluvio partition plus its plan-time-resolved offset window.

    ``lo`` is inclusive; ``hi`` is inclusive or None (unbounded);
    ``budget`` is a LOCAL top-n applied after the window when a single
    pinned partition is the whole selection."""

    def __init__(self, pid: int, lo: int = 0, hi: int | None = None,
                 budget: int | None = None):
        self.pid = pid
        self.lo = lo
        self.hi = hi
        self.budget = budget


class FluvioDataSource(DataSource):
    """Batch reader for the Fluvio topic stand-in."""

    @classmethod
    def name(cls) -> str:
        return "fluvio"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "FluvioReader":
        return FluvioReader(self.options)


class FluvioReader(DataSourceReader):
    def __init__(self, options):
        self.topic = options.get("topic", "events")
        # log_dir mode: the path IS the topic — a directory of
        # per-partition parquet logs (``partition=<k>/part-*.parquet``,
        # each fragment carrying its own dense offset sequence), the
        # reference's actual storage model (src/partition.rs:107-134).
        # All offset algebra then anchors per partition.
        self.log_dir = options.get("log_dir")
        self.sf_dir = options.get("sf_dir")
        if not self.sf_dir and not self.log_dir:
            raise ValueError(
                "fluvio datasource requires .option('sf_dir', ...) or "
                ".option('log_dir', ...)"
            )
        args = options.get("args", "-B")
        self.opts = parse_consume_opts(f"{self.topic} {args}".split())
        # LOCAL top-n: a pinned single partition is the whole selection,
        # so the --rows budget applies within the one reader task.
        self.local_budget = (
            self.opts.rows is not None and not self.opts.all_partitions
        )

    # -- plan-time offset resolution --------------------------------------
    def _selection_offsets(self):
        """Sorted offsets the selection owns — the stand-in's analogue of
        the cluster offset index (driver-side, 2–3 columns, plan time)."""
        import os

        import numpy as np
        import pyarrow.parquet as pq

        cols = ["event_id"]
        if self.topic not in _WHOLE_LOG_TOPICS:
            cols.append("event_type")
        if not self.opts.all_partitions:
            cols.append("user_id")
        tbl = pq.read_table(
            os.path.join(self.sf_dir, "events.parquet"), columns=cols
        )
        mask = np.ones(tbl.num_rows, dtype=bool)
        if self.topic not in _WHOLE_LOG_TOPICS:
            mask &= tbl["event_type"].to_numpy(zero_copy_only=False) == self.topic
        if not self.opts.all_partitions:
            uid = tbl["user_id"].to_numpy(zero_copy_only=False)
            mask &= (uid % _N_PARTITIONS) == int(self.opts.partition)
        off = tbl["event_id"].to_numpy(zero_copy_only=False)[mask]
        off.sort()
        return off

    def _footer_leo(self) -> int:
        """Whole-log LEO from parquet footer statistics — no data scan."""
        import os

        import pyarrow.parquet as pq

        leo = -1
        for frag in _log_fragments(self.sf_dir):
            pf = pq.ParquetFile(frag)
            idx = pf.schema_arrow.get_field_index("event_id")
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                if st is not None and st.max is not None:
                    leo = max(leo, int(st.max))
        return leo + 1

    def _resolve_window(self) -> tuple[int, int | None]:
        """Offset algebra → concrete [lo, hi] window, at plan time.

        Dense case (whole log, all partitions): footer-stats LEO and
        arithmetic bounds only.  Sparse case (sub-topic or pinned
        partition): the tail anchor is the SELECTION's log-end — the max
        offset the selection owns, plus one — matching the builder,
        which filters the log before applying the offset algebra
        (sources/consume.py:152-160); likewise real Fluvio resolves -T
        against the chosen partition's LEO, not some global counter."""
        dense = (
            self.topic in _WHOLE_LOG_TOPICS and self.opts.all_partitions
        )
        sel = None  # lazily-resolved sorted selection offsets

        start = self.opts.calculate_start()
        lo = 0
        if start.kind in ("head", "start"):
            lo = start.n
        elif start.kind in ("tail", "end"):
            if dense:
                leo = self._footer_leo()
            else:
                sel = self._selection_offsets()
                leo = int(sel[-1]) + 1 if len(sel) else 0
            lo = leo if start.kind == "end" else max(leo - start.n, 0)

        hi = self.opts.end  # inclusive, may be None
        if self.opts.rows is not None and not self.local_budget:
            if dense:
                # dense offsets: first n at/above lo is pure arithmetic
                budget_hi = lo + self.opts.rows - 1
            else:
                # sparse sub-topic with -A: resolve the global budget to
                # the rows-th smallest matching offset in [lo, hi]
                if sel is None:
                    sel = self._selection_offsets()
                win = sel[sel >= lo]
                if hi is not None:
                    win = win[win <= hi]
                if len(win) <= self.opts.rows:
                    budget_hi = None  # budget exceeds selection: keep all
                else:
                    budget_hi = int(win[self.opts.rows - 1])
            if budget_hi is not None:
                hi = budget_hi if hi is None else min(hi, budget_hi)
        return lo, hi

    # -- log_dir (per-partition offset) planning ---------------------------
    def _pp_partition_dirs(self) -> dict[int, str]:
        """partition id → fragment directory of a per-partition log."""
        from fluvio_duck_spark.sources.pplog import pp_partition_dirs

        return pp_partition_dirs(self.log_dir)

    def _pp_footer_leo(self, part_dir: str) -> int:
        """One partition's LEO from ITS fragments' footer statistics —
        the per-replica leo read of reference src/partition.rs:131."""
        from fluvio_duck_spark.sources.pplog import pp_footer_leo

        return pp_footer_leo(part_dir)

    def _pp_partitions(self):
        """One InputPartition per partition directory, each with a
        window resolved against that partition's OWN log end (offsets
        are dense per partition, so every bound is arithmetic — no data
        scan at plan time)."""
        dirs = self._pp_partition_dirs()
        if not self.opts.all_partitions:
            pid = int(self.opts.partition)
            if pid not in dirs:
                # unknown partition → empty scan (the stand-in's
                # unknown-topic convention; Spark requires ≥1 partition)
                p = _FluvioPartition(pid, 0, None)
                p.empty = True
                return [p]
            dirs = {pid: dirs[pid]}
        start = self.opts.calculate_start()
        out = []
        for pid, d in sorted(dirs.items()):
            lo = 0
            if start.kind in ("head", "start"):
                lo = start.n
            elif start.kind in ("tail", "end"):
                leo = self._pp_footer_leo(d)
                lo = leo if start.kind == "end" else max(leo - start.n, 0)
            hi = self.opts.end
            if self.opts.rows is not None:
                # dense per-partition offsets: each partition's budget
                # is arithmetic (matches the builder's per-partition
                # --rows semantics, sources/consume.py::_pp_row_budget)
                budget_hi = lo + self.opts.rows - 1
                hi = budget_hi if hi is None else min(hi, budget_hi)
            p = _FluvioPartition(pid, lo, hi, None)
            p.part_dir = d
            out.append(p)
        return out

    def partitions(self):
        # reference semantics: partition 0 unless -A/--all-partitions
        # (options.py:155-156; the reference parses -p but pins 0 —
        # we honor the parsed value, SURVEY §1.4.2 fix)
        if self.log_dir:
            return self._pp_partitions()
        lo, hi = self._resolve_window()
        budget = self.opts.rows if self.local_budget else None
        if not self.opts.all_partitions:
            return [_FluvioPartition(int(self.opts.partition), lo, hi, budget)]
        return [_FluvioPartition(p, lo, hi, budget) for p in range(_N_PARTITIONS)]

    def _read_pp(self, partition: "_FluvioPartition"):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            partition.part_dir, columns=["offset", "timestamp", "value"]
        )
        mask = pc.greater_equal(tbl["offset"], partition.lo)
        if partition.hi is not None:
            mask = pc.and_(mask, pc.less_equal(tbl["offset"], partition.hi))
        tbl = tbl.filter(mask)
        ts = tbl["timestamp"]
        if pa.types.is_integer(ts.type):
            ts = pc.cast(pc.divide(ts, 1000), pa.timestamp("us"))
        else:
            ts = pc.cast(ts, pa.timestamp("us"))
        out = pa.table(
            {
                "offset": pc.cast(tbl["offset"], pa.int64()),
                "timestamp": ts,
                "partition": pa.array(
                    [partition.pid] * tbl.num_rows, pa.int32()
                ),
                "value": tbl["value"],
            }
        )
        yield from out.to_batches(max_chunksize=8192)

    def read(self, partition: _FluvioPartition):
        import os

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if getattr(partition, "empty", False):
            return
        if getattr(partition, "part_dir", None) is not None:
            yield from self._read_pp(partition)
            return
        tbl = pq.read_table(
            os.path.join(self.sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "props", "event_type"],
        )
        if self.topic not in _WHOLE_LOG_TOPICS:
            tbl = tbl.filter(pc.equal(tbl["event_type"], self.topic))
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        part = pa.array((uid % _N_PARTITIONS).astype("int32"))
        tbl = tbl.append_column("partition", part)
        mask = pc.equal(tbl["partition"], partition.pid)
        mask = pc.and_(mask, pc.greater_equal(tbl["event_id"], partition.lo))
        if partition.hi is not None:
            mask = pc.and_(mask, pc.less_equal(tbl["event_id"], partition.hi))
        tbl = tbl.filter(mask)
        if partition.budget is not None:
            tbl = tbl.sort_by("event_id").slice(0, partition.budget)

        ts = tbl["ts"]
        if pa.types.is_integer(ts.type):
            ts = pc.cast(pc.divide(ts, 1000), pa.timestamp("us"))
        else:
            ts = pc.cast(ts, pa.timestamp("us"))
        out = pa.table(
            {
                "offset": pc.cast(tbl["event_id"], pa.int64()),
                "timestamp": ts,
                "partition": tbl["partition"],
                "value": tbl["props"],
            }
        )
        yield from out.to_batches(max_chunksize=8192)


def register_fluvio_source(spark) -> None:
    """Idempotently register the ``fluvio`` format on this session."""
    try:
        spark.dataSource.register(FluvioDataSource)
    except Exception:
        pass  # already registered — Spark raises on duplicate names


class FluvioSimpleStreamReader:
    """``spark.readStream.format("fluvio")`` — the reference's
    continuous mode (``-d``) as a Python streaming DataSource.

    Offsets are the native stream position: each micro-batch reads
    ``[start, min(start + max_rows_per_batch, LEO))`` of the global
    offset space and advances; ``readBetweenOffsets`` replays any
    committed range exactly (deterministic log → exactly-once on
    restart).  ``Trigger.AvailableNow`` drains to LEO and stops — the
    bounded/unbounded parity the batch surface proves with ST1.

    ``.option("log_dir", ...)`` switches to the per-partition offset
    model (reference src/partition.rs:107-134, same layout as the batch
    log_dir mode): the stream position is one cursor PER partition log
    (``{"0": off0, "1": off1, ...}``), each micro-batch advances every
    partition by up to ``max_rows_per_batch`` of ITS OWN offsets, and
    replay ranges are per-partition — exactly how a connector over N
    independent partition streams checkpoints.
    """

    def __init__(self, options):
        self.topic = options.get("topic", "events")
        self.log_dir = options.get("log_dir")
        self.sf_dir = options.get("sf_dir")
        if not self.sf_dir and not self.log_dir:
            raise ValueError(
                "fluvio datasource requires .option('sf_dir', ...) or "
                ".option('log_dir', ...)"
            )
        self.batch_rows = int(options.get("max_rows_per_batch", "5000"))

    # -- offset bookkeeping ------------------------------------------------
    def initialOffset(self) -> dict:
        if self.log_dir:
            return {str(pid): 0 for pid in sorted(self._pp_dirs())}
        return {"offset": 0}

    # -- per-partition (log_dir) mode --------------------------------------
    def _pp_dirs(self) -> dict[int, str]:
        from fluvio_duck_spark.sources.pplog import pp_partition_dirs

        return pp_partition_dirs(self.log_dir)

    def _pp_leo(self, part_dir: str) -> int:
        from fluvio_duck_spark.sources.pplog import pp_footer_leo

        return pp_footer_leo(part_dir)

    def _pp_rows(self, pid: int, part_dir: str, lo: int, hi: int):
        """Rows of one partition log in ``[lo, hi)`` of ITS offsets."""
        import datetime as dt

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = pq.read_table(part_dir, columns=["offset", "timestamp", "value"])
        mask = pc.and_(
            pc.greater_equal(tbl["offset"], lo), pc.less(tbl["offset"], hi)
        )
        tbl = tbl.filter(mask).sort_by("offset")
        for off, ts, val in zip(
            tbl["offset"].to_pylist(),
            tbl["timestamp"].to_pylist(),
            tbl["value"].to_pylist(),
        ):
            if isinstance(ts, int):
                ts = dt.datetime.fromtimestamp(ts / 1e9, dt.timezone.utc)
            yield (int(off), ts, pid, val)

    def _pp_read(self, start: dict):
        dirs = self._pp_dirs()
        rows: list = []
        end: dict = {}
        for pid, d in sorted(dirs.items()):
            lo = int(start.get(str(pid), 0))
            hi = min(lo + self.batch_rows, self._pp_leo(d))
            if hi > lo:
                rows.extend(self._pp_rows(pid, d, lo, hi))
                end[str(pid)] = hi
            else:
                end[str(pid)] = lo
        return iter(rows), end

    def _pp_read_between(self, start: dict, end: dict):
        dirs = self._pp_dirs()
        rows: list = []
        for pid, d in sorted(dirs.items()):
            lo = int(start.get(str(pid), 0))
            hi = int(end.get(str(pid), lo))
            if hi > lo:
                rows.extend(self._pp_rows(pid, d, lo, hi))
        return rows

    def _leo(self) -> int:
        import os

        import pyarrow.parquet as pq

        leo = -1
        for frag in _log_fragments(self.sf_dir):
            pf = pq.ParquetFile(frag)
            idx = pf.schema_arrow.get_field_index("event_id")
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                if st is not None and st.max is not None:
                    leo = max(leo, int(st.max))
        return leo + 1

    def _rows(self, lo: int, hi: int):
        import os

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            os.path.join(self.sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id", "props", "event_type"],
        )
        if self.topic not in _WHOLE_LOG_TOPICS:
            tbl = tbl.filter(pc.equal(tbl["event_type"], self.topic))
        mask = pc.and_(
            pc.greater_equal(tbl["event_id"], lo), pc.less(tbl["event_id"], hi)
        )
        tbl = tbl.filter(mask).sort_by("event_id")
        import datetime as dt

        for off, ts, uid, props in zip(
            tbl["event_id"].to_pylist(),
            tbl["ts"].to_pylist(),
            tbl["user_id"].to_pylist(),
            tbl["props"].to_pylist(),
        ):
            if isinstance(ts, int):
                ts = dt.datetime.fromtimestamp(ts / 1e9, dt.timezone.utc)
            yield (int(off), ts, int(uid) % _N_PARTITIONS, props)

    # -- micro-batch protocol ---------------------------------------------
    def read(self, start: dict):
        if self.log_dir:
            return self._pp_read(start)
        lo = int(start["offset"])
        hi = min(lo + self.batch_rows, self._leo())
        if hi <= lo:
            return iter([]), {"offset": lo}
        # the simple reader ships rows driver->executor by pickling and
        # probes no-progress batches with next() — materialize the
        # bounded chunk and hand back a (picklable) list iterator
        return iter(list(self._rows(lo, hi))), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        if self.log_dir:
            return self._pp_read_between(start, end)
        return list(self._rows(int(start["offset"]), int(end["offset"])))

    def commit(self, end: dict) -> None:
        pass  # the log is immutable — nothing to clean up


def _simple_stream_reader(self, schema):
    return FluvioSimpleStreamReader(self.options)


FluvioDataSource.simpleStreamReader = _simple_stream_reader
