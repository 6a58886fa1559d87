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
* ``--rows`` compiles three ways: the dense-offset-range predicate (the
  L1 pushdown form) for ``-A`` on a whole-log topic; a LOCAL top-n when
  a single partition is pinned (that partition is the whole selection);
  and ``-A`` over a sparse sub-topic raises — a global budget there
  needs cross-partition coordination a DataSource partition does not
  have, which is exactly what ``fluvio_consume``'s ordered-limit plan
  provides.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from fluvio_duck_spark.options import parse_consume_opts

_SCHEMA = "offset bigint, timestamp timestamp, partition int, value string"
_N_PARTITIONS = 4  # events stand-in: user_id % 4 (sources/consume.py)
_WHOLE_LOG_TOPICS = {"events", "*"}


class _FluvioPartition(InputPartition):
    def __init__(self, pid: int):
        self.pid = pid


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
        self.sf_dir = options.get("sf_dir")
        if not self.sf_dir:
            raise ValueError("fluvio datasource requires .option('sf_dir', ...)")
        args = options.get("args", "-B")
        self.opts = parse_consume_opts(f"{self.topic} {args}".split())
        # --rows compiles three ways: dense-offset range for -A on a
        # whole-log topic; a LOCAL top-n when a single partition is
        # pinned (that partition IS the whole selection); impossible for
        # -A over a sparse sub-topic (global budget needs cross-
        # partition coordination a DataSource partition doesn't have)
        self.local_budget = False
        if self.opts.rows is not None:
            if not self.opts.all_partitions:
                self.local_budget = True
            elif self.topic not in _WHOLE_LOG_TOPICS:
                raise NotImplementedError(
                    "--rows with -A on a sparse sub-topic needs cross-"
                    "partition coordination; use fluvio_consume() for "
                    "that combination"
                )

    def partitions(self):
        # reference semantics: partition 0 unless -A/--all-partitions
        # (options.py:155-156; the reference parses -p but pins 0 —
        # we honor the parsed value, SURVEY §1.4.2 fix)
        if not self.opts.all_partitions:
            return [_FluvioPartition(int(self.opts.partition))]
        return [_FluvioPartition(p) for p in range(_N_PARTITIONS)]

    def read(self, partition: _FluvioPartition):
        import os

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        path = os.path.join(self.sf_dir, "events.parquet")
        pf = pq.ParquetFile(path)
        # LEO from footer statistics — no data scan for the tail anchor
        leo = -1
        idx = pf.schema_arrow.get_field_index("event_id")
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            if st is not None and st.max is not None:
                leo = max(leo, int(st.max))
        leo += 1

        start = self.opts.calculate_start()
        lo, hi = 0, None
        if start.kind in ("head", "start"):
            lo = start.n
        elif start.kind == "tail":
            lo = max(leo - start.n, 0)
        elif start.kind == "end":
            lo = leo
        if self.opts.end is not None:
            hi = self.opts.end
        if self.opts.rows is not None and not self.local_budget:
            # dense-offset row budget: first n offsets at or above lo
            budget_hi = lo + self.opts.rows - 1
            hi = budget_hi if hi is None else min(hi, budget_hi)

        tbl = pf.read(columns=["event_id", "ts", "user_id", "props", "event_type"])
        if self.topic not in _WHOLE_LOG_TOPICS:
            tbl = tbl.filter(pc.equal(tbl["event_type"], self.topic))
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        part = pa.array((uid % _N_PARTITIONS).astype("int32"))
        tbl = tbl.append_column("partition", part)
        mask = pc.equal(tbl["partition"], partition.pid)
        mask = pc.and_(mask, pc.greater_equal(tbl["event_id"], lo))
        if hi is not None:
            mask = pc.and_(mask, pc.less_equal(tbl["event_id"], hi))
        tbl = tbl.filter(mask)
        if self.local_budget:
            tbl = tbl.sort_by("event_id").slice(0, self.opts.rows)

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
    """

    def __init__(self, options):
        self.topic = options.get("topic", "events")
        self.sf_dir = options.get("sf_dir")
        if not self.sf_dir:
            raise ValueError("fluvio datasource requires .option('sf_dir', ...)")
        self.batch_rows = int(options.get("max_rows_per_batch", "5000"))

    # -- offset bookkeeping ------------------------------------------------
    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _leo(self) -> int:
        import os

        import pyarrow.parquet as pq

        pf = pq.ParquetFile(os.path.join(self.sf_dir, "events.parquet"))
        leo = -1
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

        pf = pq.ParquetFile(os.path.join(self.sf_dir, "events.parquet"))
        tbl = pf.read(columns=["event_id", "ts", "user_id", "props", "event_type"])
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
        lo = int(start["offset"])
        hi = min(lo + self.batch_rows, self._leo())
        if hi <= lo:
            return iter([]), {"offset": lo}
        # the simple reader ships rows driver->executor by pickling and
        # probes no-progress batches with next() — materialize the
        # bounded chunk and hand back a (picklable) list iterator
        return iter(list(self._rows(lo, hi))), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._rows(int(start["offset"]), int(end["offset"])))

    def commit(self, end: dict) -> None:
        pass  # the log is immutable — nothing to clean up


def _simple_stream_reader(self, schema):
    return FluvioSimpleStreamReader(self.options)


FluvioDataSource.simpleStreamReader = _simple_stream_reader
