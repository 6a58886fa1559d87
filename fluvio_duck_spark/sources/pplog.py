"""Per-partition-offset record log — the reference's ACTUAL storage model.

A real Fluvio topic is N independent partition logs, each with its own
dense offset sequence 0..LEO_p-1 and its own log-end offset (reference
src/partition.rs:107-134: LEO is read per partition replica; offsets
never span partitions).  The default stand-in (sources/consume.py)
collapses this to one global sequence because the driver fixture is one
table — faithful for ``-A`` over the whole log, but it cannot express
"partition 2's offset 5" ≠ "partition 3's offset 5".

This module provides the genuinely multi-fragment fixture and the two
front ends over it:

* ``per_partition_log`` — in-plan derivation from the ``events``
  fixture: partition = user_id % 4, offset = dense per-partition rank
  by event_id.  Deterministic, so a DuckDB oracle can replicate it
  exactly (ROW_NUMBER() OVER (PARTITION BY ... ORDER BY event_id) - 1).
  The rank window is a fixture-derivation cost only: a real partition
  log already carries its offsets, so no production plan pays it.
* ``write_pp_log_dir`` — materializes the log as ONE PARQUET DIRECTORY
  PER PARTITION (``partition=<k>/part-*.parquet``), each fragment
  carrying only that partition's offset sequence — the layout a
  connector snapshotting real partition logs would produce.  Idempotent
  per source fixture (mtime-keyed marker), bounded scratch (one dir per
  sf fixture under one root).

The consume surface accepts either shape: ``fluvio_consume(...,
source=per_partition_log(...), per_partition_offsets=True)`` switches
the offset algebra to per-partition anchoring, and
``spark.read.format("fluvio").option("log_dir", ...)`` plans one
InputPartition per partition directory with that partition's own
footer-statistics LEO (sources/datasource.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluvio_duck_spark.sources.consume import STANDIN_PARTITIONS, read_events


def per_partition_log(
    spark: SparkSession, sf_dir: str, n_partitions: int = STANDIN_PARTITIONS
) -> DataFrame:
    """The events fixture re-keyed to the reference's per-partition
    offset model: ``(offset, timestamp, partition, value)`` where
    ``offset`` is dense 0..n_p-1 WITHIN each partition (rank by
    event_id).  One shuffle keyed by partition — fixture derivation
    only; a real log arrives with offsets attached."""
    ev = read_events(spark, sf_dir)
    part = (F.col("user_id") % n_partitions).cast(T.IntegerType())
    w = Window.partitionBy(part).orderBy("event_id")
    return ev.select(
        (F.row_number().over(w) - 1).cast(T.LongType()).alias("offset"),
        F.col("ts").alias("timestamp"),
        part.alias("partition"),
        F.col("props").alias("value"),
    )


def write_pp_log_dir(
    spark: SparkSession, sf_dir: str, n_partitions: int = STANDIN_PARTITIONS
) -> str:
    """Materialize ``per_partition_log`` as a partition-per-directory
    parquet layout and return its path.  Idempotent per source fixture:
    re-derives only when ``events.parquet`` changes (mtime-keyed
    marker), so repeated driver/bench runs reuse the same bounded
    scratch dir."""
    import hashlib

    src = os.path.join(sf_dir, "events.parquet")
    mtime = f"{os.path.getmtime(src):.0f}|{n_partitions}"
    # key by ABSOLUTE source path: distinct fixtures sharing a basename
    # (/root/testdata/sf0.1 vs the bench cache's sf0.1) must not thrash
    # one scratch dir back and forth
    abs_src = os.path.abspath(sf_dir.rstrip("/"))
    base = (os.path.basename(abs_src) + "-"
            + hashlib.md5(abs_src.encode()).hexdigest()[:8])
    root = os.path.join(tempfile.gettempdir(), "fluvio_duck_pplog", base)
    marker = os.path.join(root, "_READY")
    if os.path.exists(marker) and open(marker).read() == mtime:
        return root
    log = per_partition_log(spark, sf_dir, n_partitions)
    (
        log.repartition("partition")
        .sortWithinPartitions("offset")
        .write.mode("overwrite")
        .partitionBy("partition")
        .parquet(root)
    )
    with open(marker, "w") as fh:
        fh.write(mtime)
    return root


def pp_partition_dirs(log_dir: str) -> dict[int, str]:
    """partition id → fragment directory of a per-partition log
    (``partition=<k>/`` layout, :func:`write_pp_log_dir`).  Shared by the
    DataSource batch/stream planners and the metadata scan — one
    definition of "what partitions does this log have"."""
    import glob
    import re

    out: dict[int, str] = {}
    for d in sorted(glob.glob(os.path.join(log_dir, "partition=*"))):
        m = re.search(r"partition=(\d+)$", d)
        if m:
            out[int(m.group(1))] = d
    if not out:
        raise ValueError(
            f"log_dir {log_dir!r} has no partition=<k> directories"
        )
    return out


def pp_footer_leo(part_dir: str) -> int:
    """One partition log's LEO from its fragments' parquet footer
    statistics — the per-replica leo read of reference
    src/partition.rs:131.  Metadata-only: footers are parsed, no row
    group is decoded."""
    import glob

    import pyarrow.parquet as pq

    leo = -1
    for frag in sorted(glob.glob(os.path.join(part_dir, "*.parquet"))):
        pf = pq.ParquetFile(frag)
        idx = pf.schema_arrow.get_field_index("offset")
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            if st is not None and st.max is not None:
                leo = max(leo, int(st.max))
    return leo + 1


#: DuckDB twin of ``per_partition_log`` — keep the two derivations in
#: lockstep; every pp-log oracle builds on this CTE.
ORACLE_PP_LOG = """
SELECT ROW_NUMBER() OVER (PARTITION BY user_id % 4 ORDER BY event_id) - 1
         AS "offset",
       ts AS "timestamp",
       CAST(user_id % 4 AS INTEGER) AS "partition",
       props AS "value"
FROM events
"""
