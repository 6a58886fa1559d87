"""Log compaction: latest record per key — the compacted-topic semantics
of the reference's domain (a Fluvio/Kafka log compacted down to current
state per key; the reference exposes the raw log via ``fluvio_consume``,
reference src/consume.rs:467-470, and leaves state reconstruction to SQL).

Implemented as ``max_by`` over a composite order key, NOT a
``row_number() == 1`` window: the aggregate form has a map-side partial
implementation, so each input partition pre-compacts to one row per key
before the exchange — at 100 TB the shuffle carries |mappers|x|keys|
rows instead of every record, and there is no per-key in-partition sort.
The window form shuffles and sorts the entire log.

The same aggregate runs unchanged under Structured Streaming (grouped
aggs keep mergeable state per key), giving a continuously-maintained
materialized current-state view — ``streaming/windows.py``'s rollup
pattern applied to keyed state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compact_latest(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    payload: list[str],
    prefix: str = "last_",
) -> DataFrame:
    """One row per ``keys``: the ``payload`` columns of the record with
    the greatest ``order_by`` tuple (lexicographic struct comparison —
    append a unique column, e.g. the offset, to make the order total).

    Output columns: ``keys`` + ``prefix``-renamed payload.
    """
    ordk = F.struct(*[F.col(c) for c in order_by])
    pay = F.struct(*[F.col(c).alias(c) for c in payload])
    out = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.max_by(pay, ordk).alias("_latest")
    )
    return out.select(
        *keys, *[F.col(f"_latest.{c}").alias(f"{prefix}{c}") for c in payload]
    )


def tombstone_compact(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    payload: list[str],
    tombstone: Column,
    prefix: str = "last_",
) -> DataFrame:
    """Compaction with deletes: a record matching ``tombstone`` (the
    null-value convention of compacted logs) removes its key entirely
    when it is the latest record.  Same single-shuffle aggregate; the
    tombstone flag rides along in the payload struct and filters the
    compacted result, so deleted keys cost one row until compaction,
    never a second pass over the log.
    """
    flagged = df.withColumn("_del", tombstone)
    out = compact_latest(flagged, keys, order_by, payload + ["_del"], prefix)
    return out.filter(~F.col(f"{prefix}_del")).drop(f"{prefix}_del")
