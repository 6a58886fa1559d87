"""SQL table-function registration for the metadata scans.

The reference's whole surface is DuckDB *table functions* —
``SELECT * FROM fluvio_topics()`` (reference src/lib.rs:37-39,
src/bind.rs:287-295).  Spark 4's Python UDTFs give the same SQL shape, so
the two metadata scans are registered as real table functions callable
from ``spark.sql``:

    register_sql_table_functions(spark)
    spark.sql("SELECT * FROM fluvio_topics('/root/testdata/sf0.01')")

In a real connector ``eval`` would make one admin-API RPC (the
reference's ``admin.all::<TopicSpec>()``, src/topic.rs:109) — a
metadata-sized call, which is why a single-worker UDTF is the right
shape.  The fixture stand-in derives the same rows from the events
parquet with pyarrow inside the worker.

``fluvio_consume`` deliberately stays a DataFrame *builder*: its result
is data-sized and its pipeline (offset algebra, transforms, mappings)
must run distributed under Catalyst, not inside one UDTF worker —
SURVEY §2.12's builder-as-UDTF mapping.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="name string, partitions int")
class FluvioTopicsUDTF:
    """``fluvio_topics(sf_dir)`` — schema (name, partitions), reference
    src/topic.rs:52-53."""

    def eval(self, sf_dir: str):  # noqa: D102
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
        )
        parts: dict[str, set[int]] = {}
        for name, uid in zip(
            t.column("event_type").to_pylist(), t.column("user_id").to_pylist()
        ):
            parts.setdefault(name, set()).add(uid % 4)
        for name in sorted(parts):
            yield name, len(parts[name])


@udtf(returnType="topic string, partition string, LEO long")
class FluvioPartitionsUDTF:
    """``fluvio_partitions(sf_dir)`` — schema (topic, partition, LEO),
    reference src/partition.rs:52-54; LEO widened to long (SURVEY §1.4)."""

    def eval(self, sf_dir: str):  # noqa: D102
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "event_id"]
        )
        leo: dict[tuple[str, int], int] = {}
        for name, uid, off in zip(
            t.column("event_type").to_pylist(),
            t.column("user_id").to_pylist(),
            t.column("event_id").to_pylist(),
        ):
            k = (name, uid % 4)
            if off >= leo.get(k, -1):
                leo[k] = off
        for (name, p), off in sorted(leo.items()):
            yield name, str(p), off + 1


def register_sql_table_functions(spark) -> None:
    """Register both metadata scans as SQL table functions on ``spark``."""
    spark.udtf.register("fluvio_topics", FluvioTopicsUDTF)
    spark.udtf.register("fluvio_partitions", FluvioPartitionsUDTF)
