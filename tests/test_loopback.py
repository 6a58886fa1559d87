"""Loopback record-server transport (sources/loopback.py): the executed
CONNECTOR.md parity gate — protocol, batch/stream parity with the local
transport, and the kill-and-restart exactly-once replay of §"Parity test
plan" step 4."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from fluvio_duck_spark.sources.datasource import register_fluvio_source
from fluvio_duck_spark.sources.loopback import (
    RecordServer,
    server_fetch,
    server_parts,
)
from fluvio_duck_spark.sources.pplog import write_pp_log_dir

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def log_dir(spark):
    return write_pp_log_dir(spark, SF_DIR)


@pytest.fixture(scope="module")
def server(log_dir):
    srv = RecordServer(log_dir).start()
    yield srv
    srv.stop()


def test_protocol_parts_and_windowed_fetch(server):
    parts = server_parts(server.address)
    assert parts == {0: 273, 1: 232, 2: 289, 3: 206}
    # the window travels TO the server: only the requested range returns
    t = server_fetch(server.address, 2, 5, 8)
    assert t.column_names == ["offset", "timestamp", "value"]
    assert t["offset"].to_pylist() == [5, 6, 7]
    # unbounded hi = the partition's whole log from lo
    t = server_fetch(server.address, 3, 200, None)
    assert t["offset"].to_pylist() == list(range(200, 206))
    # unknown partition reads empty, not an error
    assert server_fetch(server.address, 9, 0, None).num_rows == 0


def test_batch_parity_server_vs_local(spark, server, log_dir):
    """CONNECTOR.md step 2: the same option strings over both transports
    must produce identical row multisets."""
    register_fluvio_source(spark)
    for args in ("-A -T 3 --rows 1000000", "-p 2 -H 5 --end 12 --rows 99999",
                 "-A -B --rows 7", "-p 9 -B"):
        via_server = (
            spark.read.format("fluvio")
            .option("server", server.address).option("args", args).load()
        )
        via_local = (
            spark.read.format("fluvio")
            .option("log_dir", log_dir).option("args", args).load()
        )
        assert sorted(map(tuple, via_server.collect())) == sorted(
            map(tuple, via_local.collect())
        ), args


def test_stream_kill_and_restart_exactly_once(spark, server, tmp_path):
    """CONNECTOR.md step 4's replay clause: kill a checkpointed stream
    mid-drain, restart it against the same server, and the union of both
    runs' sink output must be the log exactly once — per-partition
    offset cursors recover from the checkpoint and re-plan only the
    uncommitted remainder."""
    register_fluvio_source(spark)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start(throttle: str | None, trigger_kwargs):
        reader = (
            spark.readStream.format("fluvio")
            .option("server", server.address)
            .option("max_rows_per_batch", "100")
        )
        if throttle:
            reader = reader.option("throttle_rows_per_trigger", throttle)
        return (
            reader.load()
            .writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(**trigger_kwargs).start()
        )

    # run 1: throttled processing-time stream, killed mid-drain
    q1 = start("60", {"processingTime": "50 milliseconds"})
    deadline = time.time() + 60
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in q1.recentProgress):
            break
        time.sleep(0.2)
    q1.stop()
    q1.awaitTermination()
    n1 = spark.read.parquet(sink).count()
    assert n1 > 0, "first run committed nothing — can't exercise restart"

    # run 2: restart from the checkpoint, unthrottled drain to LEO
    # (processAllAvailable, not availableNow: the Python source's
    # availableNow fallback only re-runs an uncommitted batch on
    # restart, it does not plan new data)
    q2 = start(None, {"processingTime": "50 milliseconds"})
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination()

    out = spark.read.parquet(sink)
    total = sum(server_parts(server.address).values())
    assert out.count() == total  # no loss, no duplication
    assert out.select("partition", "offset").distinct().count() == total
    # each partition drained to its own LEO
    got = {
        r["partition"]: r["mx"]
        for r in out.groupBy("partition").agg(F.max("offset").alias("mx")).collect()
    }
    assert got == {pid: leo - 1 for pid, leo in server_parts(server.address).items()}


def test_filter_pushdown_translate_and_server_semantics(spark, server, log_dir):
    """CONNECTOR.md §5: the translatable sql-filter subset pushes to the
    server and matches the engine-side filter exactly; untranslatable
    clauses return None (and MUST stay engine-side)."""
    from fluvio_duck_spark.sources.loopback import (
        server_fetch,
        translate_sql_filter,
    )

    flt = translate_sql_filter(
        "cast(get_json_object(value, '$.k') as int) >= 50"
    )
    assert flt == {"path": "$.k", "cast": "int", "op": ">=", "value": 50}
    # untranslatable shapes fall back engine-side
    for bad in ("value like '%x%'",
                "cast(get_json_object(value, '$.k') as int) + 1 >= 50",
                "get_json_object(value, '$.k') is not null"):
        assert translate_sql_filter(bad) is None

    import json

    raw = server_fetch(server.address, 2, 0, 100)
    pushed = server_fetch(server.address, 2, 0, 100, flt=flt)
    want = [
        (o, v) for o, v in zip(raw["offset"].to_pylist(),
                               raw["value"].to_pylist())
        if json.loads(v).get("k") is not None and int(json.loads(v)["k"]) >= 50
    ]
    got = list(zip(pushed["offset"].to_pylist(), pushed["value"].to_pylist()))
    assert got == want and 0 < len(got) < raw.num_rows


def test_server_follows_growing_log(spark, sf_dir, tmp_path):
    """The server's metadata RPC re-reads footer LEO per call, so a
    fragment appended to a served partition log is visible to the next
    PARTS probe and fetchable — the continuous-mode contract holds over
    the second transport too."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    log_dir = str(tmp_path / "grow_served")
    shutil.copytree(write_pp_log_dir(spark, sf_dir), log_dir)
    srv = RecordServer(log_dir).start()
    try:
        before = server_parts(srv.address)
        leo = before[1]
        pq.write_table(
            pa.table({
                "offset": pa.array(range(leo, leo + 20), pa.int64()),
                "timestamp": pa.array(
                    [1_700_000_000_000_000 + i for i in range(20)],
                    pa.timestamp("us"),
                ),
                "value": pa.array(['{"k": 1}'] * 20),
            }),
            log_dir + "/partition=1/append-0.parquet",
        )
        after = server_parts(srv.address)
        assert after[1] == leo + 20
        assert {p: v for p, v in after.items() if p != 1} == {
            p: v for p, v in before.items() if p != 1
        }
        fetched = server_fetch(srv.address, 1, leo, None)
        assert fetched["offset"].to_pylist() == list(range(leo, leo + 20))
        # the metadata functions see the same RPC truth
        from fluvio_duck_spark.sources.metadata import (
            fluvio_partitions,
            fluvio_topics,
        )

        t = fluvio_topics(spark, server=srv.address).collect()
        assert [(r["name"], r["partitions"]) for r in t] == [("events", 4)]
        p1 = {
            r["partition"]: r["LEO"]
            for r in fluvio_partitions(spark, server=srv.address).collect()
        }
        assert p1["1"] == leo + 20
    finally:
        srv.stop()


def test_produce_then_consume_full_lifecycle(spark, tmp_path):
    """CONNECTOR.md parity step 1, executed: produce the events fixture
    into an EMPTY served topic (per-partition arrival order = event_id
    order, props as value, ts as record timestamp; the SERVER assigns
    dense offsets), then consume it back through the connector surface
    — the result must equal the stand-in derivation exactly.  Closes
    the produce half of the reference lifecycle in-sandbox."""
    import os

    import pyarrow as pa

    from fluvio_duck_spark.sources.consume import read_events
    from fluvio_duck_spark.sources.loopback import server_produce
    from fluvio_duck_spark.sources.pplog import per_partition_log

    topic_dir = str(tmp_path / "produced_topic")
    for pid in range(4):
        os.makedirs(f"{topic_dir}/partition={pid}")
    srv = RecordServer(topic_dir).start()
    try:
        assert server_parts(srv.address) == {0: 0, 1: 0, 2: 0, 3: 0}

        rows = (
            read_events(spark, SF_DIR)
            .selectExpr("event_id", "ts", "user_id % 4 AS pid", "props")
            .orderBy("event_id")
            .collect()
        )
        per = {}
        for r in rows:
            per.setdefault(r.pid, []).append((r.ts, r.props))
        for pid, recs in sorted(per.items()):
            # two batches per partition: the second append must continue
            # the dense sequence where the first ended
            half = len(recs) // 2
            for batch in (recs[:half], recs[half:]):
                tbl = pa.table({
                    "timestamp": pa.array([t for t, _ in batch],
                                          pa.timestamp("us")),
                    "value": pa.array([v for _, v in batch]),
                })
                server_produce(srv.address, pid, tbl)
        assert server_parts(srv.address) == {0: 273, 1: 232, 2: 289, 3: 206}

        register_fluvio_source(spark)
        consumed = (
            spark.read.format("fluvio")
            .option("server", srv.address)
            .option("args", "-A -B --rows 1000000")
            .load()
        )
        got = sorted(map(tuple, consumed.collect()))
        want = sorted(map(tuple, per_partition_log(spark, SF_DIR).collect()))
        assert got == want  # offsets, timestamps, partitions, values — all
    finally:
        srv.stop()
