"""Loopback record server — the second transport for CONNECTOR.md's
parity gate.

Every query in this repo runs against a parquet stand-in read directly
from the local filesystem.  CONNECTOR.md specifies how a real
cluster-backed connector replaces that transport, but the contract had
only ever been *written*, never executed against a second transport
(VERDICT r7 "Next round" #1).  This module is that second transport: an
in-process socket server that owns the partition logs and speaks a
minimal SPU-shaped protocol, plus the client helpers the DataSource
uses to consume it.  Nothing above the seam changes — the parity
queries run the SAME option strings with ``.option("server", addr)``
swapped in and must produce identical hashes.

The protocol mirrors the two calls the reference makes per scan:

* **metadata** (plan time, driver side): ``{"op": "parts"}`` →
  ``{pid: leo}`` — the admin/offset API analogue
  (``all::<PartitionSpec>()`` + ``partition.status.leader.leo``,
  reference src/partition.rs:107-134).
* **record fetch** (execute time, EXECUTOR side): ``{"op": "fetch",
  "pid": k, "lo": a, "hi": b}`` → an Arrow IPC stream of that
  partition's records with offsets in ``[a, b)`` — the bounded range
  read of ``stream_with_config(start_offset, config)`` (reference
  src/consume.rs:189-193).  The server must be handed the window: a
  connector that fetches all and filters client-side fails
  CONNECTOR.md's step-6 scale posture by construction.

Wire format: one JSON request line, then an 8-byte big-endian length
prefix and the payload (JSON for metadata, Arrow IPC for fetch).  The
server is a stand-in for the SPU — its own storage is the pp log dir
parquet (row-group-pruned via the same ``_read_pp_window`` the local
transport uses); what the parity gate exercises is the READER's shape:
plan-time metadata RPC, executor-side windowed fetch, no driver funnel.
"""

from __future__ import annotations

import io
import json
import re
import socket
import socketserver
import struct
import threading


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("record server closed mid-response")
        buf += chunk
    return buf


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:
        line = self.rfile.readline()
        if not line:
            return
        req = json.loads(line)
        srv = self.server  # type: ignore[assignment]
        if req["op"] == "parts":
            payload = json.dumps(srv.parts_leo()).encode()
        elif req["op"] == "fetch":
            payload = srv.fetch_ipc(
                int(req["pid"]), int(req["lo"]),
                None if req.get("hi") is None else int(req["hi"]),
                req.get("filter"),
            )
        elif req["op"] == "produce":
            # read from rfile (buffered): part of the payload may
            # already sit behind the readline()
            want = int(req["payload_bytes"])
            body = b""
            while len(body) < want:
                chunk = self.rfile.read(want - len(body))
                if not chunk:
                    raise ConnectionError("producer closed mid-payload")
                body += chunk
            payload = json.dumps(
                srv.produce_ipc(int(req["pid"]), body)
            ).encode()
        else:
            payload = json.dumps({"error": f"unknown op {req['op']!r}"}).encode()
        self.wfile.write(struct.pack(">Q", len(payload)))
        self.wfile.write(payload)


class RecordServer(socketserver.ThreadingTCPServer):
    """Serves a per-partition log directory (``partition=<k>/`` layout,
    sources/pplog.py) over the loopback protocol.  Threaded: one
    connection per request, so N executor tasks fetch concurrently —
    the stand-in for N SPU connections."""

    daemon_threads = True
    allow_reuse_address = True

    def __init__(self, log_dir: str):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.log_dir = log_dir
        self._thread: threading.Thread | None = None
        self._append_lock = threading.Lock()  # offset assignment is serial

    @property
    def address(self) -> str:
        host, port = self.server_address
        return f"{host}:{port}"

    def parts_leo(self) -> dict[str, int]:
        from fluvio_duck_spark.sources.pplog import (
            pp_footer_leo,
            pp_partition_dirs,
        )

        return {
            str(pid): pp_footer_leo(d)
            for pid, d in sorted(pp_partition_dirs(self.log_dir).items())
        }

    def fetch_ipc(self, pid: int, lo: int, hi: int | None,
                  flt: dict | None = None) -> bytes:
        import pyarrow as pa

        from fluvio_duck_spark.sources.datasource import _read_pp_window
        from fluvio_duck_spark.sources.pplog import pp_partition_dirs

        dirs = pp_partition_dirs(self.log_dir)
        if pid not in dirs:
            tbl = pa.table(
                {"offset": pa.array([], pa.int64()),
                 "timestamp": pa.array([], pa.timestamp("us")),
                 "value": pa.array([], pa.string())}
            )
        else:
            tbl = _read_pp_window(dirs[pid], lo, hi)
        if flt is not None:
            tbl = _apply_server_filter(tbl, flt)
        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, tbl.schema) as w:
            w.write_table(tbl)
        return sink.getvalue()

    def produce_ipc(self, pid: int, ipc: bytes) -> dict:
        """Append records to one partition log — CONNECTOR.md's parity
        step 1 (fixture load into a real topic) made executable: the
        payload is an Arrow IPC stream of ``(timestamp, value)`` rows in
        arrival order; the SERVER assigns the next dense offsets of that
        partition's own sequence (the broker owns offsets — a producer
        never picks them) and persists a new immutable fragment.  Offset
        assignment is serialized per server (the per-partition leader's
        append lock)."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        with pa.ipc.open_stream(ipc) as r:
            tbl = r.read_all()
        with self._append_lock:
            part_dir = os.path.join(self.log_dir, f"partition={pid}")
            os.makedirs(part_dir, exist_ok=True)
            from fluvio_duck_spark.sources.pplog import pp_footer_leo

            base = pp_footer_leo(part_dir)
            out = pa.table({
                "offset": pa.array(
                    range(base, base + tbl.num_rows), pa.int64()
                ),
                "timestamp": tbl["timestamp"].cast(pa.timestamp("us")),
                "value": tbl["value"].cast(pa.string()),
            })
            pq.write_table(
                out, os.path.join(part_dir, f"produced-{base:012d}.parquet")
            )
        return {"base_offset": base, "n": tbl.num_rows}

    def start(self) -> "RecordServer":
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.shutdown()
        self.server_close()


# -- server-side SmartModule filter (CONNECTOR.md §5 MAY clause) ----------

#: The translatable subset of the engine's sql-filter kind: one
#: comparison of a JSON-path extraction cast to a numeric type against a
#: literal.  Anything else stays engine-side (translate returns None).
_FILTER_RE = re.compile(
    r"^\s*cast\s*\(\s*get_json_object\s*\(\s*value\s*,\s*"
    r"'(\$\.[\w.]+)'\s*\)\s+as\s+(int|bigint|double)\s*\)\s*"
    r"(>=|<=|==|=|!=|>|<)\s*(-?\d+(?:\.\d+)?)\s*$",
    re.IGNORECASE,
)

_OPS = {
    ">=": lambda a, b: a >= b, "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b, "<": lambda a, b: a < b,
    "=": lambda a, b: a == b, "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
}


def translate_sql_filter(where: str) -> dict | None:
    """Translate an engine-side sql-filter ``where`` clause into the
    record server's filter DSL — or None when the clause falls outside
    the translatable subset (the caller MUST then keep the filter
    engine-side; a partial translation would change results, the one
    thing CONNECTOR.md §5 forbids).  This is the connector analogue of
    shipping the filter SmartModule to the SPU (reference
    src/consume.rs:713-741): the pushed form must be bit-identical to
    the engine-side chain, which the loopback_filter_pushdown parity
    query pins.

    Parity scope note: for a record whose extracted value is MALFORMED
    for the cast (e.g. ``"12.5"`` under an int cast), the server drops
    it while Spark's ANSI cast would raise engine-side — the pushed
    form is bit-identical on data the engine-side chain can itself
    evaluate, which is the only data a parity comparison can exist
    for."""
    m = _FILTER_RE.match(where)
    if not m:
        return None
    path, typ, op, lit = m.groups()
    typ = typ.lower()
    cast = "double" if typ == "double" else "int"
    value = float(lit) if cast == "double" else int(float(lit))
    return {"path": path, "cast": cast, "op": op, "value": value}


def _apply_server_filter(tbl, flt: dict):
    """Evaluate the filter DSL over one fetched window, record by
    record — the server IS the SPU stand-in, so this is deliberately a
    plain interpreter: JSON-extract the path, cast (extraction failure
    or non-numeric → record dropped, matching the engine's NULL-cast
    semantics), compare against the literal."""
    import pyarrow as pa

    key = flt["path"][2:]  # "$.k" -> "k" (top-level paths only)
    op = _OPS[flt["op"]]
    want = flt["value"]
    to_num = float if flt["cast"] == "double" else int
    keep = []
    for v in tbl["value"].to_pylist():
        ok = False
        if v is not None:
            try:
                got = json.loads(v).get(key)
                if got is not None:
                    ok = op(to_num(got), want)
            except (ValueError, TypeError, AttributeError):
                ok = False
        keep.append(ok)
    return tbl.filter(pa.array(keep))


# -- client side (used driver-side for metadata, EXECUTOR-side for fetch) --

def _request(addr: str, req: dict) -> bytes:
    host, port = addr.rsplit(":", 1)
    with socket.create_connection((host, int(port)), timeout=60) as sock:
        sock.sendall(json.dumps(req).encode() + b"\n")
        (n,) = struct.unpack(">Q", _recv_exact(sock, 8))
        return _recv_exact(sock, n)


def server_produce(addr: str, pid: int, table) -> dict:
    """Produce ``(timestamp, value)`` rows to one partition in arrival
    order; the server assigns the next dense offsets and returns
    ``{"base_offset": ..., "n": ...}`` — the producer half of the
    reference lifecycle (CONNECTOR.md parity step 1)."""
    import pyarrow as pa

    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    body = sink.getvalue()
    host, port = addr.rsplit(":", 1)
    with socket.create_connection((host, int(port)), timeout=60) as sock:
        sock.sendall(
            json.dumps(
                {"op": "produce", "pid": pid, "payload_bytes": len(body)}
            ).encode() + b"\n" + body
        )
        (n,) = struct.unpack(">Q", _recv_exact(sock, 8))
        return json.loads(_recv_exact(sock, n))


def server_parts(addr: str) -> dict[int, int]:
    """partition id → LEO, from the server's metadata endpoint — the
    plan-time offset/admin RPC of the connector contract."""
    return {int(k): int(v) for k, v in json.loads(_request(addr, {"op": "parts"})).items()}


def server_fetch(addr: str, pid: int, lo: int, hi: int | None,
                 flt: dict | None = None):
    """One partition's records with offsets in ``[lo, hi)``, as an Arrow
    table — the executor-side bounded range read.  ``flt`` optionally
    pushes a translated SmartModule filter to the server (the §5 MAY
    clause); the server applies it before the bytes cross the wire."""
    import pyarrow as pa

    req = {"op": "fetch", "pid": pid, "lo": lo, "hi": hi}
    if flt is not None:
        req["filter"] = flt
    payload = _request(addr, req)
    with pa.ipc.open_stream(payload) as r:
        return r.read_all()
