"""IPC: serve the engine on a port; connect and eval from another process.

The reference's IPC (ref core/ipc.c:166 listen loop, :372 request eval,
docs documentation/IPC.md) accepts string or list messages, evaluates
them in the server's environment, and replies sync (blocking) or not at
all (async, negated handle). This module re-creates that surface over the
Rayfall front-end:

* :class:`RayfallServer` — a threaded TCP server; each request line is a
  Rayfall program evaluated against ONE shared environment (the
  reference's globals). Responses are JSON: scalars/vectors inline,
  tables as ``{columns, rows}`` capped at ``max_rows`` (an IPC reply is a
  result channel, not a bulk-data path — ship datasets as parquet).
* :func:`hopen` / :class:`Handle` — the client: ``h.write("(+ 1 2)")``
  sync-evals remotely; ``h.write_async(...)`` fires and forgets
  (the reference's negated-handle form).

Wire format is JSON-lines, NOT the reference's binary serde
(core/serde.c) — deliberately: Arrow + Spark Connect are this engine's
binary transports (COVERAGE.md §2.1); this server exists for the
reference's client/server *workflow* (a REPL-able eval port), where a
debuggable text protocol wins. Production remote sessions use
``Session.connect`` (Spark Connect).
"""

from __future__ import annotations

import datetime as _dt
import json
import socket
import socketserver
import threading

from pyspark.sql import DataFrame

MAX_REPLY_ROWS = 10_000


def _jsonable(v, max_rows: int = MAX_REPLY_ROWS):
    if isinstance(v, DataFrame):
        rows = v.limit(max_rows).collect()
        return {
            "table": {
                "columns": list(v.columns),
                "rows": [[_jsonable(x) for x in r] for r in rows],
            }
        }
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _jsonable(x) for k, x in v.items()}
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bool, float, str)) or v is None:
        return v
    if isinstance(v, int):
        return int(v)
    return repr(v)


class RayfallServer:
    """``rayforce -p 5110`` analog: eval Rayfall requests on a port.

    One shared environment across connections (the reference server's
    globals); evals serialize on a lock — the Spark driver parallelizes
    each query internally, so concurrent request *planning* buys nothing
    and interleaved env mutation would race.
    """

    def __init__(self, spark, host: str = "127.0.0.1", port: int = 0,
                 env: dict | None = None, max_rows: int = MAX_REPLY_ROWS):
        from rayforce_spark.rayfall import Interp

        self.interp = Interp(spark, env)
        self.max_rows = max_rows
        lock = threading.Lock()
        interp = self.interp
        max_rows_ = max_rows

        class _Handler(socketserver.StreamRequestHandler):
            def handle(self):
                for raw in self.rfile:
                    req = {}
                    try:
                        req = json.loads(raw)
                        is_async = bool(req.get("async"))
                        with lock:
                            val = interp.eval_str(req["q"])
                        if is_async:
                            continue
                        reply = {"ok": True, "value": _jsonable(val, max_rows_)}
                    except Exception as e:  # noqa: BLE001 - reply, don't die
                        if req.get("async"):
                            continue
                        reply = {"ok": False, "error": f"{type(e).__name__}: {e}"}
                    self.wfile.write(json.dumps(reply).encode() + b"\n")
                    self.wfile.flush()

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Server((host, port), _Handler)
        self.host, self.port = self._server.server_address
        self._thread: threading.Thread | None = None

    def start(self) -> "RayfallServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="rayfall-ipc", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    @property
    def address(self) -> str:
        return f"{self.host}:{self.port}"


class Handle:
    """Client handle from :func:`hopen` (ref core/io.c hopen; docs IPC.md)."""

    def __init__(self, addr: str, timeout_ms: int | None = None):
        host, port = addr.rsplit(":", 1)
        self._sock = socket.create_connection(
            (host, int(port)),
            timeout=(timeout_ms / 1000 if timeout_ms else None),
        )
        self._rfile = self._sock.makefile("rb")

    def write(self, expr: str):
        """Sync eval: block for the reply (docs IPC.md "Sync Messages")."""
        self._sock.sendall(json.dumps({"q": expr}).encode() + b"\n")
        reply = json.loads(self._rfile.readline())
        if not reply.get("ok"):
            raise RuntimeError(f"remote error: {reply.get('error')}")
        return reply["value"]

    def write_async(self, expr: str) -> None:
        """Fire-and-forget (the reference's negated-handle form)."""
        self._sock.sendall(json.dumps({"q": expr, "async": True}).encode() + b"\n")

    def close(self) -> None:
        try:
            self._rfile.close()
        finally:
            self._sock.close()


def hopen(addr: str, timeout_ms: int | None = None) -> Handle:
    """``(hopen "host:port" [timeout-ms])`` — IPC connections only; file
    handles are the journal (streaming/journal.py)."""
    return Handle(addr, timeout_ms)
