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

The server speaks BOTH wire formats on one port, sniffed per message
(r6): the reference's binary serde framing (rayfall/serde.py — 16-byte
``0xcefadefa`` header + tag-len-payload, msgtype 0=async / 1=sync /
2=response per core/serde.h:38; first byte on the wire is 0xfa, never
valid JSON) and JSON-lines (debuggable text protocol; ``{`` first
byte). Binary replies carry values in the reference encoding — tables
as TYPE_TABLE columns, errors flagged in the header's flags byte with a
string payload. An IPC reply is a result channel, not a bulk-data path:
replies cap at ``max_rows``; ship datasets as parquet, and use
``Session.connect`` (Spark Connect) for production remote sessions.
"""

from __future__ import annotations

import datetime as _dt
import json
import socket
import socketserver
import threading

from pyspark.sql import DataFrame

MAX_REPLY_ROWS = 10_000
_BIN_FIRST = 0xFA  # first wire byte of struct.pack('<I', 0xcefadefa)


def _binable(v, max_rows: int = MAX_REPLY_ROWS):
    """Shape a reply value for the binary serde: DataFrames become the
    reference's TYPE_TABLE (column name -> column vector), capped."""
    from rayforce_spark.rayfall.serde import Table, shape_cell

    if isinstance(v, DataFrame):
        rows = v.limit(max_rows).collect()
        return Table((c, [_binable(r[i]) for r in rows])
                     for i, c in enumerate(v.columns))
    # one shared shaping helper with the `ser` verb (evalr.py) so the two
    # binary surfaces agree: datetimes cross as TYPE_TIMESTAMP, not text
    return shape_cell(v)


def _read_bin_msg(rfile, first: bytes):
    """Read one binary message after its first byte was sniffed.
    Returns (value, msgtype)."""
    import struct

    from rayforce_spark.rayfall import serde as S

    header = first + rfile.read(15)
    if len(header) < 16:
        raise S.SerdeError("ipc: truncated header")
    prefix, _v, _f, _e, msgtype, size = struct.unpack("<IBBBBq", header)
    if prefix != S.SERDE_PREFIX:
        raise S.SerdeError(f"ipc: bad prefix {prefix:#x}")
    # reject suspect lengths before allocating (ref core/serde.c:703
    # caps at 1 GB): a negative size would silently read b"" and
    # misparse; a huge one is a corrupt/hostile frame, not a message
    if size < 0 or size > S.MAX_MSG_SIZE:
        raise S.SerdeError(f"ipc: suspect message size {size}")
    payload = rfile.read(size)
    if len(payload) < size:
        raise S.SerdeError("ipc: truncated payload")
    return S.de_obj(header + payload), msgtype


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
                fresh = True
                while True:
                    first = self.rfile.read(1)
                    if not first:
                        return
                    if fresh and first[0] not in (_BIN_FIRST, 0x7B):
                        # reference clients open with a 2-byte handshake
                        # [version, 0x00] and expect one version byte
                        # back (core/ipc.c ipc_open / ipc_read_handshake)
                        # — never valid JSON ('{' = 0x7b) or a binary
                        # frame (0xfa first)
                        from rayforce_spark.rayfall import serde as S

                        nul = self.rfile.read(1)
                        if nul != b"\x00":
                            return  # junk opener: drop the connection
                        self.wfile.write(bytes([S.VERSION]))
                        self.wfile.flush()
                        fresh = False
                        continue
                    fresh = False
                    if first[0] == _BIN_FIRST:
                        if self._handle_binary(first) is False:
                            return  # unsynced stream: close connection
                    else:
                        raw = first + self.rfile.readline()
                        if not raw.strip():
                            continue
                        self._handle_json(raw)

            def _handle_json(self, raw: bytes):
                req = {}
                try:
                    req = json.loads(raw)
                    is_async = bool(req.get("async"))
                    with lock:
                        val = interp.eval_str(req["q"])
                    if is_async:
                        return
                    reply = {"ok": True, "value": _jsonable(val, max_rows_)}
                except Exception as e:  # noqa: BLE001 - reply, don't die
                    if req.get("async"):
                        return
                    reply = {"ok": False, "error": f"{type(e).__name__}: {e}"}
                self.wfile.write(json.dumps(reply).encode() + b"\n")
                self.wfile.flush()

            def _handle_binary(self, first: bytes):
                from rayforce_spark.rayfall import serde as S

                msgtype = 1
                framed = False
                try:
                    msg, msgtype = _read_bin_msg(self.rfile, first)
                    framed = True
                    with lock:
                        # string message = a Rayfall program (the
                        # reference evals the de'd object; a data value
                        # evals to itself)
                        val = (interp.eval_str(msg)
                               if isinstance(msg, str) else msg)
                    if msgtype == 0:  # async: no reply
                        return
                    reply = S.ser_obj(_binable(val, max_rows_), msgtype=2)
                except Exception as e:  # noqa: BLE001 - reply, don't die
                    if msgtype == 0:
                        return
                    # flags=1 marks an error reply; the payload is a
                    # TYPE_ERR object so the reference's own client can
                    # decode it too (it ignores flags)
                    payload = S.ser_raw(
                        S.ErrVal.user(f"{type(e).__name__}: {e}"))
                    import struct

                    reply = struct.pack(
                        "<IBBBBq", S.SERDE_PREFIX, S.VERSION, 1, 0, 2,
                        len(payload)) + payload
                self.wfile.write(reply)
                self.wfile.flush()
                # a framing failure (bad prefix / suspect size /
                # truncation) leaves the byte stream unsynchronized — the
                # remaining bytes would cascade as garbage "messages".
                # Reply once, then have handle() drop the connection.
                return framed

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
    """Client handle from :func:`hopen` (ref core/io.c hopen; docs IPC.md).

    ``binary=True`` speaks the reference's serde framing (r6): requests
    go out as serialized messages with msgtype 1 (sync) / 0 (async),
    replies come back as serialized values (tables as TYPE_TABLE dicts;
    a flags=1 header marks a remote error)."""

    def __init__(self, addr: str, timeout_ms: int | None = None,
                 binary: bool = False):
        host, port = addr.rsplit(":", 1)
        self.binary = binary
        self._sock = socket.create_connection(
            (host, int(port)),
            timeout=(timeout_ms / 1000 if timeout_ms else None),
        )
        self._rfile = self._sock.makefile("rb")
        if binary:
            # the reference's connection handshake (core/ipc.c ipc_open,
            # Unix path): client sends [version, 0x00], server replies
            # one version byte. Interop-tested against the real binary
            # (tests/test_ref_interop.py).
            from rayforce_spark.rayfall import serde as S

            self._sock.sendall(bytes([S.VERSION, 0]))
            resp = self._rfile.read(1)
            if len(resp) != 1:
                raise RuntimeError("ipc: connection closed in handshake")
            self.server_version = resp[0]

    def write(self, expr: str):
        """Sync eval: block for the reply (docs IPC.md "Sync Messages")."""
        if self.binary:
            import struct

            from rayforce_spark.rayfall import serde as S

            self._sock.sendall(S.ser_obj(expr, msgtype=1))
            header = self._rfile.read(16)
            if len(header) < 16:
                raise RuntimeError("ipc: connection closed mid-reply")
            _p, _v, flags, _e, _mt, size = struct.unpack("<IBBBBq", header)
            val = S.de_obj(header + self._rfile.read(size))
            # two error conventions on the wire: our server marks errors
            # in the header flags; the reference replies a TYPE_ERR
            # object (core/serde.c:319) with flags clear
            if flags & 1 or isinstance(val, S.ErrVal):
                raise RuntimeError(f"remote error: {val}")
            return val
        self._sock.sendall(json.dumps({"q": expr}).encode() + b"\n")
        reply = json.loads(self._rfile.readline())
        if not reply.get("ok"):
            raise RuntimeError(f"remote error: {reply.get('error')}")
        return reply["value"]

    def write_async(self, expr: str) -> None:
        """Fire-and-forget (the reference's negated-handle form)."""
        if self.binary:
            from rayforce_spark.rayfall import serde as S

            self._sock.sendall(S.ser_obj(expr, msgtype=0))
            return
        self._sock.sendall(json.dumps({"q": expr, "async": True}).encode() + b"\n")

    def close(self) -> None:
        try:
            self._rfile.close()
        finally:
            self._sock.close()


def hopen(addr: str, timeout_ms: int | None = None,
          binary: bool = False) -> Handle:
    """``(hopen "host:port" [timeout-ms])`` — IPC connections only; file
    handles are the journal (streaming/journal.py)."""
    return Handle(addr, timeout_ms, binary=binary)
