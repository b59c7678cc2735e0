"""Interop with a live reference engine — differential-testing utilities.

The container ships gcc, so the reference can be built out-of-tree from
its public source (scripts/build_reference.sh -> /tmp/refbuild/rayforce)
and used as a LIVE oracle, the same way DuckDB gates the SQL surface:

* :func:`spawn_reference_server` starts ``rayforce -p <port>`` under a
  pty (its REPL needs a tty; the IPC poll loop runs alongside) and waits
  for the port to accept.
* :func:`reference_eval` sync-evals a Rayfall program in that server
  through :func:`rayforce_spark.ipc.hopen` with ``binary=True`` — i.e.
  our OWN serde encodes the request and decodes the reply, so every call
  is simultaneously a wire-format compatibility check (ref core/serde.c)
  and a semantics check.

Used by tests/test_ref_interop.py and scripts/ref_diff.py. Everything
here degrades gracefully: if the binary is absent (not built yet) the
spawn raises ReferenceUnavailable and callers skip.
"""

from __future__ import annotations

import os
import socket
import subprocess
import time

REFERENCE_BIN = os.environ.get("RAYFORCE_REF_BIN", "/tmp/refbuild/rayforce")


class ReferenceUnavailable(RuntimeError):
    """The reference binary is not built/runnable in this environment."""


class ReferenceServer:
    """A live reference engine listening on ``127.0.0.1:port``."""

    def __init__(self, port: int, proc: subprocess.Popen, pty_fd: int):
        self.port = port
        self._proc = proc
        self._pty_fd = pty_fd

    @property
    def address(self) -> str:
        return f"127.0.0.1:{self.port}"

    def stop(self) -> None:
        try:
            self._proc.terminate()
            self._proc.wait(timeout=5)
        except Exception:  # noqa: BLE001 - best-effort teardown
            self._proc.kill()
        finally:
            try:
                os.close(self._pty_fd)
            except OSError:
                pass

    def __enter__(self) -> "ReferenceServer":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def spawn_reference_server(port: int | None = None,
                           timeout: float = 10.0) -> ReferenceServer:
    """Start the reference binary as an IPC server; wait until it accepts."""
    import pty

    if not os.access(REFERENCE_BIN, os.X_OK):
        raise ReferenceUnavailable(
            f"{REFERENCE_BIN} not built (run scripts/build_reference.sh)")
    port = port or _free_port()
    master, slave = pty.openpty()
    proc = subprocess.Popen([REFERENCE_BIN, "-p", str(port)],
                            stdin=slave, stdout=slave, stderr=slave,
                            cwd="/tmp")  # its REPL drops .rayhist.dat in cwd
    os.close(slave)
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            os.close(master)
            raise ReferenceUnavailable(
                f"reference exited rc={proc.returncode} before listening")
        try:
            socket.create_connection(("127.0.0.1", port), timeout=0.2).close()
            return ReferenceServer(port, proc, master)
        except OSError:
            time.sleep(0.05)
    proc.terminate()
    os.close(master)
    raise ReferenceUnavailable(f"reference did not listen within {timeout}s")


def reference_eval(server: ReferenceServer, expr: str, timeout_ms: int = 30000):
    """Eval one program in the live reference; decode the reply with OUR
    serde. Raises RuntimeError on a remote error reply (flags&1)."""
    from rayforce_spark.ipc import hopen

    h = hopen(server.address, timeout_ms=timeout_ms, binary=True)
    try:
        return h.write(expr)
    finally:
        h.close()
