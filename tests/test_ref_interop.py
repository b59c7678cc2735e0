"""LIVE interop against the real reference engine.

scripts/build_reference.sh builds the reference's public C source
out-of-tree (gcc, /tmp/refbuild/rayforce). These tests then prove the
wire-format claim (rayfall/serde.py vs core/serde.c) with the strongest
possible evidence — an actual conversation:

* our serde-framed client (ipc.hopen binary=True, including the
  [version, 0x00] connection handshake of core/ipc.c ipc_open) evals
  programs in a live ``rayforce -p <port>`` server and decodes its
  binary replies;
* the reference's OWN client (``hopen`` + ``write`` inside the binary)
  connects to OUR RayfallServer and round-trips a sync eval.

Everything skips cleanly when the binary isn't built (CI without gcc).
"""

import os
import pty
import select
import subprocess
import time

import pytest

from rayforce_spark.interop import (
    REFERENCE_BIN,
    ReferenceUnavailable,
    reference_eval,
    spawn_reference_server,
)

pytestmark = pytest.mark.skipif(
    not os.access(REFERENCE_BIN, os.X_OK),
    reason="reference binary not built (scripts/build_reference.sh)",
)


@pytest.fixture(scope="module")
def ref_server():
    try:
        srv = spawn_reference_server()
    except ReferenceUnavailable as e:  # pragma: no cover - env-dependent
        pytest.skip(str(e))
    yield srv
    srv.stop()


def test_handshake_and_scalar(ref_server):
    assert reference_eval(ref_server, "(+ 1 2)") == 3


def test_value_shapes_decode_with_our_serde(ref_server):
    from rayforce_spark.rayfall.values import SymVal

    cases = {
        "(til 5)": [0, 1, 2, 3, 4],
        "[1.5 2.5 3.5]": [1.5, 2.5, 3.5],
        '"hello"': "hello",
        "(== 1 1)": True,
        "(neg 7)": -7,
        "(list 'a 'b)": ["a", "b"],
        "(dict [a b] (list 1 2.5))": {"a": 1, "b": 2.5},
    }
    for expr, want in cases.items():
        got = reference_eval(ref_server, expr)
        if isinstance(got, list):
            got = [str(x) if isinstance(x, SymVal) else x for x in got]
        elif isinstance(got, SymVal):
            got = str(got)
        assert got == want, expr


def test_reference_table_reply(ref_server):
    out = reference_eval(
        ref_server,
        "(table [name age] (list ['Alice 'Bob] [25 30]))",
    )
    # TYPE_TABLE decodes to our serde Table (a dict of column vectors)
    assert list(out.keys()) == ["name", "age"]
    assert [str(s) for s in out["name"]] == ["Alice", "Bob"]
    assert out["age"] == [25, 30]


def test_remote_error_reply_raises(ref_server):
    with pytest.raises(RuntimeError):
        reference_eval(ref_server, "(undefined-verb-xyz 1)")


def test_state_persists_across_connections(ref_server):
    reference_eval(ref_server, "(set interop_x 41)")
    assert reference_eval(ref_server, "(+ interop_x 1)") == 42


def test_reference_client_connects_to_our_server():
    """Reverse direction: the binary's own hopen/write against OUR
    RayfallServer — handshake, framing, and reply all must satisfy the
    reference's client code paths."""
    from rayforce_spark.ipc import RayfallServer

    srv = RayfallServer(None).start()  # pure-value evals need no Spark
    master, slave = pty.openpty()
    proc = subprocess.Popen([REFERENCE_BIN], stdin=slave,
                            stdout=slave, stderr=slave, cwd="/tmp")
    os.close(slave)

    def read_until(needle: bytes, timeout: float = 20.0) -> bytes:
        out, deadline = b"", time.time() + timeout
        while time.time() < deadline and needle not in out:
            r, _, _ = select.select([master], [], [], 0.5)
            if r:
                try:
                    out += os.read(master, 4096)
                except OSError:
                    break
        return out

    try:
        read_until("❯".encode())  # REPL ready before feeding input
        os.write(master,
                 f'(set h (hopen "127.0.0.1:{srv.port}"))\n'.encode())
        read_until("❯".encode())
        os.write(master, b'(println "GOT %" (write h "(+ 40 2)"))\n')
        out = read_until(b"GOT 42")
        assert b"GOT 42" in out, out[-500:]
    finally:
        proc.terminate()
        os.close(master)
        srv.stop()
