"""IPC: RayfallServer eval port + hopen client (docs documentation/IPC.md,
ref core/ipc.c:166,372). Examples from the doc page run verbatim through
the Rayfall front-end on both sides."""

import time

import pytest

from rayforce_spark.ipc import RayfallServer, hopen


@pytest.fixture()
def server(spark):
    srv = RayfallServer(spark).start()
    yield srv
    srv.stop()


def test_sync_eval_doc_examples(server):
    h = hopen(server.address)
    try:
        # docs IPC.md:42,84 — verbatim
        assert h.write("(+ 1 2)") == 3
        assert h.write("(sum [1 2 3 4 5])") == 15
    finally:
        h.close()


def test_server_side_variables_and_tables(server):
    h = hopen(server.address, timeout_ms=30000)
    try:
        h.write("(set employees (table [name age] (list ['Alice 'Bob] [25 30])))")
        # quoted symbol resolves server-side (docs IPC.md "Accessing
        # Server Variables")
        out = h.write("(select {n: (count name) from: employees})")
        assert out["table"]["columns"] == ["n"]
        assert out["table"]["rows"] == [[2]]
        assert h.write("(count employees)") == 2
    finally:
        h.close()


def test_async_write_and_error_reply(server):
    h = hopen(server.address)
    try:
        h.write_async("(set x 41)")
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                if h.write("x") == 41:
                    break
            except RuntimeError:
                pass
            time.sleep(0.1)
        assert h.write("(+ x 1)") == 42
        with pytest.raises(RuntimeError, match="remote error"):
            h.write("(frobnicate)")
        # the connection survives an error reply
        assert h.write("(+ 1 1)") == 2
    finally:
        h.close()


def test_rayfall_ipc_verbs(spark, server):
    # the client side itself driven through Rayfall: hopen/write/neg/hclose
    from rayforce_spark.rayfall import Interp

    it = Interp(spark)
    it.env["addr"] = server.address
    assert it.eval_str('(set h (hopen addr)) (write h "(+ 1 2)")') == 3
    # unevaluated list message, evaluated remotely
    assert it.eval_str("(write h (+ 20 22))") == 42
    # async via negated handle
    it.eval_str('(write (neg h) "(set y 7)")')
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            if it.eval_str("(write h 'y)") == 7:
                break
        except RuntimeError:
            pass
        time.sleep(0.1)
    assert it.eval_str("(write h 'y)") == 7
    it.eval_str("(hclose h)")


def test_binary_wire_sync_async_and_error(server):
    """The reference's serde framing end-to-end (r6): sync eval, async
    set, TYPE_TABLE reply, flags=1 error reply — while a JSON client
    shares the same port (per-message format sniffing)."""
    from rayforce_spark.rayfall.serde import Table

    hb = hopen(server.address, timeout_ms=30000, binary=True)
    hj = hopen(server.address, timeout_ms=30000)
    try:
        assert hb.write("(+ 1 2)") == 3
        assert hb.write("(sum [1 2 3 4 5])") == 15
        # async (msgtype 0): no reply; poll for the effect
        hb.write_async("(set bz 19)")
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                if hb.write("bz") == 19:
                    break
            except RuntimeError:
                pass
            time.sleep(0.1)
        assert hb.write("bz") == 19
        # table reply is the reference TYPE_TABLE (columns -> vectors)
        hb.write("(set t (table [a b] (list [1 2 3] ['x 'y 'z])))")
        out = hb.write("t")
        assert isinstance(out, Table)
        assert out["a"] == [1, 2, 3]
        assert [str(s) for s in out["b"]] == ["x", "y", "z"]
        # remote error -> flags=1 reply -> RuntimeError
        with pytest.raises(RuntimeError, match="remote error"):
            hb.write("(this-verb-does-not-exist 1)")
        # the JSON client still works interleaved on the same server
        assert hj.write("(+ 40 2)") == 42
        assert hb.write("(+ 1 1)") == 2
    finally:
        hb.close()
        hj.close()


def test_hostile_binary_frame_rejected_and_connection_dropped(server):
    """A frame with a suspect size (negative or > the reference's 1 GB
    cap, core/serde.c:703) must get ONE error reply and then a closed
    connection — the byte stream is unsynchronized after a bad header, so
    continuing would cascade garbage messages. The server itself must
    survive for new connections."""
    import socket
    import struct

    from rayforce_spark.rayfall import serde as S

    host, port = server.address.split(":")
    for bad_size in (2**62, -5):
        with socket.create_connection((host, int(port)), timeout=30) as s:
            s.settimeout(30)
            s.sendall(struct.pack("<IBBBBq", S.SERDE_PREFIX, S.VERSION,
                                  0, 0, 1, bad_size) + b"junk")
            buf = b""
            while True:
                chunk = s.recv(65536)
                if not chunk:
                    break  # server closed after replying
                buf += chunk
            # exactly one error reply (flags=1), then EOF
            assert len(buf) >= 16
            prefix, _v, flags, _e, msgtype, size = struct.unpack(
                "<IBBBBq", buf[:16])
            assert prefix == S.SERDE_PREFIX and flags == 1 and msgtype == 2
            # error replies carry a TYPE_ERR object (decodable by the
            # reference's own client too)
            err = S._de_raw(S._Cur(buf[16:16 + size]))
            assert isinstance(err, S.ErrVal)
            assert "suspect message size" in (err.msg or "")
            assert buf[16 + size:] == b""

    # server still serves fresh connections
    h = hopen(server.address)
    try:
        assert h.write("(+ 20 22)") == 42
    finally:
        h.close()
