"""The local console (rayforce_spark/repl.py — the reference app/repl.c
analog): multi-line buffering, value printing, table show, error
recovery, clean exit."""

import os
import subprocess
import sys


def test_repl_pipe_session():
    src = "\n".join([
        "(set x 41)",
        "(+ x",          # unbalanced: continues
        "  1)",
        "(de (ser [1 2 3]))",
        "(this-verb-does-not-exist)",   # error must not kill the loop
        "(+ 2 2)",
        "\\q",
    ]) + "\n"
    p = subprocess.run(
        [sys.executable, "-m", "rayforce_spark.repl", "-q"],
        input=src, capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert p.returncode == 0
    out = [ln for ln in p.stdout.splitlines() if ln.strip()]
    assert "41" in out
    assert "42" in out
    assert "[1, 2, 3]" in out
    assert "4" in out                       # loop survived the error
    assert "unknown verb" in p.stderr


def test_balanced_tracks_brackets_braces_and_escapes():
    from rayforce_spark.repl import _balanced

    # brackets/braces continue like parens (multi-line vector/dict input)
    assert not _balanced("[1 2")
    assert not _balanced("{a: 1")
    assert _balanced("[1 2]") and _balanced("{a: 1}")
    assert not _balanced("(f [1 2")
    # a quote after an ESCAPED backslash closes the string
    assert _balanced(r'"a\\"')
    assert not _balanced(r'"a\"')      # escaped quote: still open
    assert not _balanced(r'"a\\\"')    # odd run: still open
    assert _balanced(r'"a\\\\"')       # even run: closed
    # brackets inside strings don't count
    assert _balanced('"[["')
