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
