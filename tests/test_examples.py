"""Smoke-run every example script (each mirrors a reference .rfl example).

The examples double as the verb-mapping documentation; running their
main() in-process guards them against API rot. get_spark() reuses the
test session via getOrCreate, so this adds no JVM startup cost.
"""

from __future__ import annotations

import importlib
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
NAMES = sorted(
    f[:-3] for f in os.listdir(EXAMPLES_DIR)
    if f.endswith(".py") and f != "__init__.py"
)


@pytest.mark.parametrize("name", NAMES)
def test_example_runs(spark, name, tmp_path, monkeypatch):
    # journal/sesslog write files — run with a scratch cwd
    monkeypatch.chdir(tmp_path)
    # the scripts end with spark.stop() (correct standalone); here they
    # share the session-scoped fixture, so stop() must be a no-op or
    # every later test in the suite dies with a dead SparkContext
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    if EXAMPLES_DIR not in sys.path:
        sys.path.insert(0, EXAMPLES_DIR)
    mod = importlib.import_module(name)
    mod.main()
