"""Pin the r13 streaming oracle-hash consumer (scripts/driver_sim.py).

The sf0.1 gate's multi-million-row pair results used to be collected as
Python tuples and sorted for the sorted-lines sha256; the old-gen GC
from holding every row alive made the two most expensive rows swing
5.6->35 s within one JVM (r12 verdict #1). The replacement streams
Arrow record batches into an order-insensitive multiset digest. These
tests pin its two correctness-critical properties:

1. the Arrow fast path normalizes every scalar value to EXACTLY the
   line the classic Row-collect path produced (else ok/fail verdicts
   could silently diverge from the real driver's),
2. the multiset digest is order-insensitive and multiset-exact
   (duplicate lines count; XOR-style cancellation impossible).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from driver_sim import (  # noqa: E402
    _ARROW_SAFE,
    _MultisetHash,
    norm_val,
    spark_result_hash,
)


def _collect_path_hash(sdf):
    """The pre-r13 normalization, verbatim: Row collect + norm_val."""
    cols = sdf.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = _MultisetHash()
    for r in sdf.collect():
        h.add_line("|".join(norm_val(r[i]) for i in order))
    return h


def test_arrow_path_matches_collect_path(spark):
    # every scalar type the fast path accepts, with the edge values that
    # could plausibly format differently across the two fetch paths:
    # NaN/±inf/-0.0/integral doubles, unicode + pipe strings, nulls in
    # every column, bools, and int extremes
    rows = [
        (1, 2.5, True, "plain", 7),
        (2, float("nan"), False, "unié|pipe", -7),
        (3, float("inf"), None, "", 0),
        (4, float("-inf"), True, None, 2**62),
        (5, -0.0, False, "x" * 300, -(2**62)),
        (6, 1.0, None, "tab\tnewline\n", None),
        (None, None, None, None, None),
        (7, 1e-15, True, "dup", 1),
        (7, 1e-15, True, "dup", 1),  # duplicate row: multiset counts
    ]
    df = spark.createDataFrame(
        rows, "a long, b double, c boolean, d string, e long")
    assert all(f.dataType.typeName() in _ARROW_SAFE
               for f in df.schema.fields)
    fast = spark_result_hash(df)
    slow = _collect_path_hash(df)
    assert fast.key() == slow.key()
    assert sorted(fast.sample) == sorted(slow.sample)


def test_non_scalar_schema_uses_collect_path(spark):
    # timestamps are outside _ARROW_SAFE: the dispatcher must route them
    # to the classic collect whose Python representation norm_val was
    # written against (and still hash deterministically)
    df = spark.sql(
        "select timestamp'2031-03-01 12:34:56' as ts, 1 as k")
    assert not all(f.dataType.typeName() in _ARROW_SAFE
                   for f in df.schema.fields)
    assert spark_result_hash(df).key() == _collect_path_hash(df).key()


def test_multiset_hash_properties():
    a, b, c = _MultisetHash(), _MultisetHash(), _MultisetHash()
    for ln in ["x", "y", "z"]:
        a.add_line(ln)
    for ln in ["z", "x", "y"]:  # order-insensitive
        b.add_line(ln)
    for ln in ["x", "y", "z", "z"]:  # duplicates must NOT cancel
        c.add_line(ln)
    assert a.key() == b.key()
    assert a.key() != c.key()
    # XOR-style cancellation impossible: {x,x} != {y,y} != {}
    d, e = _MultisetHash(), _MultisetHash()
    d.add_line("x"), d.add_line("x")
    e.add_line("y"), e.add_line("y")
    assert d.key() != e.key() and d.acc != 0


def test_sample_cap_drops_diff_material(monkeypatch):
    import driver_sim

    monkeypatch.setattr(driver_sim, "_DIFF_SAMPLE_CAP", 3)
    h = driver_sim._MultisetHash()
    for i in range(5):
        h.add_line(str(i))
    assert h.sample is None and h.n == 5


@pytest.mark.parametrize("v,expect", [
    (None, "NULL"),
    (float("nan"), "NaN"),
    (1.0, "f1"),
    (-0.0, "f-0"),
    (float("inf"), "finf"),
    (True, "1"),
    (False, "0"),
    (42, "42"),
    ("s|s", "s|s"),
])
def test_norm_val_pinned(v, expect):
    # the normalization grammar both engines' rows flow through — pinned
    # so a refactor can't silently change hash semantics
    assert norm_val(v) == expect
