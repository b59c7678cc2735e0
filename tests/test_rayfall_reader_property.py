"""Property tests for the Rayfall reader: parse/unparse round-trip.

The IPC layer ships unevaluated ASTs as text (reader.unparse), so
``parse(unparse(ast)) == ast`` is a correctness contract, not a nicety.
No Spark session needed — pure reader."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from rayforce_spark.rayfall.reader import (
    Char, DictLit, I16, I32, QSym, Sym, TimeMs, Vec, parse, unparse,
)

_names = st.from_regex(r"[a-z][a-z0-9_?-]{0,8}", fullmatch=True).filter(
    lambda s: s not in ("true", "false") and not s.endswith("-")
)

_scalars = st.one_of(
    st.integers(min_value=-10**12, max_value=10**12),
    st.integers(min_value=-10**6, max_value=10**6).map(I32),
    st.integers(min_value=-30000, max_value=30000).map(I16),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e9, max_value=1e9),
    st.booleans(),
    st.text(alphabet="abc XYZ09_.,;:%()[]'\"\\", max_size=12),
    st.dates(min_value=dt.date(1800, 1, 1), max_value=dt.date(2200, 12, 31)),
    st.integers(min_value=0, max_value=86_399_999).map(TimeMs),
    _names.map(QSym),
    # char ATOMS incl. escapes, delimiters, controls (octal form)
    st.integers(min_value=1, max_value=126).map(chr).map(Char),
)


def _asts(depth: int):
    if depth <= 0:
        return st.one_of(_scalars, _names.map(Sym))
    inner = _asts(depth - 1)
    return st.one_of(
        _scalars,
        _names.map(Sym),
        st.lists(st.one_of(_scalars, _names.map(QSym)), max_size=4).map(Vec),
        st.lists(st.tuples(_names, inner), max_size=3).map(DictLit),
        st.lists(inner, min_size=1, max_size=4).map(
            lambda xs: [Sym("f"), *xs]
        ),
    )


@settings(max_examples=300, deadline=None)
@given(_asts(3))
def test_parse_unparse_roundtrip(ast):
    (back,) = parse(unparse(ast))
    assert repr(back) == repr(ast)


@settings(max_examples=200, deadline=None)
@given(st.lists(_asts(2), min_size=1, max_size=3))
def test_program_roundtrip(forms):
    src = "\n".join(unparse(f) for f in forms)
    assert [repr(f) for f in parse(src)] == [repr(f) for f in forms]
