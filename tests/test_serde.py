"""Binary wire-format round-trips (rayforce_spark/rayfall/serde.py vs
ref core/serde.c): header layout, scalar/vector/dict tag-len-payload
encoding, and the (de (ser …)) verb pair (ref tests/lang.c:3245)."""

import datetime as dt
import struct

import pytest

from rayforce_spark.rayfall import serde as S
from rayforce_spark.rayfall.reader import (
    Char,
    I16,
    I32,
    TimeMs,
    TsNs,
    U8,
)
from rayforce_spark.rayfall.values import NS_2000, GuidVal, SymVal

SCALARS = [
    None, True, False, 5, -3, 2 ** 62, 2.5, float("inf"),
    I32(7), I32(-2 ** 31), I16(-2), U8(255),
    SymVal("apple"), SymVal(""), Char("x"), Char("\n"),
    "hello world", "", "unicode: é",
    TimeMs(32_399_000), TsNs(NS_2000 + 123_456_789), TsNs(NS_2000),
    dt.date(2000, 1, 1), dt.date(2024, 2, 29), dt.date(1999, 12, 31),
    GuidVal("0123abcd-4567-89ef-0123-456789abcdef"),
]

VECTORS = [
    [], [1, 2, 3], [1.5, 2.5], [True, False, True],
    [SymVal("a"), SymVal("bee"), SymVal("")],
    [U8(0), U8(255)], [I16(1), I16(-1)], [I32(7), I32(8)],
    [TimeMs(1), TimeMs(86_399_999)],
    [TsNs(NS_2000), TsNs(NS_2000 + 1)],
    [dt.date(2000, 1, 1), dt.date(2024, 12, 31)],
    [1, "mixed", None, [2.0, 3.0], SymVal("s")],  # LIST
    {"a": 1, "b": [1, 2], "c": None, "d": {"n": 2.5}},
]


@pytest.mark.parametrize("v", SCALARS + VECTORS,
                         ids=lambda v: repr(v)[:40])
def test_roundtrip(v):
    back = S.de_obj(S.ser_obj(v))
    assert back == v
    if not isinstance(v, (list, dict)):
        assert type(back) is type(v)


def test_header_layout():
    # ref core/serde.h:32-39: 16 bytes — prefix, version, flags, endian,
    # msgtype, i64 size; null payload is the single byte 126
    m = S.ser_obj(None)
    assert len(m) == 17
    prefix, ver, flags, endian, mt, size = struct.unpack("<IBBBBq", m[:16])
    assert prefix == 0xCEFADEFA
    assert (ver, flags, endian, mt, size) == (1, 0, 0, 0, 1)
    assert m[16] == 126


def test_atom_vs_vector_tags():
    # atom i64 = tag -5 + 8 bytes; vector i64 = tag 5, attrs, len, data
    assert S.ser_raw(7)[0] == struct.pack("<b", -5)[0]
    v = S.ser_raw([7])
    assert v[0] == 5 and v[1] == 0
    assert struct.unpack("<q", v[2:10]) == (1,)


def test_timestamp_is_2000_epoch_on_wire():
    raw = S.ser_raw(TsNs(NS_2000 + 42))
    assert struct.unpack("<q", raw[1:]) == (42,)
    raw = S.ser_raw(dt.date(2000, 1, 2))
    assert struct.unpack("<i", raw[1:]) == (1,)


def test_char_vector_is_a_string_on_the_wire():
    # the reference's char vector IS its string type (ref core/serde.c
    # TYPE_C8 branch), so a list of char atoms round-trips as a str
    assert S.de_obj(S.ser_obj([Char("a"), Char("b")])) == "ab"
    assert S.ser_raw([Char("a"), Char("b")]) == S.ser_raw("ab")


def test_bad_input_raises():
    with pytest.raises(S.SerdeError):
        S.de_obj(b"\x00" * 16)  # bad prefix
    with pytest.raises(S.SerdeError):
        S.de_obj(S.ser_obj([1, 2, 3])[:-2])  # truncated
    with pytest.raises(S.SerdeError):
        S.ser_obj(object())


def test_ser_de_verbs(spark):
    from rayforce_spark.rayfall import eval_str

    assert eval_str("(de (ser null))", spark) is None
    assert eval_str("(de (ser [1 2 3]))", spark) == [1, 2, 3]
    assert eval_str('(de (ser "wire"))', spark) == "wire"
    assert eval_str("(de (ser {a: 1 b: [2 3]}))", spark) == {
        "a": 1, "b": [2, 3]}
    # ser yields the reference's u8 vector (header bytes first)
    out = eval_str("(ser null)", spark)
    assert [int(b) for b in out[:4]] == [0xFA, 0xDE, 0xFA, 0xCE]


def test_ser_de_doc_examples_bytes_and_tables(spark):
    """docs serialization.md worked examples, incl. the EXACT published
    byte prefixes (sizes 0x09 / 0x0f / 0x22) and full table/dict
    round-trips through the wire."""
    from rayforce_spark.rayfall import eval_str

    def head(expr):
        return [int(b) for b in eval_str(expr, spark)[:16]]

    pre = [0xFA, 0xDE, 0xFA, 0xCE, 0x01, 0, 0, 0]
    assert head("(ser 42)") == pre + [0x09, 0, 0, 0, 0, 0, 0, 0]
    assert head('(ser "hello")') == pre + [0x0F, 0, 0, 0, 0, 0, 0, 0]
    assert head("(ser [1 2 3])") == pre + [0x22, 0, 0, 0, 0, 0, 0, 0]
    assert eval_str("(de (ser [150.25 300.50 125.75]))", spark) == [
        150.25, 300.50, 125.75]
    assert eval_str("(de (ser (dict ['a 'b] [1 2])))", spark) == {
        "a": 1, "b": 2}
    t = eval_str(
        "(de (ser (table [symbol price]"
        " (list ['AAPL 'MSFT] [150.25 300.50]))))", spark)
    rows = {(r.symbol, r.price) for r in t.collect()}
    assert rows == {("AAPL", 150.25), ("MSFT", 300.50)}


# -- property fuzz: any §1.2-typed value round-trips ------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _scalars = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-2 ** 63, max_value=2 ** 63 - 1),
        st.floats(allow_nan=False),  # NaN breaks == comparison, not serde
        st.text(max_size=40),
        st.builds(SymVal, st.text(
            alphabet=st.characters(codec="ascii",
                                   exclude_characters="\x00"),
            max_size=12)),
        st.builds(TimeMs, st.integers(0, 86_399_999)),
        st.builds(TsNs, st.integers(NS_2000 - 10 ** 18,
                                    NS_2000 + 10 ** 18)),
        st.dates(dt.date(1900, 1, 1), dt.date(2200, 1, 1)),
    )
    _values = st.recursive(
        _scalars,
        lambda inner: st.one_of(
            st.lists(inner, max_size=6),
            st.dictionaries(st.text(
                alphabet=st.characters(codec="ascii",
                                       exclude_characters="\x00"),
                max_size=8), inner, max_size=4),
        ),
        max_leaves=20,
    )

    @settings(max_examples=300, deadline=None)
    @given(_values)
    def test_serde_roundtrip_fuzz(v):
        assert S.de_obj(S.ser_obj(v)) == v
except ImportError:  # pragma: no cover - hypothesis is baked in here
    pass


def test_suspect_sizes_rejected():
    # negative / huge header sizes are hostile frames (ref core/serde.c:703
    # caps at 1 GB) — both de_obj and the IPC reader must refuse before
    # allocating
    good = S.ser_obj([1, 2, 3])
    for bad_size in (-1, S.MAX_MSG_SIZE + 1):
        hdr = good[:8] + struct.pack("<q", bad_size)
        with pytest.raises(S.SerdeError):
            S.de_obj(hdr + good[16:])


def test_shape_cell_datetime_to_tsns():
    # datetime cells (what Spark timestamp columns collect to) must map
    # to TsNs ns-since-epoch via INTEGER arithmetic: at 2026-scale
    # magnitudes float total_seconds() is off by whole microseconds
    d = dt.datetime(2026, 8, 14, 12, 34, 56, 789123)
    out = S.shape_cell(d)
    assert isinstance(out, TsNs)
    expect = (int(dt.datetime(2026, 8, 14, 12, 34, 56)
                  .replace(tzinfo=dt.timezone.utc).timestamp()) * 10**9
              + 789123 * 1000)
    assert int(out) == expect
    # round-trips on the wire as TYPE_TIMESTAMP
    assert S.de_obj(S.ser_obj(out)) == out
    # tz-aware input normalizes to UTC; non-datetimes pass through
    aware = d.replace(tzinfo=dt.timezone(dt.timedelta(hours=2)))
    assert int(S.shape_cell(aware)) == expect - 2 * 3600 * 10**9
    assert S.shape_cell("x") == "x" and S.shape_cell(None) is None


def test_ser_verb_handles_timestamp_table_cells(spark):
    # both binary surfaces (ser verb + IPC reply) share shape_cell, so a
    # collected Spark timestamp column serializes as TYPE_TIMESTAMP
    # instead of raising (ADVICE r6)
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2, 3, 4, 5))], "id long, ts timestamp")
    from rayforce_spark.rayfall import Interp

    it = Interp(spark, {"tt": df})
    out = it.eval_str("(de (ser tt))")
    row = out.collect()[0]
    assert row.id == 1


def test_shape_cell_recurses_into_array_cells():
    # array<timestamp> columns collect to LISTS of datetimes — shaping
    # must reach inside so both binary surfaces emit TYPE_TIMESTAMP
    # vectors instead of raising (r7 review repro)
    cell = [dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 3)]
    shaped = S.shape_cell(cell)
    assert all(isinstance(x, TsNs) for x in shaped)
    assert S.de_obj(S.ser_obj(shaped)) == shaped


def test_errval_wire_layout_and_roundtrip():
    # TYPE_ERR=127 (ref core/serde.c:319): tag + code byte + 8-byte
    # context + NUL-terminated message iff EC_USER. Live-decode against
    # the real binary is in test_ref_interop.py; this pins the layout.
    import struct

    e = S.ErrVal.user("boom")
    raw = S.ser_raw(e)
    assert raw[0] == 127 and raw[1] == S.EC_USER
    assert struct.unpack("<q", raw[2:10])[0] == 0
    assert raw[10:] == b"boom\x00"
    assert S.de_obj(S.ser_obj(e)) == e
    # non-USER codes carry no message
    ev = S.ErrVal(6, 42)  # EC_VALUE with context
    assert S.de_obj(S.ser_obj(ev)) == ev
    assert str(ev) == "'value"
