"""Binary ser/de — the reference's IPC wire format (ref core/serde.c).

Byte-compatible with the reference's ``(ser x)`` / ``(de bytes)`` for the
SURVEY §1.2 data types: a 16-byte little-endian header
(ref core/serde.h:32-39 — u32 prefix ``0xcefadefa``, u8 version, u8
flags, u8 endian, u8 msgtype, i64 payload size) followed by a recursive
tag-length-payload encoding (ref core/serde.c:166 ``ser_raw`` /
core/serde.c:365 ``de_raw``):

- atoms carry the NEGATIVE type tag (one signed byte) then the raw
  scalar (widths per core/serde.c:31 ``size_of_type``); symbol atoms are
  NUL-terminated strings (core/serde.c:197).
- vectors carry the positive tag, one attrs byte (always 0), an i64
  length, then the packed payload; symbol vectors are consecutive
  NUL-terminated strings (core/serde.c:269).
- LIST (tag 0) recurses per element; DICT/TABLE (99/98) are the
  serialized keys object then the values object (core/serde.c:302-308).

Temporal scalars travel in the reference's representation: DATE = i32
days since 2000.01.01, TIME = i32 ms of day, TIMESTAMP = i64 ns since
2000.01.01 (ref core/chrono.c; our runtime holds TsNs as ns since the
UNIX epoch, so ser/de shift by ``NS_2000``).

Scope: data types only — lambdas/primitives (TYPE_LAMBDA/UNARY/..) are
host-language objects here (SURVEY §2.9 maps them to Python) and error
objects don't cross our wire; both raise. This module exists for
wire-compat (tests/lang.c:3245 ``(de (ser null))`` and round-trip
coverage); bulk data transport stays Arrow/Parquet/Spark-native
(COVERAGE.md §2.1).
"""

from __future__ import annotations

import datetime as _dt
import struct

from .reader import Char, I16, I32, QSym, Sym, TimeMs, TsNs, U8, Vec
from .values import NS_2000, GuidVal, SymVal

SERDE_PREFIX = 0xCEFADEFA  # ref core/serde.h:30
MAX_MSG_SIZE = 1_000_000_000  # ref core/serde.c:703 (1 GB cap)
VERSION = 0 >> 3 | 1  # ref core/def.h:29 (major 0, minor 1)

# ref core/rayforce.h:50-95
T_LIST, T_B8, T_U8, T_I16, T_I32, T_I64, T_SYMBOL = 0, 1, 2, 3, 4, 5, 6
T_DATE, T_TIME, T_TIMESTAMP, T_F64, T_GUID, T_C8 = 7, 8, 9, 10, 11, 12
T_TABLE, T_DICT, T_NULL = 98, 99, 126
T_ERR = 127  # ref core/rayforce.h:95

# ref core/error.h err_code_t
EC_NAMES = ("ok", "type", "arity", "length", "domain", "index", "value",
            "limit", "os", "parse", "nyi", "user")
EC_USER = 11

_DATE0 = _dt.date(2000, 1, 1)


class SerdeError(ValueError):
    pass


class Table(dict):
    """Column-name -> column-vector mapping that serializes with the
    TYPE_TABLE tag (98) instead of TYPE_DICT (99) — the reference's
    table-on-the-wire shape (ref core/serde.c:302: a table IS its
    keys object + values object, same layout as dict, different tag)."""

    __slots__ = ()


class ErrVal:
    """An error object on the wire (TYPE_ERR=127, ref core/serde.c:319):
    code byte + 8-byte context + NUL-terminated message iff EC_USER.
    The reference replies to a failed sync eval with one of these —
    interop-tested live against the built binary."""

    __slots__ = ("code", "ctx", "msg")

    def __init__(self, code: int, ctx: int = 0, msg: str | None = None):
        self.code, self.ctx, self.msg = code, ctx, msg

    @classmethod
    def user(cls, msg: str) -> "ErrVal":
        return cls(EC_USER, 0, msg)

    def __str__(self):
        name = (EC_NAMES[self.code] if 0 <= self.code < len(EC_NAMES)
                else str(self.code))
        return f"'{self.msg}" if self.code == EC_USER else f"'{name}"

    def __repr__(self):
        return f"ErrVal({self.code}, {self.ctx}, {self.msg!r})"

    def __eq__(self, other):
        return (isinstance(other, ErrVal) and self.code == other.code
                and self.ctx == other.ctx and self.msg == other.msg)


# -- ser --------------------------------------------------------------------

def _sym_bytes(s) -> bytes:
    return str(s).encode("utf-8") + b"\x00"


def _vec_tag(xs) -> int:
    """Positive vector tag for a homogeneous python list, or T_LIST."""
    if not xs:
        return T_LIST
    kinds = {_atom_tag(x, for_vec=True) for x in xs}
    if len(kinds) == 1 and (t := kinds.pop()) is not None:
        return -t  # vector tag = positive of the atom tag
    return T_LIST


_EPOCH = _dt.datetime(1970, 1, 1)


def shape_cell(v):
    """Shape one collected Spark cell for the wire: datetime.datetime ->
    TsNs (ns since the unix epoch), so both binary surfaces (the `ser`
    verb and the IPC reply path) agree and emit the reference's
    TYPE_TIMESTAMP for real timestamp columns. Integer arithmetic on the
    timedelta — float total_seconds() loses sub-ms precision at
    2026-scale ns magnitudes (> 2^53). Recurses into list/tuple cells
    (array<timestamp> columns collect to lists of datetimes). Everything
    else passes through."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        d = v - _EPOCH
        return TsNs((d.days * 86_400 + d.seconds) * 10**9
                    + d.microseconds * 1_000)
    if isinstance(v, (list, tuple)):
        return [shape_cell(x) for x in v]
    return v


def _atom_tag(x, *, for_vec: bool = False):
    if isinstance(x, bool):
        return -T_B8
    if isinstance(x, U8):
        return -T_U8
    if isinstance(x, I16):
        return -T_I16
    if isinstance(x, I32):
        return -T_I32
    if isinstance(x, TimeMs):
        return -T_TIME
    if isinstance(x, TsNs):
        return -T_TIMESTAMP
    if isinstance(x, int):
        return -T_I64
    if isinstance(x, float):
        return -T_F64
    if isinstance(x, Char):
        return -T_C8
    if isinstance(x, GuidVal):
        return -T_GUID
    if isinstance(x, (Sym, QSym, SymVal)):
        return -T_SYMBOL
    if isinstance(x, _dt.date) and not isinstance(x, _dt.datetime):
        return -T_DATE
    if for_vec and isinstance(x, str):
        return None  # a str inside a list is itself a C8 vector
    return None


def _ser_atom(tag: int, x) -> bytes:
    t = struct.pack("<b", tag)
    if tag == -T_B8:
        return t + struct.pack("<B", 1 if x else 0)
    if tag == -T_U8:
        return t + struct.pack("<B", int(x) & 0xFF)
    if tag == -T_I16:
        return t + struct.pack("<h", int(x))
    if tag in (-T_I32, -T_TIME):
        return t + struct.pack("<i", int(x))
    if tag == -T_DATE:
        return t + struct.pack("<i", (x - _DATE0).days)
    if tag == -T_TIMESTAMP:
        return t + struct.pack("<q", int(x) - NS_2000)
    if tag == -T_I64:
        return t + struct.pack("<q", int(x))
    if tag == -T_F64:
        return t + struct.pack("<d", float(x))
    if tag == -T_C8:
        return t + str(x).encode("utf-8")[:1]
    if tag == -T_GUID:
        return t + bytes.fromhex(str(x).replace("-", ""))
    if tag == -T_SYMBOL:
        return t + _sym_bytes(x)
    raise SerdeError(f"ser: unhandled atom tag {tag}")


_VEC_FMT = {T_B8: "<B", T_U8: "<B", T_I16: "<h", T_I32: "<i", T_DATE: "<i",
            T_TIME: "<i", T_I64: "<q", T_TIMESTAMP: "<q", T_F64: "<d"}


def ser_raw(x) -> bytes:
    """One object -> tag-length-payload bytes (ref core/serde.c:166)."""
    if x is None:
        return struct.pack("<b", T_NULL)
    if isinstance(x, ErrVal):
        out = struct.pack("<bBq", T_ERR, x.code & 0xFF, x.ctx)
        if x.code == EC_USER:
            out += (x.msg or "").encode("utf-8") + b"\x00"
        return out
    if isinstance(x, dict):
        # DICT/TABLE = serialized keys object + values object (serde.c:302)
        keys = [SymVal(k) if isinstance(k, str) else k for k in x.keys()]
        tag = T_TABLE if isinstance(x, Table) else T_DICT
        return (struct.pack("<bB", tag, 0)
                + ser_raw(keys) + ser_raw(list(x.values())))
    if isinstance(x, (Sym, QSym, SymVal, Char, GuidVal)):
        return _ser_atom(_atom_tag(x), x)
    if isinstance(x, str):
        b = x.encode("utf-8")
        return struct.pack("<bBq", T_C8, 0, len(b)) + b
    if isinstance(x, (list, tuple, Vec)):
        xs = list(x)
        tag = _vec_tag(xs)
        head = struct.pack("<bBq", tag, 0, len(xs))
        if tag == T_LIST:
            return head + b"".join(ser_raw(e) for e in xs)
        if tag == T_C8:
            # a vector of char atoms IS a string in the reference's model
            b = "".join(str(e) for e in xs).encode("utf-8")
            return struct.pack("<bBq", T_C8, 0, len(b)) + b
        if tag == T_SYMBOL:
            return head + b"".join(_sym_bytes(e) for e in xs)
        if tag == T_GUID:
            return head + b"".join(
                bytes.fromhex(str(e).replace("-", "")) for e in xs)
        if tag == T_DATE:
            return head + b"".join(
                struct.pack("<i", (e - _DATE0).days) for e in xs)
        if tag == T_TIMESTAMP:
            return head + b"".join(
                struct.pack("<q", int(e) - NS_2000) for e in xs)
        fmt = _VEC_FMT[tag]
        if tag == T_B8:
            return head + b"".join(
                struct.pack(fmt, 1 if e else 0) for e in xs)
        return head + b"".join(struct.pack(fmt, e) for e in xs)
    tag = _atom_tag(x)
    if tag is not None:
        return _ser_atom(tag, x)
    raise SerdeError(f"ser: unsupported value {type(x).__name__}")


def ser_obj(x, *, msgtype: int = 0) -> bytes:
    """Full message: 16-byte header + payload (ref core/serde.c:339)."""
    payload = ser_raw(x)
    return struct.pack("<IBBBBq", SERDE_PREFIX, VERSION, 0, 0, msgtype,
                       len(payload)) + payload


# -- de ---------------------------------------------------------------------

class _Cur:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b, self.i = b, 0

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.b):
            raise SerdeError("de: truncated payload")
        out = self.b[self.i:self.i + n]
        self.i += n
        return out

    def cstr(self) -> str:
        j = self.b.index(b"\x00", self.i)
        out = self.b[self.i:j].decode("utf-8")
        self.i = j + 1
        return out


def _de_raw(c: _Cur):
    (tag,) = struct.unpack("<b", c.take(1))
    if tag == T_NULL:
        return None
    if tag == T_ERR:
        code = c.take(1)[0]
        (ctx,) = struct.unpack("<q", c.take(8))
        return ErrVal(code, ctx, c.cstr() if code == EC_USER else None)
    if tag < 0:  # atom
        if tag == -T_B8:
            return c.take(1) != b"\x00"
        if tag == -T_U8:
            return U8(c.take(1)[0])
        if tag == -T_I16:
            return I16(struct.unpack("<h", c.take(2))[0])
        if tag == -T_I32:
            return I32(struct.unpack("<i", c.take(4))[0])
        if tag == -T_DATE:
            return _DATE0 + _dt.timedelta(
                days=struct.unpack("<i", c.take(4))[0])
        if tag == -T_TIME:
            return TimeMs(struct.unpack("<i", c.take(4))[0])
        if tag == -T_I64:
            return struct.unpack("<q", c.take(8))[0]
        if tag == -T_TIMESTAMP:
            return TsNs(struct.unpack("<q", c.take(8))[0] + NS_2000)
        if tag == -T_F64:
            return struct.unpack("<d", c.take(8))[0]
        if tag == -T_SYMBOL:
            return SymVal(c.cstr())
        if tag == -T_C8:
            return Char(c.take(1).decode("utf-8"))
        if tag == -T_GUID:
            h = c.take(16).hex()
            return GuidVal(f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-"
                           f"{h[20:]}")
        raise SerdeError(f"de: unknown atom tag {tag}")
    if tag in (T_DICT, T_TABLE):
        c.take(1)  # attrs
        keys, vals = _de_raw(c), _de_raw(c)
        cls = Table if tag == T_TABLE else dict
        return cls(zip([str(k) for k in keys], vals))
    # vector / list
    c.take(1)  # attrs
    (n,) = struct.unpack("<q", c.take(8))
    if tag == T_LIST:
        return [_de_raw(c) for _ in range(n)]
    if tag == T_C8:
        return c.take(n).decode("utf-8")
    if tag == T_SYMBOL:
        return [SymVal(c.cstr()) for _ in range(n)]
    if tag == T_GUID:
        out = []
        for _ in range(n):
            h = c.take(16).hex()
            out.append(GuidVal(f"{h[:8]}-{h[8:12]}-{h[12:16]}-"
                               f"{h[16:20]}-{h[20:]}"))
        return out
    if tag == T_DATE:
        return [_DATE0 + _dt.timedelta(days=v) for v in struct.unpack(
            f"<{n}i", c.take(4 * n))]
    if tag == T_TIME:
        return [TimeMs(v) for v in struct.unpack(f"<{n}i", c.take(4 * n))]
    if tag == T_TIMESTAMP:
        return [TsNs(v + NS_2000) for v in struct.unpack(
            f"<{n}q", c.take(8 * n))]
    if tag == T_B8:
        return [b != 0 for b in c.take(n)]
    if tag == T_U8:
        return [U8(b) for b in c.take(n)]
    if tag in _VEC_FMT:
        w = struct.calcsize(_VEC_FMT[tag])
        vals = struct.unpack(f"<{n}{_VEC_FMT[tag][1]}", c.take(w * n))
        if tag == T_I16:
            return [I16(v) for v in vals]
        if tag == T_I32:
            return [I32(v) for v in vals]
        return list(vals)
    raise SerdeError(f"de: unknown vector tag {tag}")


def de_obj(buf: bytes):
    """Parse a full message (header + payload, ref core/serde.c:365)."""
    if len(buf) < 16:
        raise SerdeError("de: short header")
    prefix, _ver, _flags, endian, _mt, size = struct.unpack(
        "<IBBBBq", buf[:16])
    if prefix != SERDE_PREFIX:
        raise SerdeError(f"de: bad prefix {prefix:#x}")
    if endian != 0:
        raise SerdeError("de: big-endian payloads unsupported")
    if size < 0 or size > MAX_MSG_SIZE:
        raise SerdeError(f"de: suspect message size {size}")
    if len(buf) - 16 < size:
        raise SerdeError("de: truncated message")
    return _de_raw(_Cur(buf[16:16 + size]))
