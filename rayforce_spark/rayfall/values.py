"""Rayfall value context: driver-side vector verbs for table construction.

The reference builds in-memory tables from literal vectors
(``(table [cols] (list v1 v2 …))`` — ref core/vary.c table ctor,
examples/table.rfl, docs queries/select.md). That construction is
inherently driver-side in any engine; here the vectors feed
``spark.createDataFrame`` once and everything after is a distributed
DataFrame. These verbs are NOT the query path — dataset-scale columns come
from parquet (sources/) and the query verbs (operators/) never call them.

Sizes are literal-vector scale (doc examples: n ≤ 1e5). ``at`` on a
DataFrame collects one column and is guarded to MAX_COLLECT rows.
"""

from __future__ import annotations

import datetime as _dt
import re as _re

from rayforce_spark.rayfall.reader import I16, I32, U8, Char, TimeMs, TsNs

MAX_COLLECT = 1_000_000


class SymVal(str):
    """A symbol VALUE (from a quoted symbol / symbol vector). Distinct
    from plain str because the reference distinguishes symbol scalars
    from char vectors: ``(take 'AAPL 3)`` replicates the symbol,
    ``(take "hello" 3)`` slices characters."""
    __slots__ = ()


class EnumVals(list):
    """Marker for ``(enum 'sym xs)`` results: evaluates to the symbol
    values (interning is parquet dictionary encoding on Spark,
    COVERAGE.md §2.7) but keeps the ENUM type tag for ``(type …)``."""
    __slots__ = ()


class GuidVal(str):
    """A guid ATOM (``(as 'guid "…")`` / an element of ``(guid n)``).
    Distinct from str so guid atoms never char-vectorize; ordering is the
    reference's byte order = lexicographic on the canonical hex form
    (ref tests/lang.c guid comparison section)."""
    __slots__ = ()


class TypedList(list):
    """A vector that remembers its element type even when EMPTY — the
    reference's vectors are always width-tagged, so ``(take 1i 0i)`` is
    an empty I32 vector, not a generic LIST (ref tests/lang.c take/cast
    empty-vector sections)."""
    __slots__ = ("eltype",)

    def __init__(self, it=(), eltype: str | None = None):
        super().__init__(it)
        self.eltype = eltype


def scalar_type_name(v) -> str:
    """The reference's scalar type names (lowercase; vector names are the
    uppercase forms — docs data-types/*.md)."""
    if isinstance(v, bool):
        return "b8"
    if isinstance(v, TimeMs):
        return "time"
    if isinstance(v, TsNs):
        return "timestamp"
    if isinstance(v, I32):
        return "i32"
    if isinstance(v, I16):
        return "i16"
    if isinstance(v, U8):
        return "u8"
    if isinstance(v, int):
        return "i64"
    if isinstance(v, float):
        return "f64"
    if isinstance(v, _dt.date):
        return "date"
    if isinstance(v, GuidVal):
        return "guid"
    if isinstance(v, Char):
        return "c8"
    return "symbol"


def _is_vec(x) -> bool:
    return isinstance(x, list)


def _is_chars(x) -> bool:
    """True for char-vector strings; symbol/guid atoms are scalars."""
    return isinstance(x, str) and not isinstance(x, (SymVal, GuidVal))


def _wrap_like(v, a, b):
    """Preserve temporal tags through arithmetic: TIME ± int stays TIME
    (ref core/ops.h temporal dispatch). Already-typed results (temporal
    promotions, nulls, dates) pass through untouched."""
    if v is None or isinstance(v, (TimeMs, TsNs, _dt.date)):
        return v
    for side in (a, b):
        if isinstance(side, TimeMs):
            return TimeMs(v)
        if isinstance(side, TsNs):
            return TsNs(v)
    return v


def _apply2(op, a, b):
    def one(x, y):
        # kdb nulls propagate through scalar arithmetic
        # (ref tests/lang.c: (+ 1 0Nl) -> 0Nl)
        if x is None or y is None:
            return None
        return _wrap_like(op(x, y), x, y)

    if _is_vec(a) and _is_vec(b):
        if len(a) != len(b):
            raise ValueError(f"length mismatch: {len(a)} vs {len(b)}")
        return [one(x, y) for x, y in zip(a, b)]
    if _is_vec(a):
        return [one(x, b) for x in a]
    if _is_vec(b):
        return [one(a, y) for y in b]
    return one(a, b)


def _div_scalar(x, y):
    # the reference's `/` ALWAYS floors, for every numeric dtype mix,
    # and the result carries the LEFT operand's type (ref tests/lang.c:
    # (/ -5 0.60) -> -9, (/ -2.00 6) -> -1.00, (/ -5 -2.00) -> 2).
    # Division by zero is NULL ((/ -5 0) -> 0Nl) — the value-context
    # twin of functions.kdb.ediv.
    if y == 0:
        return U8(0) if isinstance(x, U8) else None
    q = x // y if not (isinstance(x, float) or isinstance(y, float)) else (
        __import__("math").floor(x / y)
    )
    return float(q) if isinstance(x, float) else int(q)


def _mod_scalar(x, y):
    if y == 0:
        # (% 10i 0i) -> 0Ni; u8 has no null sentinel -> 0x00
        return U8(0) if isinstance(x, U8) else None
    if isinstance(x, float) or isinstance(y, float):
        # the reference's FEUCL_MOD is x - floor(x/y)*y (ref
        # core/ops.h:167-168) with the quotient from a DOUBLE division
        # (so it can round across an integer boundary: 3/0.05 -> 60.0)
        # and the subtract-multiply CONTRACTED TO AN FMA by the same-box
        # build ((% 3 0.05) -> -1.67e-16 there; two-rounding doubles
        # give 0.0; Python's exact `%` gives 0.0499…). Emulate the fused
        # single rounding with exact rational arithmetic — pinned by
        # scripts/ref_diff.py. NaN operands -> null (MODF64's ISNANF64
        # guard); an infinite quotient follows C float math (no floor,
        # Fraction can't hold inf).
        import math
        from fractions import Fraction

        if math.isnan(x) or math.isnan(y):
            return None
        q = x / y
        if not (math.isfinite(x) and math.isfinite(y)
                and math.isfinite(q)):
            # C float math end-to-end (Fraction can't hold inf):
            # floor(+-inf) stays +-inf in C, and 0*inf/x-inf propagate
            return x - (math.floor(q) if math.isfinite(q) else q) * y
        q = math.floor(q)
        return float(Fraction(x) - q * Fraction(y))
    return x % y


def _time_ns(t: TimeMs) -> int:
    return int(t) * 1_000_000


def _date_ns(d: _dt.date) -> int:
    return (d - _dt.date(1970, 1, 1)).days * 86_400_000_000_000


def _add_scalar(x, y):
    # temporal promotions (ref tests/lang.c math section):
    #   date + int        -> date (day arithmetic)
    #   date + TIME       -> TIMESTAMP at that time of day
    #   TIMESTAMP + TIME  -> TIMESTAMP (TIME is ms -> ns)
    for a, b in ((x, y), (y, x)):
        if isinstance(a, _dt.date) and isinstance(b, TimeMs):
            return TsNs(_date_ns(a) + _time_ns(b))
        if isinstance(a, TsNs) and isinstance(b, TimeMs):
            return TsNs(int(a) + _time_ns(b))
        if (isinstance(a, _dt.date) and isinstance(b, int)
                and not isinstance(b, (bool, TimeMs, TsNs))):
            return a + _dt.timedelta(days=int(b))
    return x + y


def _sub_scalar(x, y):
    if isinstance(x, _dt.date) and isinstance(y, _dt.date):
        return (x - y).days  # date difference is a day count (lang.c: 407i)
    if isinstance(x, TsNs) and isinstance(y, TimeMs):
        return TsNs(int(x) - _time_ns(y))
    if isinstance(x, _dt.date) and isinstance(y, TimeMs):
        return TsNs(_date_ns(x) - _time_ns(y))
    if (isinstance(x, _dt.date) and isinstance(y, int)
            and not isinstance(y, (bool, TimeMs, TsNs))):
        return x - _dt.timedelta(days=int(y))
    return x - y


def add(a, b):
    return _apply2(_add_scalar, a, b)


def sub(a, b):
    return _apply2(_sub_scalar, a, b)


def mul(a, b):
    return _apply2(lambda x, y: x * y, a, b)


def div(a, b):
    return _apply2(_div_scalar, a, b)


def mod(a, b):
    return _apply2(_mod_scalar, a, b)


def fdiv(a, b):
    """(div x y) — true (floating) division; `/` floors
    (docs operations/math.md "Division by Zero" note)."""
    return _apply2(lambda x, y: None if y == 0 else x / y, a, b)


def til(n) -> list:
    return list(range(int(n)))


def take(x, n):
    """Take (ref core/items.c, docs operations/iterable.md):
    scalar -> n copies; vector and positive n -> first n, cycling past
    the end (docs joins.md builds symbol columns this way); negative n ->
    last |n|; ``[start amount]`` -> slice (negative start from the end).
    Strings are char vectors; symbol scalars replicate whole."""
    if hasattr(x, "sparkSession"):  # DataFrame: (take t n) = head/tail
        from rayforce_spark.operators.query import _take as df_take

        if _is_vec(n):
            return df_take(x, tuple(int(v) for v in n))
        nn = int(n)
        cnt = x.count()
        if abs(nn) <= cnt:
            return df_take(x, nn)
        # past-the-end takes CYCLE rows like vectors (ref tests/lang.c:
        # (take (table …4 rows…) 5) repeats row 0) — literal-table scale
        if cnt > MAX_COLLECT:
            raise ValueError(
                f"(take table n) with n > len cycles via the driver; "
                f"table has {cnt} rows (max {MAX_COLLECT})")
        rows = x.collect()
        if not rows:
            return x
        if nn >= 0:
            out = [rows[i % cnt] for i in range(nn)]
        else:
            m = -nn
            out = [rows[(cnt - m + i) % cnt] for i in range(m)]
        return x.sparkSession.createDataFrame(out, schema=x.schema)
    if isinstance(x, dict):
        # (take dict n): first n / last -n entries; [start amount]
        # slices; 0 keeps the DICT tag (ref tests/lang.c take section)
        items = list(x.items())
        if _is_vec(n):
            start, amount = int(n[0]), int(n[1])
            if start < 0:
                start += len(items)
            return dict(items[start:start + amount])
        nn = int(n)
        if nn == 0:
            return {}
        return dict(items[:nn] if nn >= 0 else items[nn:])
    if _is_vec(n):
        start, amount = int(n[0]), int(n[1])
        seq = x if _is_vec(x) or isinstance(x, str) else [x]
        if start < 0:
            start += len(seq)
        return seq[start:start + amount]
    n = int(n)
    is_chars = _is_chars(x)
    if not _is_vec(x) and not is_chars:
        if n == 0:
            return TypedList(eltype=scalar_type_name(x).upper())
        return [x] * abs(n)
    seq = list(x) if is_chars else x
    if n == 0 and not is_chars:
        el = "ENUM" if isinstance(x, EnumVals) else getattr(x, "eltype", None)
        if el is None and seq:
            names = {scalar_type_name(v) for v in seq
                     if v is not None and not isinstance(v, list)}
            homogeneous = (len(names) == 1
                           and not any(isinstance(v, list) for v in seq))
            el = names.pop().upper() if homogeneous else "LIST"
        return TypedList(eltype=el)
    if not seq:
        return "" if is_chars else TypedList(eltype=getattr(x, "eltype", None))
    if n >= 0:
        out = [seq[i % len(seq)] for i in range(n)]
    else:
        m = -n
        # wraps BACKWARD from the end when |n| > len
        # (ref tests/lang.c: (take [0 1 2 3] -5) -> [3 0 1 2 3])
        out = (seq[-m:] if m <= len(seq)
               else [seq[(len(seq) - m + i) % len(seq)] for i in range(m)])
    return "".join(out) if is_chars else out


def concat(a, b):
    """Concat; two char vectors (plain strings) join into one string
    (ref tests/lang.c: (concat "te" "st") -> "test")."""
    if hasattr(a, "sparkSession") and hasattr(b, "sparkSession"):
        # table concat appends BY NAME into the left schema; right-only
        # columns drop, right-missing columns fill null (ref tests/lang.c
        # concat table section: [A C] , [C B A] -> [A C])
        from pyspark.sql import functions as F

        rb = b
        for c in a.columns:
            if c not in b.columns:
                rb = rb.withColumn(c, F.lit(None).cast(dict(a.dtypes)[c]))
        return a.unionByName(rb.select(*a.columns))
    if _is_chars(a) and _is_chars(b):
        return a + b
    if isinstance(a, dict) and isinstance(b, dict):
        # dict concat merges, right wins on shared keys (ref tests/lang.c
        # concat dict section — kdb ,: semantics)
        return {**a, **b}
    av = a if _is_vec(a) else [a]
    bv = b if _is_vec(b) else [b]
    return av + bv


def reverse_(x):
    # a string is a CHAR VECTOR: (reverse "abc") -> "cba" (live-probed;
    # same convention as distinct_)
    if isinstance(x, str) and not isinstance(x, SymVal):
        return x[::-1]
    return list(reversed(x))


def distinct_(x):
    """Distinct (ref tests/lang.c): nulls drop; numeric/temporal values
    come back in ASCENDING order — live-probed against the built binary
    (scripts/ref_diff.py): (distinct [3 1 2 1]) -> [1 2 3], bools/dates
    sort too, matching the lang.c u8 fixture [0x10 0x12]. Symbols keep
    first-occurrence order (the reference sorts by intern id, which
    equals appearance order), as do lists/strings-as-elements."""
    if isinstance(x, str) and not isinstance(x, SymVal):
        return "".join(sorted(dict.fromkeys(x)))
    vals = [v for v in x if v is not None]
    if vals and not any(isinstance(v, SymVal) for v in vals) and (
            all(isinstance(v, (bool, int, float)) for v in vals)
            or all(isinstance(v, _dt.date) for v in vals)):
        return sorted(dict.fromkeys(vals))
    seen = {}
    for v in vals:
        k = tuple(v) if isinstance(v, list) else v
        if k not in seen:
            seen[k] = v
    out = list(seen.values())
    if any(isinstance(v, list) for v in out):
        # mixed LIST distinct: the reference emits atoms before vectors
        # (tests/lang.c: (distinct (list [3i 3i] 2i …)) -> (list 2i [3i 3i]))
        out = ([v for v in out if not isinstance(v, list)]
               + [v for v in out if isinstance(v, list)])
    return out


NS_2000 = 946_684_800 * 1_000_000_000  # the reference's epoch (2000.01.01)


def _parse_ts(v: str) -> TsNs:
    """Timestamp string -> ns, EXACT to the nanosecond (a float epoch
    would round 087221025 ns): whole seconds through datetime, the
    fractional digits appended as integer ns."""
    s = v.strip().replace("T", " ")
    m = _DOTTED_DATE.match(s)
    if m:  # the reference's own literal form 2004.10.21D12:00:00.000000000
        s = f"{m.group(1)}-{m.group(2)}-{m.group(3)} {m.group(4) or '00:00:00'}"
    frac_ns = 0
    if "." in s:
        head, frac = s.split(".", 1)
        tail = ""
        for i, c in enumerate(frac):
            if not c.isdigit():
                tail = frac[i:]
                break
        digits = frac[: len(frac) - len(tail)] if tail else frac
        frac_ns = int(digits.ljust(9, "0")[:9])
        s = head + tail
    dt = _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    return TsNs(int(dt.timestamp()) * 1_000_000_000 + frac_ns)


def _c8_str(v) -> str:
    """The reference's display form for C8 casts (ref tests/lang.c:
    (as 'C8 true) -> "true", (as 'C8 2024.03.20) -> "2024.03.20")."""
    from rayforce_spark.rayfall.reader import unparse

    if v is None:
        return ""  # null -> empty char vector ((as 'C8 ') -> "")
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (TimeMs, _dt.date)):
        return unparse(v)
    if isinstance(v, TsNs):
        return _fmt_ts(v)
    if isinstance(v, int):
        return str(int(v))
    return str(v)


def _fmt_ts(v: TsNs) -> str:
    ns = int(v)
    days, rem = divmod(ns, 86_400_000_000_000)
    d = _dt.date(1970, 1, 1) + _dt.timedelta(days=days)
    secs, frac = divmod(rem, 1_000_000_000)
    h, r = divmod(secs, 3600)
    mi, s = divmod(r, 60)
    return (f"{d.year:04d}.{d.month:02d}.{d.day:02d}D"
            f"{h:02d}:{mi:02d}:{s:02d}.{frac:09d}")


_DOTTED_DATE = _re.compile(r"^(\d{4})\.(\d{2})\.(\d{2})(?:D(.*))?$")


def _parse_time_str(s: str) -> TimeMs:
    """"12:30:45.123" / "20:00:00" / "20:00:00.0" -> ms-of-day
    (fraction is ms, right-padded — ref core/parse.c time literals)."""
    parts = s.strip().split(":")
    h, mi = int(parts[0]), int(parts[1])
    sec, ms = 0, 0
    if len(parts) > 2:
        sp = parts[2].split(".")
        sec = int(sp[0])
        if len(sp) > 1 and sp[1]:
            ms = int(sp[1][:3].ljust(3, "0"))
    return TimeMs(((h * 60 + mi) * 60 + sec) * 1000 + ms)


def _num_2000(v):
    """Temporal -> the reference's raw numeric form (days / ms / ns
    relative to the 2000.01.01 epoch where applicable)."""
    if isinstance(v, _dt.date):
        return (v - _dt.date(2000, 1, 1)).days
    if isinstance(v, TsNs):
        return int(v) - NS_2000
    if isinstance(v, TimeMs):
        return int(v)
    return v


def as_value(type_name: str, x):
    """Value-context cast ``(as 'TIME i)`` etc. Ints cast to TIME are read
    as ms-of-day, to TIMESTAMP as ns — the reference's raw reinterpretation
    (ref core/compose.c:42). Lowercase 'c8 makes a char ATOM (first char);
    uppercase 'C8 the display string; empty vectors keep the target tag
    ((as 'B8 []) has type 'B8)."""
    t = type_name.lower()

    def one(v):
        if t == "c8":
            if type_name[0].isupper():
                return _c8_str(v)
            s = _c8_str(v)
            from rayforce_spark.rayfall.reader import Char as _Char

            return _Char(s[0]) if s else _Char("")
        if v is None:
            return None
        if t == "guid":
            return GuidVal(str(v))
        if t == "time":
            if isinstance(v, str):
                return _parse_time_str(v)
            if isinstance(v, _dt.date):
                return TimeMs(0)
            if isinstance(v, TsNs):
                return TimeMs((int(v) % 86_400_000_000_000) // 1_000_000)
            return TimeMs(v)
        if t == "timestamp":
            if isinstance(v, str):
                return _parse_ts(v)
            if isinstance(v, TsNs):
                return v
            if isinstance(v, _dt.date):
                return TsNs(_date_ns(v))
            # raw int: ns since the reference's 2000.01.01 epoch
            # (ref tests/lang.c: (as 'timestamp 0) -> 2000.01.01D00:00)
            return TsNs(int(v) + NS_2000)
        if t == "date":
            if isinstance(v, _dt.date):
                return v
            if isinstance(v, str):
                m = _DOTTED_DATE.match(v.strip())
                if m:
                    return _dt.date(int(m.group(1)), int(m.group(2)),
                                    int(m.group(3)))
                return _dt.date.fromisoformat(v)
            if isinstance(v, TsNs):
                return (_dt.date(1970, 1, 1)
                        + _dt.timedelta(days=int(v) // 86_400_000_000_000))
            # raw int: days since 2000.01.01 ((as 'date 0) -> 2000.01.01)
            return _dt.date(2000, 1, 1) + _dt.timedelta(days=int(v))
        if t == "f64":
            return float(_num_2000(v))
        if t == "i32":
            return I32(_num_2000(v))
        if t == "i16":
            return I16(_num_2000(v))
        if t == "i64":
            return int(_num_2000(v))
        if t == "u8":
            return U8(int(_num_2000(v)) & 0xFF)
        if t == "b8":
            if isinstance(v, TsNs):
                return int(v) != NS_2000
            if isinstance(v, _dt.date):
                return v != _dt.date(2000, 1, 1)
            return bool(v)
        if t == "symbol":
            # symbols render the reference's literal forms:
            # (as 'symbol true) -> '1, (as 'symbol 42i) -> '42
            if isinstance(v, bool):
                return SymVal(int(v))
            if isinstance(v, (TimeMs, TsNs, _dt.date)):
                from rayforce_spark.rayfall.reader import unparse

                return SymVal(unparse(v))
            if isinstance(v, int) and not type_name[0].isupper():
                return SymVal(int(v))
            return v if isinstance(v, int) else SymVal(v)
        if t == "string":
            return str(v)
        raise ValueError(f"as: unsupported value cast '{type_name}")

    if _is_vec(x):
        out = [one(v) for v in x]
        # the vector tag survives even when empty (or, for SYMBOL-from-
        # int, when elements stay numeric — ref tests/lang.c:
        # (type (as 'SYMBOL (til 5))) -> 'SYMBOL, values unchanged)
        if not out or (t == "symbol" and any(isinstance(v, int) for v in out)):
            return TypedList(out, eltype=type_name.upper())
        return out
    return one(x)


def map_left(op, left, right) -> list:
    """(map-left f xs y): apply f(x, y) for each x — a list of results
    (docs joins.md builds window intervals this way). Plain strings
    iterate as char vectors (examples/iter.rfl); a SCALAR left
    degenerates to plain elementwise application
    (ref tests/lang.c: (map-left - 10 [1 2 3]) -> [9 8 7])."""
    e = _elems(left)
    if e is None:
        out = op(left, right)
        return out if _is_vec(out) else [out]
    return [op(x, right) for x in e]


def map_right(op, left, right) -> list:
    """(map-right f x ys): apply f(x, y) for each y."""
    e = _elems(right)
    if e is None:
        out = op(left, right)
        return out if _is_vec(out) else [out]
    return [op(left, y) for y in e]


def at_collect(df, col: str) -> list:
    """(at table 'col) in value context: one column to the driver.

    Guarded: this is the doc-example idiom for building interval vectors —
    never a dataset-scale path (window-join's offset form bypasses it
    entirely, see evalr._eval_window_join)."""
    n = df.count()
    if n > MAX_COLLECT:
        raise ValueError(
            f"(at table 'col) collects to the driver; table has {n} rows "
            f"(max {MAX_COLLECT}). Use the query verbs for dataset-scale work."
        )
    return [r[0] for r in df.select(col).collect()]


def spark_type_of(values: list):
    """Infer one Spark DDL type for a literal column."""
    kinds = {type(v) for v in values if v is not None}
    if not kinds:
        return "string"
    if kinds <= {TimeMs, int} and TimeMs in kinds:
        return "long"  # ms-of-day (documented TIME carrier, SURVEY §1.2)
    if kinds <= {TsNs, int} and TsNs in kinds:
        return "long"  # ns since epoch
    if kinds <= {I32, int} and I32 in kinds:
        return "int"
    if kinds <= {I16, int} and I16 in kinds:
        return "smallint"
    if kinds <= {U8, int} and U8 in kinds:
        return "smallint"
    # symbol values are strings on Spark
    kinds = {str if issubclass(k, str) else k for k in kinds}
    if kinds <= {bool}:
        return "boolean"
    if kinds <= {int, bool}:
        return "long"
    if kinds <= {int, float, bool}:
        return "double"
    if kinds <= {str}:
        return "string"
    if kinds <= {_dt.date}:
        return "date"
    raise TypeError(f"cannot infer a column type for {kinds}")


def build_table(spark, names: list[str], cols: list[list]):
    """(table [names] (list col …)) -> DataFrame.

    Scalar columns broadcast to the table length; temporal literals carry
    as longs (ms-of-day / ns) matching the engine's dtype conventions.
    """
    if len(names) != len(cols):
        raise ValueError(f"table: {len(names)} names vs {len(cols)} columns")
    vecs = [c if _is_vec(c) else [c] for c in cols]
    n = max((len(v) for v in vecs), default=0)
    vecs = [v if len(v) == n else (v * n if len(v) == 1 else v) for v in vecs]
    for name, v in zip(names, vecs):
        if len(v) != n:
            raise ValueError(f"table: column '{name}' length {len(v)} != {n}")
    ddl = ", ".join(
        f"`{name}` {spark_type_of(v)}" for name, v in zip(names, vecs)
    )

    def norm(v):
        if isinstance(v, (TimeMs, TsNs, I32, I16, U8)):
            return int(v)
        if isinstance(v, SymVal):
            return str(v)
        return v

    rows = [tuple(norm(v[i]) for v in vecs) for i in range(n)]
    return spark.createDataFrame(rows, schema=ddl)


# ---------------------------------------------------------------------------
# ordering / ranking (docs operations/order.md; ref core/order.c)
# ---------------------------------------------------------------------------


def _ord_key(v):
    """Sort key matching the reference's float order: its sort compares
    f64 bits in total order, so -0.0 sorts BEFORE 0.0 even though
    (== -0.0 0.0) is true ((asc [0.0 -0.0]) -> [-0.0 0.0], live-pinned
    by scripts/ref_diff.py). Floats map through the standard
    sign-magnitude bit flip; other types sort natively."""
    if isinstance(v, float):
        import struct

        u = struct.unpack("<Q", struct.pack("<d", v))[0]
        u = (u ^ 0xFFFFFFFFFFFFFFFF) if (u >> 63) else (u | (1 << 63))
        return u
    return v


def _mixed_key(x: list):
    """Numeric vectors may mix ints and floats (int promotes); the bit
    key only applies when a float is present, and then every element
    maps through it so the total order is consistent. Nulls sort as
    LARGEST — (asc [null 7 8]) -> [7 8 null], desc/idesc put the null
    first (live-pinned r8 against the reference via left-join
    backfill); the leading is-None tuple slot encodes that without
    comparing None to values (python TypeError otherwise)."""
    if any(isinstance(v, float) for v in x):
        return lambda v: (v is None, 0 if v is None else _ord_key(float(v)))
    return lambda v: (v is None, 0 if v is None else v)


def asc(x: list) -> list:
    return sorted(x, key=_mixed_key(x))


def desc(x: list) -> list:
    return sorted(x, key=_mixed_key(x), reverse=True)


def iasc(x: list) -> list:
    """Ascending sort permutation (stable: ties keep arrival order)."""
    k = _mixed_key(x)
    return sorted(range(len(x)), key=lambda i: k(x[i]))


def idesc(x: list) -> list:
    # python's reverse=True keeps equal elements in arrival order
    k = _mixed_key(x)
    return sorted(range(len(x)), key=lambda i: k(x[i]), reverse=True)


def rank(x: list) -> list:
    """Position of each element in the stable ascending sort, 0-based
    (docs operations/order.md: (rank [30 10 20]) -> [2 0 1])."""
    out = [0] * len(x)
    for pos, i in enumerate(iasc(x)):
        out[i] = pos
    return out


def xrank(x: list, n: int) -> list:
    """n-quantile bucket: rank*n div len (ref core/order.c:589 — matches
    operators.order.xrank's interleaved formula, not SQL ntile)."""
    ln = len(x)
    return [r * n // ln for r in rank(x)]


# ---------------------------------------------------------------------------
# set / membership (docs operations/iterable.md; ref core/compose.c)
# ---------------------------------------------------------------------------


def except_(a, b) -> list:
    bs = set(b) if _is_vec(b) else {b}
    return [v for v in a if v not in bs]


def union_(a: list, b: list) -> list:
    # union IS distinct-of-concat in the reference: numeric unions sort
    # ((union [3 1] [2 1]) -> [1 2 3], live-probed), symbol unions keep
    # appearance order (lang.c: (union ['a 'b] ['b 'c]) -> [a b c])
    return distinct_(list(a) + list(b))


def sect_(a: list, b: list) -> list:
    # dup-preserving, appearance-ordered: (sect [5 10 -1 3 5 2]
    # [3 5 0 -1]) -> [5 -1 3 5] (live-probed; lang.c's sect fixtures
    # are dup-free so both readings pass them)
    bs = set(b)
    return [v for v in a if v in bs]


def in_(a, b):
    """(in x coll): scalar -> bool, vector -> elementwise bool per
    element (recursing into nested strings/vectors); a plain string left
    is a CHAR VECTOR, while char/symbol/guid atoms are scalars
    (ref tests/lang.c: (in 'e' "test") -> true,
    (in (list "asd" "iu") "asd") -> (list [true true true] [false false]))."""
    coll = b if _is_vec(b) or _is_chars(b) else [b]
    if _is_chars(a) and not isinstance(a, Char):
        return [c in coll for c in a]  # char-vector membership
    if _is_vec(a):
        return [in_(v, b) for v in a]
    return a in coll


def find_(coll, v):
    """Index of first occurrence, None (kdb null) if absent; a vector of
    needles finds each (ref tests/lang.c: (find [10 20 30 40] [20 40])
    -> [1 3])."""
    def one(needle):
        try:
            return list(coll).index(needle)
        except ValueError:
            return None

    if _is_vec(v):
        # empty source short-circuits to [] (ref tests/lang.c:
        # (find [] [1 2 3]) -> [])
        return [] if not coll else [one(n) for n in v]
    return one(v)


def filter_(coll, mask: list):
    out = [v for v, m in zip(coll, mask) if m]
    return "".join(out) if isinstance(coll, str) else out


def split_vals(x, d):
    """(split x d): delimiter split for char vectors/symbols; for a
    vector x with a sorted index vector d, cut into segments starting at
    each index (ref tests/lang.c split section: (split [1 2 3 4 5]
    [0 2 4]) -> (list [1 2] [3 4] [5]))."""
    if isinstance(x, (SymVal, GuidVal)) or (_is_chars(x) and not _is_vec(d)):
        return str(x).split(str(d))
    idx = [int(i) for i in (d if _is_vec(d) else [d])]
    if not idx:
        return None  # (split xs []) -> null (ref tests/lang.c:2849)
    ends = idx[1:] + [len(x)]
    return [x[i:j] for i, j in zip(idx, ends)]


def bin_vals(xs: list, y, *, right: bool = False):
    """(bin xs y): index of the last element <= y (-1 below the first);
    (binr xs y): index of the FIRST element >= y — kdb bin/binr over a
    sorted vector (ref tests/lang.c bin section; docs operations/order.md).
    Vector needles map elementwise."""
    import bisect

    def one(v):
        if right:
            return bisect.bisect_left(xs, v)
        return bisect.bisect_right(xs, v) - 1

    return [one(v) for v in y] if _is_vec(y) else one(y)


def within_vals(x, bounds: list):
    lo, hi = bounds
    if _is_vec(x):
        return [lo <= v <= hi for v in x]
    # an atom comes back as a one-element boolean vector, same as the
    # reference ((within 15 [10 20]) -> [true], live-probed; lang.c
    # only pins the vector forms)
    return [lo <= x <= hi]


# ---------------------------------------------------------------------------
# vector aggregates (docs operations/math.md; driver-side literal scale)
# ---------------------------------------------------------------------------


def vagg(name: str, x):
    if _is_chars(x) and not isinstance(x, Char):
        x = [Char(c) for c in x]  # char vector ((first "hello") -> 'h')
    if not _is_vec(x):
        x = [x]  # aggregates of atoms are the atom (ref: (sum -24) -> -24)
    xs = [v for v in x if v is not None]
    if name == "count":
        return len(x)
    if name == "first":
        return x[0] if x else None
    if name == "last":
        return x[-1] if x else None
    if name == "sum":
        if not xs:
            return 0  # kdb sum identity 0
        s = sum(xs)
        # i32 vectors sum IN their width, wrapping (ref tests/lang.c:
        # (sum (as 'I32 (til 100000))) -> 704982704i); i16 sums WIDEN
        # ((sum (take 10h 100000)) -> 1000000)
        if all(isinstance(v, I32) for v in xs):
            return I32(s)
        return s
    if not xs:
        return None
    if name == "avg":
        return sum(xs) / len(xs)
    if name == "min":
        return min(xs)
    if name == "max":
        return max(xs)
    if name == "med":
        s = sorted(xs)
        m = len(s) // 2
        return float(s[m]) if len(s) % 2 else (s[m - 1] + s[m]) / 2
    if name == "dev":
        mu = sum(xs) / len(xs)
        return (sum((v - mu) ** 2 for v in xs) / len(xs)) ** 0.5
    raise ValueError(name)


def xbar_vals(n, x):
    """(xbar x n) bucketing: n * floor(x/n) (ref core/math.c xbar).

    Mixed LIST args pair elementwise with per-pair atom/vector broadcast
    (ref tests/lang.c:2415). The numeric result carries the BUCKET
    operand's type ((xbar 10i 4) -> 8, (xbar 11i 4.0) -> 8.00,
    (xbar [15i] 4i) -> [12i]); temporals stay temporal, with dates
    bucketing in days since the 2000.01.01 epoch
    ((xbar 2020.01.01 2i) -> 2019.12.31)."""
    import math

    def ibar(v, nn):
        # ref ops.h XBARI64: y==0 -> null; ((x<0) ? (x+1-y) : x)/y*y
        # with C TRUNCATING division ((xbar 1 -2) -> 0, (xbar -5 3) ->
        # -6 — live-probed + lang.c:2411)
        if nn == 0:
            return None
        a = v + 1 - nn if v < 0 else v
        q = abs(a) // abs(nn)
        if (a < 0) != (nn < 0):
            q = -q
        return nn * q

    def one(v, nn):
        if v is None or nn is None:
            return None
        if isinstance(v, _dt.date):
            if int(nn) == 0:
                return None
            d2k = (v - _dt.date(2000, 1, 1)).days
            return _dt.date(2000, 1, 1) + _dt.timedelta(
                days=(d2k // int(nn)) * int(nn))
        if isinstance(v, TimeMs):
            if int(nn) == 0:
                return None
            return TimeMs((int(v) // int(nn)) * int(nn))
        if isinstance(v, TsNs):
            step = int(nn) * (1_000_000 if isinstance(nn, TimeMs) else 1)
            if step == 0:
                return None
            return TsNs((int(v) // step) * step)
        if isinstance(nn, float):
            # ref ops.h XBARF64: FLOOR(x/y)*y, nan -> null
            if nn == 0.0 or v != v:
                return None
            return float(nn * math.floor(v / nn))
        q = ibar(int(v), int(nn))
        if q is None:
            return None
        if isinstance(nn, I32):
            return I32(q)
        if isinstance(nn, I16):
            return I16(q)
        return q

    if _is_vec(x) and _is_vec(n):
        if len(x) != len(n):
            raise ValueError(f"length mismatch: {len(x)} vs {len(n)}")
        return [xbar_vals(nn, v) for v, nn in zip(x, n)]
    if _is_vec(x):
        return [xbar_vals(n, v) for v in x]
    if _is_vec(n):
        return [xbar_vals(nn, x) for nn in n]
    return one(x, n)


_CMPS = {
    "=": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    ">": lambda a, b: a > b,
    "<=": lambda a, b: a <= b,
    ">=": lambda a, b: a >= b,
}


def _ord_one(op: str, x, y) -> bool:
    """One ordered comparison with the reference's null/temporal rules:
    null orders below every value and ties with null (ref tests/lang.c
    cmp matrix over [… 0Ni … 0Nl … 0Nf …]); a date compared to a
    TIMESTAMP promotes to midnight (ref tests/lang.c:
    (< 2024.01.01 2024.01.01D10:00:00.000000000) -> true)."""
    if x is None or y is None:
        if op == "<":
            return x is None and y is not None
        if op == ">":
            return y is None and x is not None
        if op == "<=":
            return x is None
        return y is None  # >=
    if isinstance(x, _dt.date) and isinstance(y, TsNs):
        x = TsNs(_date_ns(x))
    elif isinstance(y, _dt.date) and isinstance(x, TsNs):
        y = TsNs(_date_ns(y))
    return bool(_CMPS[op](x, y))


def compare(op: str, a, b):
    """Elementwise comparisons (docs operations/logic.md). Equality
    treats null as a VALUE ((== 0Ni 0Ni) -> true, ref tests/lang.c);
    ordered comparisons rank null below everything (see _ord_one)."""
    f = _CMPS[op]
    if op in ("=", "<>"):
        # Strings compare WHOLE ((== "ab" "ac") -> false, scalar) — only
        # true vectors compare elementwise; None compares as a value.
        ea = a if _is_vec(a) else None
        eb = b if _is_vec(b) else None
        if ea is None and eb is None:
            return bool(f(a, b))
        if ea is None:
            ea = [a] * len(eb)
        if eb is None:
            eb = [b] * len(ea)
        return [bool(f(x, y)) for x, y in zip(ea, eb)]
    ea = a if _is_vec(a) else None
    eb = b if _is_vec(b) else None
    if ea is None and eb is None:
        return _ord_one(op, a, b)
    if ea is None:
        ea = [a] * len(eb)
    if eb is None:
        eb = [b] * len(ea)
    if len(ea) != len(eb):
        raise ValueError(f"length mismatch: {len(ea)} vs {len(eb)}")
    return [_ord_one(op, x, y) for x, y in zip(ea, eb)]


def logic(op: str, a, b):
    """Elementwise and/or (docs operations/logic.md: vector AND vector,
    vector AND scalar broadcast)."""
    f = (lambda x, y: bool(x) and bool(y)) if op == "and" else (
        lambda x, y: bool(x) or bool(y))
    if _is_vec(a) or _is_vec(b):
        return _apply2(f, a, b)
    return f(a, b)


def _elems(x):
    """Element view: plain strings are char vectors (symbols are scalars);
    None marks a scalar."""
    if isinstance(x, str) and not isinstance(x, SymVal):
        return list(x)
    return x if _is_vec(x) else None


def broadcast2(a, b) -> tuple[list, list]:
    """Align two operands elementwise with scalar broadcast — the shape
    rule of the reference's map/apply over mixed scalar/vector args
    (examples/iter.rfl, apply.rfl)."""
    ea, eb = _elems(a), _elems(b)
    if ea is None and eb is None:
        return [a], [b]
    if ea is None:
        ea = [a] * len(eb)
    if eb is None:
        eb = [b] * len(ea)
    if len(ea) != len(eb):
        raise ValueError(f"length mismatch: {len(ea)} vs {len(eb)}")
    return ea, eb
