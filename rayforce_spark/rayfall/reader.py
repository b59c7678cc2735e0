"""Rayfall reader: query strings -> s-expression AST.

The reference's surface language is a Lisp (parser at ref core/parse.c;
tokens :126, numbers :507, time :202, timestamp :267, symbols :733,
vectors :784, lists :937). This reader covers the query subset scoped in
SURVEY §2.9 / §7 — literals, symbols, vectors, dicts, nested calls — so
reference doc examples (docs queries/select.md, joins.md, update.md,
insert.md, upsert.md, examples/*.rfl) run verbatim against the Spark
verbs. No lambdas, no bytecode VM: those are Python's job in this engine.

Grammar notes (all observed in the reference docs, not its C code):
- ``(f a b)``        call — a Python list ``[Sym('f'), a, b]``
- ``{k: v ...}``     dict literal — ``DictLit([(key, ast), ...])``; keys
                     are identifiers immediately followed by ``:``
- ``[x 1 'y]``       vector literal — self-quoting: bare identifiers are
                     symbol literals (``(table [name dept] …)``,
                     ``(left-join [order_id] …)``)
- ``'sym``           quoted symbol literal
- ``"str"``          string
- ``2021.01.15``     date literal -> datetime.date
- ``09:00:00[.mmm]`` time literal -> TimeMs (i32 ms-of-day, SURVEY §1.2)
- ``;`` comment to end of line
- ``-`` before a digit after a delimiter is a negative-number sign;
  otherwise it is part of an identifier (``left-join``, ``map-left``).
"""

from __future__ import annotations

import datetime as _dt
import re


class Sym(str):
    """Identifier reference (resolved against columns, then env)."""
    __slots__ = ()

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Sym({str.__repr__(self)})"


class Char(str):
    """Char ATOM ``'x'`` — distinct from a 1-char string: the reference's
    c8 scalar (ref core/parse.c char literals; tests/lang.c literals
    section). Escapes ``'\\n'`` and octal ``'\\001'`` are supported."""
    __slots__ = ()

    def __repr__(self):  # pragma: no cover
        return f"Char({str.__repr__(self)})"


class QSym(str):
    """Quoted symbol literal ``'IT`` — a kdb symbol, i.e. a string value."""
    __slots__ = ()

    def __repr__(self):  # pragma: no cover
        return f"QSym({str.__repr__(self)})"


class Vec(list):
    """``[ ... ]`` vector literal (elements already read; bare identifiers
    arrive as QSym — vector literals self-quote)."""
    __slots__ = ()


class DictLit(list):
    """``{k: v ...}`` — ordered (key, ast) pairs."""
    __slots__ = ()


class TimeMs(int):
    """Time-of-day literal, ms since midnight (reference TIME is i32
    ms-of-day, ref core/chrono.c; SURVEY §1.2)."""
    __slots__ = ()

    def __repr__(self):  # pragma: no cover
        return f"TimeMs({int(self)})"


class TsNs(int):
    """Timestamp literal (``2025.12.10D15:10:24.058948000``), ns since
    epoch (reference TIMESTAMP is i64 ns, SURVEY §1.2)."""
    __slots__ = ()

    def __repr__(self):  # pragma: no cover
        return f"TsNs({int(self)})"


class I32(int):
    """Width-tagged int: ``3i`` literal / ``(as 'I32 x)`` (reference i32).
    Construction WRAPS to signed 32 bits — the reference's fixed-width
    arithmetic (tests/lang.c: (sum (as 'I32 (til 100000))) -> 704982704i)."""
    __slots__ = ()

    def __new__(cls, v):
        return super().__new__(cls, ((int(v) + 0x8000_0000) & 0xFFFF_FFFF)
                               - 0x8000_0000)


class I16(int):
    """Width-tagged int: ``3h`` literal / ``(as 'I16 x)`` (reference i16).
    Construction wraps to signed 16 bits (see I32)."""
    __slots__ = ()

    def __new__(cls, v):
        return super().__new__(cls, ((int(v) + 0x8000) & 0xFFFF) - 0x8000)


class U8(int):
    """Width-tagged int: ``0x05`` literal / ``(as 'U8 x)`` (reference u8)."""
    __slots__ = ()


_DATE_RE = re.compile(r"^(\d{4})\.(\d{2})\.(\d{2})$")
_TS_RE = re.compile(
    r"^(\d{4})\.(\d{2})\.(\d{2})D(\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,9}))?$"
)
_TIME_RE = re.compile(r"^(-?)(\d{1,2}):(\d{2})(?::(\d{2})(?:\.(\d{1,3}))?)?$")
_NULL_RE = re.compile(r"^0N[a-z]?$|^0n$")  # kdb typed nulls (0Nl 0Ni 0n …)
_INT_RE = re.compile(r"^-?\d+$")
_I32_RE = re.compile(r"^-?\d+i$")
_I16_RE = re.compile(r"^-?\d+h$")
_U8_RE = re.compile(r"^0x[0-9a-fA-F]+$")
_FLOAT_RE = re.compile(r"^-?(\d+\.\d*|\.\d+)([eE][+-]?\d+)?$|^-?\d+[eE][+-]?\d+$")

_DELIMS = "()[]{}"
_WS = " \t\r\n,"


def tokenize(src: str) -> list[str]:
    toks: list[str] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in _WS:
            i += 1
        elif c == ";":
            while i < n and src[i] != "\n":
                i += 1
        elif c in _DELIMS:
            toks.append(c)
            i += 1
        elif c == "'":
            # char literal 'x' / '\n' / '\001' (docs iterable.md:
            # (take 'a' 2) -> "aa"); otherwise the symbol-quote operator.
            # Char tokens carry a \x01 prefix so _atom can tell a char
            # ATOM from a 1-char string.
            if i + 1 < n and src[i + 1] == "\\":
                j = i + 2
                if j < n and src[j].isdigit():
                    k = j
                    while k < n and k - j < 3 and src[k].isdigit():
                        k += 1
                    ch = chr(int(src[j:k], 8))
                    j = k
                elif j < n:
                    ch = {"n": "\n", "t": "\t", "r": "\r", "0": "\x00",
                          "\\": "\\", "'": "'"}.get(src[j], src[j])
                    j += 1
                else:
                    raise SyntaxError("unterminated char literal")
                if j < n and src[j] == "'":
                    toks.append("\x01" + ch)
                    i = j + 1
                else:
                    raise SyntaxError("unterminated char literal")
            elif i + 2 < n and src[i + 2] == "'" and src[i + 1] not in _DELIMS + _WS:
                toks.append("\x01" + src[i + 1])
                i += 3
            else:
                toks.append(c)
                i += 1
        elif c == '"':
            j = i + 1
            buf = []
            while j < n and src[j] != '"':
                if src[j] == "\\" and j + 1 < n:
                    esc = src[j + 1]
                    buf.append({"n": "\n", "t": "\t", '"': '"', "\\": "\\"}.get(esc, esc))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise SyntaxError("unterminated string literal")
            toks.append('"' + "".join(buf))  # leading quote marks a string token
            i = j + 1
        else:
            # atom: runs until whitespace/delimiter/comment. ``:`` ends an
            # atom only when it terminates a dict key (next char is not a
            # digit — keeps 09:00:00 whole).
            j = i
            while j < n:
                d = src[j]
                if d in _WS or d in _DELIMS or d == ";" or d == '"':
                    break
                if d == ":":
                    # ``:`` ends a keyword token unless this could be a
                    # time literal (digits so far — 09:00:00, -09:30:00);
                    # a dict key like ``a:1`` terminates even before a digit
                    timeish = (src[i].isdigit()
                               or (src[i] == "-" and i + 1 < n
                                   and src[i + 1].isdigit()))
                    if not timeish or not (j + 1 < n and src[j + 1].isdigit()):
                        j += 1  # include the colon: keyword token
                        break
                j += 1
            toks.append(src[i:j])
            i = j
    return toks


def _atom(tok: str):
    """Classify a non-delimiter token."""
    if tok.startswith('"'):
        return tok[1:]
    if tok.startswith("\x01"):
        return Char(tok[1:])
    if tok == "true":
        return True
    if tok == "false":
        return False
    if tok == "null":
        return None  # the untyped null literal (ref tests/lang.c:39)
    if _NULL_RE.match(tok):
        return None  # kdb null (ref core/ops.h null sentinels)
    if _INT_RE.match(tok):
        return int(tok)
    if _I32_RE.match(tok):
        return I32(tok[:-1])
    if _I16_RE.match(tok):
        return I16(tok[:-1])
    if _U8_RE.match(tok):
        return U8(int(tok, 16))
    if _FLOAT_RE.match(tok):
        return float(tok)
    m = _TS_RE.match(tok)
    if m:
        d = _dt.date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
        days = (d - _dt.date(1970, 1, 1)).days
        secs = int(m.group(4)) * 3600 + int(m.group(5)) * 60 + int(m.group(6))
        frac_ns = int((m.group(7) or "0").ljust(9, "0"))
        return TsNs((days * 86400 + secs) * 1_000_000_000 + frac_ns)
    m = _DATE_RE.match(tok)
    if m:
        return _dt.date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
    m = _TIME_RE.match(tok)
    if m:
        h, mi = int(m.group(2)), int(m.group(3))
        s = int(m.group(4) or 0)
        ms = int(m.group(5) or "0")  # .1 == 1 ms (right-aligned, lang.c)
        v = ((h * 60 + mi) * 60 + s) * 1000 + ms
        return TimeMs(-v if m.group(1) else v)
    return Sym(tok)


class _Reader:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        tok = self.peek()
        if tok is None:
            raise SyntaxError("unexpected end of input")
        self.pos += 1
        return tok

    def read_form(self, *, in_vector: bool = False):
        tok = self.next()
        if tok == "(":
            out = []
            while self.peek() != ")":
                if self.peek() is None:
                    raise SyntaxError("unclosed (")
                out.append(self.read_form())
            self.next()
            return out
        if tok == "[":
            out = Vec()
            while self.peek() != "]":
                if self.peek() is None:
                    raise SyntaxError("unclosed [")
                out.append(self.read_form(in_vector=True))
            self.next()
            return out
        if tok == "{":
            pairs = DictLit()
            while self.peek() != "}":
                key_tok = self.next()
                if key_tok is not None and key_tok.startswith('"') \
                        and self.peek() == ":":
                    self.next()  # string key: "apple": value
                    key = key_tok[1:]
                elif key_tok is not None and key_tok.endswith(":") \
                        and not key_tok.startswith('"') \
                        and not key_tok.startswith("\x01"):
                    key = key_tok[:-1]
                else:
                    raise SyntaxError(f"dict key expected, got {key_tok!r}")
                if self.peek() == "}":
                    raise SyntaxError(f"dict key {key_tok!r} has no value")
                pairs.append((key, self.read_form()))
            self.next()
            return pairs
        if tok == "'":
            # bare quote (end of input / before a closing delimiter) is
            # the NULL symbol 0Ns (ref tests/lang.c: "'" -> 0Ns)
            if self.peek() is None or self.peek() in (")", "]", "}"):
                return None
            nxt = self.read_form()
            if isinstance(nxt, Sym):
                return QSym(nxt)
            if isinstance(nxt, (bool, int, float)) and not isinstance(
                    nxt, (TimeMs, TsNs)):
                # numeric symbols ('42, the display form of
                # (as 'symbol 42)) — quote makes them symbol literals
                return QSym(int(nxt) if isinstance(nxt, bool) else nxt)
            return nxt  # other 'literals quote to themselves
        if tok in (")", "]", "}"):
            raise SyntaxError(f"unexpected {tok}")
        if (tok.endswith(":") and len(tok) > 1 and not tok.startswith('"')
                and not tok.startswith("\x01")  # char atoms like ':' are
                # \x01-prefixed tokens, never keywords (IPC ships unparse
                # text, so Char(':') must round-trip)
                and not tok[:-1].isdigit()):
            raise SyntaxError(f"keyword {tok!r} outside a dict")
        v = _atom(tok)
        # vector literals self-quote bare identifiers: [name dept salary]
        if in_vector and isinstance(v, Sym):
            return QSym(v)
        return v


def parse(src: str) -> list:
    """Read a whole program: returns the list of top-level forms."""
    r = _Reader(tokenize(src))
    forms = []
    while r.peek() is not None:
        forms.append(r.read_form())
    return forms


def unparse(ast) -> str:
    """AST -> Rayfall source (inverse of :func:`parse` for this subset);
    used to ship unevaluated expressions over IPC (docs IPC.md list
    messages)."""
    import datetime as _d

    if isinstance(ast, QSym):
        return f"'{ast}"
    if isinstance(ast, Char):
        c = str(ast)
        esc = {"\n": r"\n", "\t": r"\t", "\r": r"\r", "\\": "\\\\", "'": r"\'"}
        if c in esc:
            return f"'{esc[c]}'"
        # delimiters / whitespace / controls can't appear raw in a char
        # literal — octal-escape them (the tokenizer's \NNN form)
        if (c in _DELIMS or c in _WS or not c.isprintable()) and ord(c) < 512:
            return f"'\\{ord(c):03o}'"
        return f"'{c}'"
    if isinstance(ast, Sym):
        return str(ast)
    if isinstance(ast, bool):
        return "true" if ast else "false"
    if isinstance(ast, TimeMs):
        ms = int(ast)
        h, rem = divmod(ms, 3600000)
        m, rem = divmod(rem, 60000)
        s, ms = divmod(rem, 1000)
        return f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}"
    if isinstance(ast, (I32,)):
        return f"{int(ast)}i"
    if isinstance(ast, (I16,)):
        return f"{int(ast)}h"
    if isinstance(ast, (int, float)):
        return repr(ast)
    if isinstance(ast, str):
        return '"' + ast.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(ast, _d.date):
        return f"{ast.year:04d}.{ast.month:02d}.{ast.day:02d}"
    if isinstance(ast, Vec):
        return "[" + " ".join(
            unparse(Sym(e)) if isinstance(e, QSym) else unparse(e) for e in ast
        ) + "]"
    if isinstance(ast, DictLit):
        return "{" + " ".join(f"{k}: {unparse(v)}" for k, v in ast) + "}"
    if isinstance(ast, list):
        return "(" + " ".join(unparse(e) for e in ast) + ")"
    raise ValueError(f"cannot unparse {ast!r}")
