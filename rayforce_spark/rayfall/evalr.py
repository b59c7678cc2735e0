"""Rayfall evaluator: s-expression AST -> Spark DataFrames via the engine's
query verbs.

This is the thin front-end scoped in SURVEY §7 ("no Lisp reader — optional
later"): it maps the reference's surface forms (ref core/eval.c:934-1005
eval/parse, core/query.c:607 ray_select) onto the already-built Spark
operators — it does NOT re-implement evaluation. Two contexts:

* **value context** (top level): names resolve in the environment; verbs
  are driver-side vector builders (values.py) or table/query verbs that
  return DataFrames. ``set`` binds.
* **column context** (inside select/update dicts, where-clauses, join
  aggs): names resolve to columns of the query's ``from:`` table first,
  then to environment scalars as literals — the reference's query-context
  resolution order (ref core/eval.c:159-166). Aggregate verbs compile to
  AggExpr so operators.query.select stages them exactly like the
  reference's FN_AGGR path (ref core/query.c:406).

Scope (deliberate): literals, symbols, vectors, dicts, nested calls, the
query/join/mutation/storage/IPC verbs, plus value-context control
(if/do/try/raise) and lambdas (:class:`Closure`) for the reference's
script idioms. There is NO bytecode VM and lambdas never compile to Spark
plans — per-row/per-group logic on tables is the operators'
applyInPandas surface; Python remains the host language (SURVEY §2.9).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rayforce_spark.functions import aggregates as A
from rayforce_spark.functions import kdb as K
from rayforce_spark.operators import items as I
from rayforce_spark.operators import joins as J
from rayforce_spark.operators import query as Q
from rayforce_spark.rayfall import values as V
from rayforce_spark.rayfall.reader import DictLit, QSym, Sym, TimeMs, Vec, parse


class RayfallError(Exception):
    pass


class _AsyncHandle:
    """``(neg h)`` on an IPC handle: fire-and-forget sends (docs IPC.md)."""

    __slots__ = ("handle",)

    def __init__(self, handle):
        self.handle = handle


class _FileJournal:
    """``(hopen "/path")`` — an append-only EXPRESSION journal
    (ref examples/journal.rfl, core/io.c write/read): ``write`` appends
    one expression per line, ``read`` replays by re-evaluating each.
    Data-scale journaling is streaming/journal.py (row batches +
    Structured Streaming replay); this is the reference's code-journal
    workflow."""

    __slots__ = ("path", "_f")

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "a")

    def append(self, line: str) -> None:
        self._f.write(line.rstrip("\n") + "\n")
        self._f.flush()

    def read_lines(self) -> list[str]:
        self._f.flush()
        with open(self.path) as f:
            return [ln for ln in f.read().splitlines() if ln.strip()]

    def close(self) -> None:
        self._f.close()


class RayfallRaise(RayfallError):
    """``(raise v)`` — caught by ``try`` (ref core/eval.c:909,1007)."""

    def __init__(self, value):
        super().__init__(str(value))
        self.value = value


class Closure:
    """``(fn [params] body…)`` — a VALUE-context lambda over literal
    vectors/scalars (docs data-types/functions.md, examples/fib.rfl).

    Scoping: parameters overlay the defining interpreter's LIVE
    environment for the duration of the call (so ``(set fib (fn [n] …
    (fib …)))`` recursion resolves), then restore — locals don't leak.
    Deliberately NOT the query path: lambdas never compile to Spark plans;
    per-row/per-group logic on tables goes through the operators'
    applyInPandas surface (operators/iterate.py)."""

    __slots__ = ("params", "body", "interp")

    def __init__(self, params, body, interp):
        self.params = params
        self.body = body
        self.interp = interp

    def __call__(self, *args):
        if len(args) != len(self.params):
            raise RayfallError(
                f"lambda expects {len(self.params)} args, got {len(args)}")
        env = self.interp.env
        missing = object()
        # `self` names the executing lambda (ref examples/fib.rfl
        # anonymous recursion)
        saved = {p: env.get(p, missing) for p in (*self.params, "self")}
        env.update(zip(self.params, args))
        env["self"] = self
        try:
            out = None
            for form in self.body:
                out = self.interp.eval(form)
            return out
        finally:
            for p, old in saved.items():
                if old is missing:
                    env.pop(p, None)
                else:
                    env[p] = old


_QUERY_RESERVED = {"from", "where", "by", "take"}

# order verbs usable INSIDE query maps (whole-column semantics, zipped
# back by row position — see Interp._order_verb_col)
_ORDER_COL_VERBS = ("asc", "desc", "iasc", "idesc", "rank")


def _has_order_verbs(ast) -> bool:
    if isinstance(ast, (Vec, DictLit)):
        return False
    if isinstance(ast, list):
        if (ast and isinstance(ast[0], Sym)
                and str(ast[0]) in _ORDER_COL_VERBS):
            return True
        return any(_has_order_verbs(e) for e in ast)
    return False

_AGG_VERBS = {
    "sum": A.sum_,
    "avg": A.avg,
    "min": A.min_,
    "max": A.max_,
    "count": A.count,
    "first": A.first,
    "last": A.last,
    "med": A.med,
    "dev": A.dev,
    "var": A.var,
    "count-distinct": A.count_distinct,
}

_CMP_VERBS = {
    "=": lambda a, b: a == b,
    "==": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    ">": lambda a, b: a > b,
    "<=": lambda a, b: a <= b,
    ">=": lambda a, b: a >= b,
}

_ARITH_VERBS = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
}

_UNARY_COL_VERBS = {
    "floor": F.floor,
    "ceil": F.ceil,
    "round": F.round,
    "abs": F.abs,
    "sqrt": F.sqrt,
    "exp": F.exp,
    "log": F.log,
    "not": lambda c: ~c,
    "neg": K.neg,
}

# value-context verbs usable as the function argument of map-left/map-right
_VALUE_FNS = {
    "+": V.add,
    "-": V.sub,
    "*": V.mul,
    "/": V.div,
    "div": V.fdiv,
    "%": V.mod,
    "as": V.as_value,
    "concat": V.concat,
    "take": V.take,
}


def _lit(v) -> Column:
    if isinstance(v, (TimeMs, V.TsNs)):
        return F.lit(int(v))
    return F.lit(v)


class Interp:
    """One Rayfall interpreter: a SparkSession + a name environment."""

    def __init__(self, spark, env: dict[str, Any] | None = None):
        self.spark = spark
        self.env = dict(env or {})

    # ------------------------------------------------------------------
    # value context
    # ------------------------------------------------------------------

    def eval_str(self, src: str):
        out = None
        for form in parse(src):
            out = self.eval(form)
        return out

    def eval(self, ast):
        if isinstance(ast, QSym):
            return V.SymVal(ast)
        if isinstance(ast, Sym):
            if str(ast) in self.env:
                return self.env[str(ast)]
            raise RayfallError(f"unbound name: {ast}")
        if isinstance(ast, Vec):
            out = [V.SymVal(e) if isinstance(e, QSym) else self.eval(e) if isinstance(e, (list, Sym)) else e for e in ast]
            # the reference's reader types a vector literal as F64 when ANY
            # element is a float (ref tests/lang.c test_lang_query:
            # [0 1 2 3 4 5 6.0] is an all-float Price column) — promote
            # plain ints; exact `type is` checks keep bools and the typed
            # wrappers (I16/I32/U8/TimeMs, all int subclasses) untouched
            if (any(type(e) is float for e in out)
                    and all(type(e) in (int, float) for e in out)):
                out = [float(e) for e in out]
            return out
        if isinstance(ast, DictLit):
            return {k: self.eval(v) for k, v in ast}
        if isinstance(ast, list):
            return self._eval_call(ast)
        return ast  # int/float/str/date/TimeMs literal

    def _eval_call(self, ast: list):
        if not ast:
            raise RayfallError("cannot call ()")
        if isinstance(ast[0], list):
            # ((fn [x] …) arg…): direct lambda application
            fn = self.eval(ast[0])
            if not callable(fn):
                raise RayfallError(f"cannot call {ast[0]!r}")
            return fn(*[self.eval(a) for a in ast[1:]])
        if not isinstance(ast[0], Sym):
            raise RayfallError(f"cannot call {ast!r}")
        head, args = str(ast[0]), ast[1:]

        # lambda / error handling (docs data-types/functions.md) ----------
        if head == "fn":
            if not args or not isinstance(args[0], Vec):
                raise RayfallError("(fn [params] body...)")
            params = [str(p) for p in args[0]]
            return Closure(params, args[1:], self)
        if head == "raise":
            raise RayfallRaise(self.eval(args[0]) if args else None)
        if head == "try":
            try:
                return self.eval(args[0])
            except Exception as e:  # noqa: BLE001 - (try expr handler)
                if len(args) < 2:
                    return None
                handler = self.eval(args[1])
                msg = e.value if isinstance(e, RayfallRaise) else str(e)
                return handler(msg) if callable(handler) else handler

        # a name bound to a lambda calls it
        if head in self.env and isinstance(self.env[head], Closure):
            return self.env[head](*[self.eval(a) for a in args])

        # special forms ---------------------------------------------------
        if head == "set" or head == "let":
            # `let` is the reference's lambda-local binding
            # (examples/parted.rfl); locals live in the same env here —
            # Closure restores its overlay, and script-level lets are sets
            if len(args) != 2 or not isinstance(args[0], Sym):
                raise RayfallError(f"({head} name value)")
            val = self.eval(args[1])
            self.env[str(args[0])] = val
            return val
        if head == "timeit":
            # (timeit expr) -> elapsed ms; DataFrame results materialize
            # through a count so the clock covers execution, not just
            # plan construction (ref core/chrono.c:147)
            import time as _time

            t0 = _time.perf_counter()
            v = self.eval(args[0])
            if isinstance(v, DataFrame):
                v.count()
            return round((_time.perf_counter() - t0) * 1000, 3)
        if head == "select":
            return self._eval_query(args, update=False)
        if head == "update":
            return self._eval_query(args, update=True)
        if head == "table":
            names = [str(s) for s in args[0]]
            cols = self.eval(args[1])
            if not isinstance(cols, list):
                raise RayfallError("(table [names] (list col ...))")
            return V.build_table(self.spark, names, cols)
        if head == "list":
            return [self.eval(a) for a in args]
        if head in ("left-join", "inner-join", "asof-join"):
            keys = self._key_names(args[0])
            left, right = self.eval(args[1]), self.eval(args[2])
            if head in ("left-join", "inner-join"):
                # the reference preserves the LEFT table's row order
                # (live-pinned by ref_diff_tables; a hash join clusters
                # by key) — same staging as asof below
                lt = left.withColumn(
                    "__rf_ord", F.monotonically_increasing_id())
                # overwrite: shared non-key columns take the RIGHT value
                # on matched rows (kdb lj/ij rule, live-pinned by
                # ref_diff_tables). Both verbs probe the reference's
                # key->single-row index (core/index.c:2886,2930), which
                # keeps the FIRST right row per key (live-pinned r8
                # with duplicate right keys; kdb keyed tables do the
                # same).
                if head == "left-join":
                    out = J.left_join(lt, right, keys, overwrite=True,
                                      keep="first")
                else:
                    out = J.inner_join(lt, right, keys, overwrite=True,
                                       dedup=True, keep="first")
                return out.orderBy("__rf_ord").drop("__rf_ord")
            if len(keys) < 2:
                raise RayfallError("asof-join needs at least [key time] columns")
            # keep the left table's row order (see _eval_window_join)
            lt = left.withColumn("__rf_ord", F.monotonically_increasing_id())
            out = J.asof_join(lt, right, keys[:-1], keys[-1],
                              overwrite=True)
            return out.orderBy("__rf_ord").drop("__rf_ord")
        if head in ("window-join", "window-join1"):
            return self._eval_window_join(args, wj=(head == "window-join"))
        if head == "insert":
            target, name = self._mut_target(args[0])
            out = J.insert(target, self._rows_df(target, self.eval(args[1])))
            if name:
                self.env[name] = out  # (insert 'name …) mutates in place
            return out
        if head == "upsert":
            target, name = self._mut_target(args[0])
            n_keys = int(self.eval(args[1]))
            out = J.upsert(target, self._rows_df(target, self.eval(args[2])), n_keys)
            # the reference is an EAGER engine: each upsert materializes
            # a new table. Mirror that here (value context, literal
            # scale) — the r7 in-place formulation stacks a window + two
            # joins + sorts per call, and N chained upserts otherwise
            # nest N such layers into one plan Catalyst re-analyzes
            # quadratically (examples/upsert.rfl's 13-deep chain hung).
            # The lazy operator itself (operators/joins.py upsert) stays
            # checkpoint-free for real pipelines.
            out = out.localCheckpoint()
            if name:
                self.env[name] = out
            return out
        if head == "at":
            obj = self.eval(args[0])
            idx = self.eval(args[1])
            if isinstance(obj, DataFrame):
                if isinstance(idx, int) and not isinstance(idx, bool):
                    # (at table i) -> row i as a dict (ref tests/lang.c:
                    # (at (table …) 0) -> {a:1 b:4}); doc-scale head
                    rows = obj.limit(int(idx) + 1).collect()
                    return dict(rows[int(idx)].asDict()) if len(rows) > idx \
                        else None
                return V.at_collect(obj, str(idx))
            if isinstance(obj, dict):
                # missing key -> null (ref tests/lang.c: (at d 'd) -> 0Nl)
                if not isinstance(idx, int) or isinstance(idx, bool):
                    return obj.get(str(idx))
                return obj.get(idx)
            if isinstance(obj, (list, str)):
                def one(i):
                    i = int(i)
                    # out-of-range -> null ((at [] 0) -> 0Nl)
                    return obj[i] if -len(obj) <= i < len(obj) else None
                if isinstance(idx, list):
                    out = [one(i) for i in idx]
                    # a string gathers back to a string ((at "hello"
                    # [0 4]) -> "ho")
                    if isinstance(obj, str) and not isinstance(obj, V.SymVal):
                        return "".join(v for v in out if v is not None)
                    return out
                return one(idx)
            raise RayfallError("(at table 'col) / (at vec i)")
        if head == "map-left" or head == "map-right":
            fn = self._fn_arg(args[0])
            if fn is None:
                raise RayfallError(f"{head}: unsupported verb {args[0]}")
            a, b = self.eval(args[1]), self.eval(args[2])
            return (V.map_left if head == "map-left" else V.map_right)(fn, a, b)

        # plain value verbs -----------------------------------------------
        if head in _VALUE_FNS and head != "as":
            vals = [self.eval(a) for a in args]
            out = vals[0]
            for v in vals[1:]:
                out = _VALUE_FNS[head](out, v)
            return out
        if head == "as":
            tname = str(self.eval(args[0]))
            val = self.eval(args[1])
            # container casts (ref tests/lang.c: (as 'TABLE {…}) -> table,
            # (as 'DICT table) -> column dict)
            if tname.upper() == "TABLE" and isinstance(val, dict):
                return V.build_table(
                    self.spark, [str(k) for k in val.keys()],
                    list(val.values()))
            if tname.upper() == "DICT" and isinstance(val, DataFrame):
                n = val.count()
                if n > V.MAX_COLLECT:
                    raise RayfallError(
                        f"(as 'DICT table) collects to the driver; table "
                        f"has {n} rows (max {V.MAX_COLLECT})")
                rows = val.collect()
                return {c: [r[c] for r in rows] for c in val.columns}
            return V.as_value(tname, val)
        if head == "til":
            return V.til(self.eval(args[0]))
        if head == "reverse":
            return V.reverse_(self.eval(args[0]))
        if head == "distinct":
            x = self.eval(args[0])
            if isinstance(x, DataFrame):
                return x.distinct()
            return V.distinct_(x)
        if head == "enum":
            # interning is a storage concern Spark's dictionary encoding
            # subsumes (COVERAGE.md §2.7) — evaluate to the symbol values,
            # tagged so (type …) still reports ENUM
            return V.EnumVals(self.eval(args[-1]))
        if head == "count":
            x = self.eval(args[0])
            if isinstance(x, DataFrame):
                return x.count()
            if isinstance(x, V.SymVal):
                return 1  # a symbol is a scalar, not a char vector
            return len(x) if isinstance(x, (list, dict, str)) else 1
        if head == "meta":
            return I.meta(self.eval(args[0]))
        if head == "key":
            x = self.eval(args[0])
            if isinstance(x, DataFrame):
                return I.keys_of(x)
            if isinstance(x, dict):
                return list(x.keys())
            return list(range(len(x)))  # key of a vector = its indices

        # table sorting. The LIVE reference signature is (xasc TABLE keys)
        # with keys a bare quoted symbol or a [vector] — its docs' keys-
        # first spelling `(xasc [price] trades)` is rejected by the binary
        # with 'type (pinned by scripts/ref_diff_tables.py); the keys-
        # first form is kept for back-compat with our earlier API.
        if head in ("xasc", "xdesc"):
            from rayforce_spark.operators import order as O

            if isinstance(args[0], Vec):
                cols = self._sort_keys(args[0])
                df = self.eval(args[1])
            else:
                df = self.eval(args[0])
                cols = self._sort_keys(args[1])
            if not isinstance(df, DataFrame):
                raise RayfallError(f"{head}: expected a table")
            return (O.xasc if head == "xasc" else O.xdesc)(df, cols)

        # vector verbs (docs operations/order.md, iterable.md, math.md) —
        # driver-side literal scale; dataset-scale forms are the operators
        if head in ("asc", "desc", "iasc", "idesc", "rank"):
            return getattr(V, head)(self.eval(args[0]))
        if head == "xrank":
            return V.xrank(self.eval(args[0]), int(self.eval(args[1])))
        if head in ("except", "union", "sect"):
            return {"except": V.except_, "union": V.union_, "sect": V.sect_}[head](
                self.eval(args[0]), self.eval(args[1]))
        if head == "in":
            return V.in_(self.eval(args[0]), self.eval(args[1]))
        if head == "find":
            return V.find_(self.eval(args[0]), self.eval(args[1]))
        if head == "filter":
            coll = self.eval(args[0])
            mask = self.eval(args[1])
            if isinstance(coll, DataFrame):
                # boolean-mask filter on a table keeps the flagged rows in
                # order (ref tests/lang.c filter section) — positional, so
                # doc-scale only; dataset-scale filtering is (select
                # {… where: …})
                from pyspark.sql.window import Window as _W

                keep = [i for i, m in enumerate(mask) if m]
                w = _W.orderBy(F.monotonically_increasing_id())
                return (coll.withColumn("__rn", F.row_number().over(w) - 1)
                        .filter(F.col("__rn").isin(keep)).drop("__rn"))
            return V.filter_(coll, mask)
        if head == "within":
            return V.within_vals(self.eval(args[0]), self.eval(args[1]))
        if head == "split":
            return V.split_vals(self.eval(args[0]), self.eval(args[1]))
        if head in ("bin", "binr"):
            return V.bin_vals(self.eval(args[0]), self.eval(args[1]),
                              right=(head == "binr"))
        if head in ("sum", "avg", "min", "max", "med", "dev", "first", "last"):
            x = self.eval(args[0])
            if isinstance(x, DataFrame) and head in ("first", "last"):
                # (first table) -> the first row as a dict (ref
                # tests/lang.c: (at (first (table …)) 'a) -> scalar)
                rows = x.head(1) if head == "first" else x.tail(1)
                if rows:
                    return dict(rows[0].asDict())
                # (first EMPTY-table) -> a typed-null row, not nothing
                # (live-pinned: {'a': 0Nl, 'b': 0n, ...})
                return {c: None for c in x.columns}
            return V.vagg(head, x)
        if head == "neg":
            x = self.eval(args[0])
            from rayforce_spark import ipc as _ipc

            if isinstance(x, _ipc.Handle):
                return _AsyncHandle(x)  # (write (neg h) …) = async send
            return V.sub(0, x)
        if head == "abs":
            x = self.eval(args[0])
            return [abs(v) for v in x] if isinstance(x, list) else abs(x)

        # control / misc (docs data-types/functions.md; host language is
        # Python — these cover the doc-example shapes, not a VM)
        if head == "if":
            if self.eval(args[0]):
                return self.eval(args[1])
            return self.eval(args[2]) if len(args) > 2 else None
        if head == "do":
            out = None
            for a in args:
                out = self.eval(a)
            return out
        if head == "println" or head == "print":
            vals = [self.eval(a) for a in args]
            # a leading format string substitutes bare % placeholders
            # (ref examples/journal.rfl: (println "RES: %" (+ x y)))
            if vals and isinstance(vals[0], str) and "%" in vals[0]:
                print(self._format(vals[0], vals[1:]))
            else:
                print(*vals)
            return vals[-1] if vals else None
        if head == "xbar":
            # reference order is (xbar x n) — ref tests/lang.c:2411
            return V.xbar_vals(self.eval(args[1]), self.eval(args[0]))
        if head == "enlist":
            # (enlist x …) wraps the args in a vector (ref tests/lang.c:
            # (enlist 1 2 3) -> [1 2 3])
            return [self.eval(a) for a in args]
        if head == "where":
            # boolean mask -> indices of the true slots (ref tests/lang.c:
            # (where [true false true]) -> [0 2])
            mask = self.eval(args[0])
            return [i for i, m in enumerate(mask) if m]
        if head == "raze":
            x = self.eval(args[0])
            if not isinstance(x, list):
                return x  # razing an atom is the atom ((raze 42) -> 42)
            out = []
            for v in x:
                out.extend(v) if isinstance(v, list) else out.append(v)
            return out
        if head == "group":
            x = self.eval(args[0])
            out: dict = {}
            for i, v in enumerate(x):
                out.setdefault(v, []).append(i)
            return out
        if head == "dict":
            ks, vs = self.eval(args[0]), self.eval(args[1])
            return dict(zip(ks, vs))
        if head == "format":
            return self._format(
                str(self.eval(args[0])), [self.eval(a) for a in args[1:]]
            )
        if head in ("=", "<>", "==", "!=", "<", ">", "<=", ">="):
            op = {"==": "=", "!=": "<>"}.get(head, head)
            return V.compare(op, self.eval(args[0]), self.eval(args[1]))
        if head in ("and", "or"):
            vals = [self.eval(a) for a in args]
            out = vals[0]
            for v in vals[1:]:
                out = V.logic(head, out, v)
            return out
        if head == "not":
            x = self.eval(args[0])
            return [not v for v in x] if isinstance(x, list) else not x

        if head == "type":
            return self._type_of(args[0])
        if head == "ser" or head == "de":
            # binary wire format (ref core/serde.c:339 ser_obj / :365
            # de_raw; tests/lang.c:3245, docs serialization.md): ser ->
            # u8 vector of the full header+payload message, de parses it
            # back. Tables cross the wire as TYPE_TABLE column maps
            # (driver-side, MAX_COLLECT-guarded like the value verb) and
            # deserialize back to real tables.
            from . import serde as _serde
            from .reader import U8

            x = self.eval(args[0])
            if head == "ser":
                if isinstance(x, DataFrame):
                    n = x.count()
                    if n > V.MAX_COLLECT:
                        raise RayfallError(
                            f"ser: table has {n} rows (> {V.MAX_COLLECT}); "
                            "serialize a take/sample, or use parquet for "
                            "bulk data")
                    rows = x.collect()
                    x = _serde.Table(
                        (c, [_serde.shape_cell(r[i]) for r in rows])
                        for i, c in enumerate(x.columns))
                return [U8(b) for b in _serde.ser_obj(_serde.shape_cell(x))]
            buf = bytes(x) if not isinstance(x, (bytes, bytearray)) else x
            out = _serde.de_obj(bytes(buf))
            if isinstance(out, _serde.Table):
                return V.build_table(self.spark, list(out.keys()),
                                     list(out.values()))
            return out
        if head == "nil?":
            return self.eval(args[0]) is None
        if head == "resolve":
            return self.env.get(str(self.eval(args[0])))
        if head == "value":
            x = self.eval(args[0])
            if isinstance(x, DataFrame):
                # (value table) -> the column vectors (ref tests/lang.c:
                # (value (table …)) -> (list cols…)); driver-side, guarded
                n = x.count()
                if n > V.MAX_COLLECT:
                    raise RayfallError(
                        f"(value table) collects to the driver; table has "
                        f"{n} rows (max {V.MAX_COLLECT})")
                rows = x.collect()
                return [[r[c] for r in rows] for c in x.columns]
            return list(x.values()) if isinstance(x, dict) else x
        if head in ("floor", "ceil", "round"):
            import math

            def _round_half_away(v):
                # (round -0.5) -> -1.0 (ref tests/lang.c) — not banker's
                return float(math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5))

            f0 = {"floor": math.floor, "ceil": math.ceil,
                  "round": _round_half_away}[head]

            def fn(v):  # nulls pass through ((round 0Nf) -> 0Nf)
                return None if v is None else f0(v)

            x = self.eval(args[0])
            return [fn(v) for v in x] if isinstance(x, list) else fn(x)
        if head == "like":
            import re as _re

            from rayforce_spark.functions.kdb import glob_to_regex

            x = self.eval(args[0])
            pat = _re.compile(glob_to_regex(str(self.eval(args[1]))))
            if isinstance(x, list):
                return [bool(pat.fullmatch(str(v))) for v in x]
            return bool(pat.fullmatch(str(x)))
        if head == "map":
            # (map f xs): lambda or unary verb elementwise; (map f x ys):
            # binary verb with bound left arg (docs iterable.md:
            # (map + 1 [1 2 3]) -> [2 3 4])
            fn = self._fn_arg(args[0])
            if isinstance(fn, Closure) and len(args) == 2:
                x = self.eval(args[1])
                return [fn(v) for v in (list(x) if isinstance(x, str) else x)]
            if len(args) == 3:
                a, b = self.eval(args[1]), self.eval(args[2])
                if isinstance(fn, Closure):
                    aa, bb = V.broadcast2(a, b)
                    return [fn(x, y) for x, y in zip(aa, bb)]
                if fn is None:
                    raise RayfallError(f"map: unsupported verb {args[0]}")
                return V.map_right(fn, a, b)
            if str(args[0]) in ("neg", "abs", "floor", "ceil", "round",
                                "reverse", "count", "first", "last", "sum",
                                "distinct", "raze", "enlist", "where"):
                x = self.eval(args[1])
                return [self._apply_unary(str(args[0]), v) for v in x]
            raise RayfallError(f"map: unsupported verb {args[0]}")
        if head == "pmap":
            # pmap parallelizes the reference's interpreter (ref
            # core/iter.c); every Spark operator is already parallel, and
            # the value context is literal-scale — same semantics as map
            return self._eval_call([Sym("map"), *args])
        if head == "fold":
            fn = self._fn_arg(args[0])
            x = self.eval(args[1])
            if fn is not None:
                if not x:
                    return x  # (fold f []) -> [] (live-probed)
                out = x[0]
                for v in x[1:]:
                    out = fn(out, v)
                return out
            fname = str(args[0])
            if fname in ("min", "max"):
                return V.vagg(fname, x)
            raise RayfallError(f"fold: unsupported verb {fname}")
        if head == "scan":
            # seedless running fold: (scan (fn [a x] (+ a x)) [1 2 3])
            # -> [1 3 6] — live-probed against the built binary (the
            # verb is registered in ref core/env.c but has no lang.c or
            # docs coverage; scripts/ref_diff.py pins the behavior)
            fn = self._fn_arg(args[0])
            x = self.eval(args[1])
            if fn is not None:
                out, acc = [], None
                for i, v in enumerate(x):
                    acc = v if i == 0 else fn(acc, v)
                    out.append(acc)
                return out
            fname = str(args[0])
            if fname in ("min", "max"):
                # the binary's (scan max v) returns the AGGREGATE (its
                # min/max dispatch to the vector form before scan sees
                # them) — mirror that quirk for parity
                return V.vagg(fname, x)
            raise RayfallError(f"scan: unsupported verb {fname}")
        if head in ("fold-right", "scan-right"):
            # (fold-right f init xs) / (scan-right f init xs) — seeded
            # fold/scan (ref core/env.c:242,245; no lang.c/docs coverage).
            # Live-probed (scripts/ref_diff.py notes): the binary's
            # BUILTIN-verb path is a left-iteration fold/scan with the
            # init (scan emits the leading init: (scan-right + 0 [1 2 3])
            # -> [0 1 3 6]); its LAMBDA path misdispatches — the second
            # argument latches to init instead of the element
            # ((scan-right (fn [a x] (+ a x)) 100 [1 2 3]) -> [100 200
            # 300 400]) — and (fold-left + 5 …) crashes the server
            # outright. We implement the coherent semantics for both
            # callables and do not mirror the untested-path bugs
            # (documented divergence, REF_DIFF.md keeps these out of the
            # fuzz grammar).
            fn = self._fn_arg(args[0])
            if fn is None:
                raise RayfallError(f"{head}: unsupported verb {args[0]}")
            acc = self.eval(args[1])
            xs = self.eval(args[2])
            if head == "fold-right":
                for v in xs:
                    acc = fn(acc, v)
                return acc
            if not xs:
                return []  # (scan-right f init []) -> [] (live-probed)
            out = [acc]
            for v in xs:
                acc = fn(acc, v)
                out.append(acc)
            return out
        if head == "alter":
            return self._eval_alter(args)

        # IPC / file-journal verbs (docs documentation/IPC.md; server in
        # rayforce_spark.ipc; expression journal = examples/journal.rfl)
        if head == "hopen":
            addr = str(self.eval(args[0]))
            if ":" in addr and not addr.startswith(("/", ".")):
                from rayforce_spark import ipc as _ipc

                timeout = int(self.eval(args[1])) if len(args) > 1 else None
                return _ipc.hopen(addr, timeout)
            return _FileJournal(addr)
        if head == "hclose":
            self.eval(args[0]).close()
            return None
        if head == "read":
            h = self.eval(args[0])
            if not isinstance(h, _FileJournal):
                raise RayfallError("read expects a file handle")
            out = None
            for line in h.read_lines():
                out = self.eval_str(line)
            return out
        if head == "exit":
            # process lifecycle belongs to the host (SURVEY §2.9) — no-op
            return self.eval(args[0]) if args else 0
        if head == "write":
            from rayforce_spark import ipc as _ipc
            from rayforce_spark.rayfall.reader import unparse

            h = self.eval(args[0])
            # string messages ship as-is; other forms ship UNEVALUATED.
            # A quoted symbol's quote is consumed client-side — the bare
            # name ships and resolves remotely (docs IPC.md "Accessing
            # Server Variables"). A (list 'f args…) payload journals/
            # ships as the call (f args…) — the reference's replayable
            # message form (examples/journal.rfl).
            a = args[1]
            if (isinstance(a, list) and a and a[0] == "list"
                    and len(a) > 1 and isinstance(a[1], QSym)):
                a = [Sym(a[1]), *a[2:]]
            if isinstance(a, QSym):
                msg = str(a)
            elif isinstance(a, str) and not isinstance(a, Sym):
                msg = a
            else:
                msg = unparse(a)
            if isinstance(h, _AsyncHandle):
                h.handle.write_async(msg)
                return None
            if isinstance(h, _FileJournal):
                h.append(msg)
                return None
            if isinstance(h, _ipc.Handle):
                return h.write(msg)
            raise RayfallError("write: first argument must be a handle")

        # storage verbs (docs symbols-and-enums.md; sympath args are
        # subsumed by parquet dictionary encoding — COVERAGE.md §2.1)
        if head == "set-splayed":
            from rayforce_spark.sources.splayed import set_splayed

            path = self.eval(args[0])
            df = self.eval(args[1])
            # the reference's splay preserves row ORDER by file position
            # (order is semantics in this data model); parquet has no
            # cross-file row position, so the Rayfall surface persists
            # an explicit ordinal restored+dropped on read. The raw
            # python API (sources/splayed.py) keeps the unordered
            # scale contract — a 100 TB splay should not sort on read.
            set_splayed(
                df.withColumn("__rf_ord", F.monotonically_increasing_id()),
                str(path))
            return df
        if head == "get-splayed":
            from rayforce_spark.sources.splayed import get_splayed

            out = get_splayed(self.spark, str(self.eval(args[0])))
            if "__rf_ord" in out.columns:
                out = out.orderBy("__rf_ord").drop("__rf_ord")
            return out
        if head == "set-parted":
            from rayforce_spark.sources.parted import set_parted

            root = str(self.eval(args[0]))
            df = self.eval(args[1])

            # the reference's per-partition idiom (docs data-types/
            # table.md:76, core/vary.c:176 — a plain path set): each
            # (set-parted "db/<part>/<name>/" slice) call writes ONE
            # partition directory; (get-parted "db/" 'name) later reads
            # the union. Spark analog: one parquet partition dir
            # db/<name>/date=<part>/ so the partition column stays
            # virtual/directory-derived and prunable.
            import re as _re

            # the partition segment must LOOK like a partition value
            # (date-shaped: >=4 leading digits, optional ./-/_ separated
            # components, e.g. 2024.01.01 or 2024-01) — a plain nested
            # path like "/data/db/trades/" or "/db/01/trades/" must NOT
            # be silently reinterpreted as a partition write (it
            # previously raised, and should keep raising; r8 ADVICE
            # tightened the digit-leading heuristic)
            m = _re.fullmatch(
                r"(.+)/([0-9]{4}(?:[.\-_][0-9]{1,2}){0,2})/([^/]+)/", root)
            if m and not any(
                    t in ("date", "timestamp", "timestamp_ntz")
                    for _, t in df.dtypes):
                base, part, name = m.groups()
                import os as _os

                from rayforce_spark.sources._sidecar import (
                    write_schema_sidecar,
                )

                # persist row order within the partition (same ordinal
                # contract as the set-splayed branch above)
                out_df = df.withColumn(
                    "__rf_ord", F.monotonically_increasing_id())
                part_dir = _os.path.join(base, name, f"date={part}")
                out_df.write.parquet(part_dir, mode="overwrite")
                # zero-row slices still need a readable schema
                write_schema_sidecar(out_df, part_dir)
                return df

            date_cols = [c for c, t in df.dtypes if t in ("date", "timestamp", "timestamp_ntz")]
            if not date_cols:
                raise RayfallError("set-parted: table needs a date/timestamp column")
            set_parted(df, root, part_col=date_cols[0])
            return df
        if head == "get-parted":
            import os as _os

            from rayforce_spark.sources.parted import get_parted

            root = str(self.eval(args[0]))
            name = str(self.eval(args[1])) if len(args) > 1 else ""
            out = get_parted(self.spark, _os.path.join(root, name) if name else root)
            if "__rf_ord" in out.columns:
                # partitions in dir order, written row order within each
                # (the reference's get-parted concat order)
                keys = (["date", "__rf_ord"] if "date" in out.columns
                        else ["__rf_ord"])
                out = out.orderBy(*keys).drop("__rf_ord")
            return out
        if head == "read-csv":
            sep = str(self.eval(args[2])) if len(args) > 2 else ","
            return self._read_csv(self.eval(args[0]), str(self.eval(args[1])), sep)
        if head == "write-csv":
            # (write-csv path t [sep]) — path first, per the reference
            # (docs data-types/table.md:98)
            from rayforce_spark.sources.csv import write_csv

            path = str(self.eval(args[0]))
            df = self.eval(args[1])
            sep = str(self.eval(args[2])) if len(args) > 2 else ","
            write_csv(df, path, sep=sep)
            return df
        if head == "show":
            v = self.eval(args[0])
            if isinstance(v, DataFrame):
                v.show()
            else:
                print(v)
            return v
        if head == "apply":
            # (apply f xs ys …): f over corresponding elements
            # (docs iterable.md: (apply + [1 2 3] [4 5 6]) -> [5 7 9])
            fn = self._fn_arg(args[0])
            vals = [self.eval(a) for a in args[1:]]
            if isinstance(fn, Closure):
                elems = [V._elems(v) for v in vals]
                n = max((len(e) for e in elems if e is not None), default=1)
                return [
                    fn(*[(e[i] if e is not None else v)
                         for e, v in zip(elems, vals)])
                    for i in range(n)
                ]
            if fn is None:
                raise RayfallError(f"apply: unsupported verb {args[0]}")
            out = vals[0]
            for v in vals[1:]:
                out = fn(out, v)
            return out
        if head == "rand":
            # (rand n max) — random, so seeded per-interpreter for
            # reproducible scripts (the reference draws a true RNG)
            n, hi = int(self.eval(args[0])), int(self.eval(args[1]))
            return [self._rng.randrange(hi) for _ in range(n)]
        if head == "guid":
            import uuid

            n = int(self.eval(args[0])) if args else 1
            return [V.GuidVal(str(uuid.UUID(int=self._rng.getrandbits(128),
                                            version=4)))
                    for _ in range(n)]
        if head in ("date", "time", "timestamp"):
            import datetime as dt

            now = dt.datetime.now(dt.timezone.utc if args and str(self.eval(args[0])) == "global" else None)
            if head == "date":
                return now.date()
            if head == "time":
                ms = ((now.hour * 60 + now.minute) * 60 + now.second) * 1000
                return TimeMs(ms + now.microsecond // 1000)
            epoch = now.timestamp()
            from rayforce_spark.rayfall.reader import TsNs

            return TsNs(int(epoch * 1e9))

        raise RayfallError(f"unknown verb: {head}")

    @property
    def _rng(self):
        import random

        if not hasattr(self, "_rng_inst"):
            self._rng_inst = random.Random(42)
        return self._rng_inst

    def _read_csv(self, types: list, path: str, sep: str):
        """(read-csv [I64 SYMBOL F64] path [sep]) — names come from the
        header row (ref core/io.c csv loader), types from the vector."""
        from rayforce_spark.sources.csv import read_csv

        header = self.spark.read.option("sep", sep).option("header", True).csv(path)
        return read_csv(self.spark, path, names=header.columns,
                        types=[str(t) for t in types], sep=sep)

    # ------------------------------------------------------------------
    # query forms
    # ------------------------------------------------------------------

    def _eval_query(self, args, *, update: bool):
        verb = "update" if update else "select"
        if len(args) != 1 or not isinstance(args[0], DictLit):
            raise RayfallError(f"({verb} {{...}}) takes one dict")
        clauses = dict(args[0])
        out_names = [k for k, _ in args[0] if k not in _QUERY_RESERVED]
        if "from" not in clauses:
            raise RayfallError(f"{verb}: from: is required")
        mut_name = None
        if isinstance(clauses["from"], QSym):
            # quoted-name from: reads the binding; update rebinds it
            # in place (docs queries/update.md "Modifies table directly")
            df, mut_name = self._mut_target(clauses["from"])
        else:
            df = self.eval(clauses["from"])
        if not isinstance(df, DataFrame):
            raise RayfallError(f"{verb}: from: must be a table")
        # -- order-verb staging + row-order preservation --------------
        # asc/desc/iasc/idesc/rank inside query maps operate on the WHOLE
        # column vector and zip back by position (pinned live by
        # ref_diff_tables: (select {x: (asc b) i: (iasc b)}),
        # (+ (asc b) 1), (update {r: (rank b)})). They compile to
        # window expressions over a staged row-position column. A grouped
        # update must also RETURN rows in the original order (the
        # reference broadcasts the aggregate in place; our window rewrite
        # clusters rows by group) — the same staging restores it.
        order_maps = [n for n in out_names if _has_order_verbs(clauses[n])]
        where_order = "where" in clauses and _has_order_verbs(clauses["where"])
        has_by = clauses.get("by") is not None
        if (order_maps or where_order) and has_by:
            raise RayfallError(
                "asc/desc/iasc/idesc/rank under by: is not supported")
        if update and order_maps and "where" in clauses:
            raise RayfallError(
                "order verbs with where: in update are not supported")
        staged = bool(order_maps or where_order) or (update and has_by)
        if staged:
            df = df.withColumn("__rfmono", F.monotonically_increasing_id())
        where = None
        if "where" in clauses:
            w_ast = clauses["where"]
            if where_order:
                df = self._with_pos(df)
                df, (w_ast,) = self._stage_order_verbs(df, [w_ast])
            where = self.compile_col(w_ast, df)
            if isinstance(where, A.AggExpr):
                raise RayfallError("where: must be a row predicate, not an aggregate")
        by = self._compile_by(clauses.get("by"), df)
        if by is not None and not update:
            # group keys lead the result exactly once in the reference
            # (docs queries/select.md "Multiple Column Grouping" lists the
            # keys in both positions; the output carries them once)
            key_names = (
                [by] if isinstance(by, str)
                else list(by.keys()) if isinstance(by, dict) else list(by)
            )
            kept = [n for n in out_names if n not in key_names]
            if out_names and not kept:
                # every requested column is a group key: distinct keys,
                # in first-appearance order (live-pinned ref semantics)
                out = df.filter(where) if where is not None else df
                out = out.withColumn(
                    "__rford", F.monotonically_increasing_id())
                keysel = ([c.alias(n) for n, c in by.items()]
                          if isinstance(by, dict) else key_names)
                out = (out.groupBy(*keysel)
                       .agg(F.min("__rford").alias("__rford"))
                       .orderBy("__rford").drop("__rford"))
                take_v = (self.eval(clauses["take"])
                          if "take" in clauses else None)
                return self._apply_take(out, take_v)
            out_names = kept
        map_asts = [clauses[n] for n in out_names]
        if order_maps:
            # ref pipeline is from -> where -> maps: the order verbs see
            # the FILTERED vectors, so consume the filter first and
            # re-stage positions over the surviving rows
            if where is not None:
                df = df.filter(where)
                where = None
            df = self._with_pos(df)
            df, map_asts = self._stage_order_verbs(df, map_asts)
        cols = {n: self.compile_col(a, df)
                for n, a in zip(out_names, map_asts)}
        if update:
            if "take" in clauses:
                raise RayfallError("update has no take:")
            # a WHERE-update writes into the existing typed column, so the
            # result casts back to the column's dtype; an unconditional
            # update REPLACES the column, promoting its type (ref
            # tests/lang.c update section: (* val 1.5) where… -> i64,
            # (* val 1.5) without where -> f64)
            if where is not None and by is None:
                orig = dict(df.dtypes)
                cols = {n: (c.cast(orig[n])
                            if n in orig and isinstance(c, Column) else c)
                        for n, c in cols.items()}
            out = Q.update(df, cols, where=where, by=by)
            if staged:
                out = self._unstage(out)
            if mut_name:
                self.env[mut_name] = out
            return out
        take = self.eval(clauses["take"]) if "take" in clauses else None
        if staged:
            if any(isinstance(c, A.AggExpr) for c in cols.values()):
                # flat aggregates over staged columns: one row, no
                # order to preserve — but take: keeps cyclic semantics
                out = Q.select(df, cols or None, where=where)
                return self._apply_take(out, take)
            # a where: that only stages order verbs (none in the maps)
            # is consumed HERE — the order_maps block above didn't run
            if where is not None:
                df = df.filter(where)
            if cols:
                sel = [self._plain(c).alias(n) for n, c in cols.items()]
            else:
                # map-less select: all original (non-staged) columns
                sel = [F.col(c) for c in df.columns
                       if not c.startswith("__rf")]
            out = (df.select(*sel, F.col("__rfmono"))
                   .orderBy("__rfmono").drop("__rfmono"))
            return self._apply_take(out, take)
        if cols and by is None:
            # constant-map semantics (live-pinned by ref_diff_tables):
            # a map with NO column references is a length-1 vector — an
            # all-constant select returns ONE row (even on an empty
            # table), and constants zip with aggregates as single cells
            aggs = {n: c for n, c in cols.items()
                    if isinstance(c, A.AggExpr)}
            consts = [n for n in out_names if n not in aggs
                      and not self._uses_columns(clauses[n], df)]
            if len(consts) == len(cols):
                one = self.spark.range(1).select(
                    *[self._plain(cols[n]).alias(n) for n in out_names])
                return self._apply_take(one, take)
            if aggs and len(aggs) + len(consts) == len(cols):
                res = Q.select(df, aggs, where=where)
                for n in consts:
                    res = res.withColumn(n, self._plain(cols[n]))
                return self._apply_take(res.select(*out_names), take)
        if isinstance(take, int) and take > 0:
            out = Q.select(df, cols or None, where=where, by=by,
                           appearance_order=by is not None)
            return Q.take_cyclic(out, take)
        return Q.select(df, cols or None, where=where, by=by, take=take,
                        appearance_order=by is not None)

    # -- order-verb staging helpers ------------------------------------

    def _with_pos(self, df: DataFrame) -> DataFrame:
        """Materialize a contiguous 1-based row-position column over the
        staged __rfmono order (window results can't nest, so asc/iasc
        need the position as a REAL column before their own window)."""
        from pyspark.sql.window import Window as _W

        if "__rfpos" in df.columns:
            df = df.drop("__rfpos")
        return df.withColumn(
            "__rfpos", F.row_number().over(_W.orderBy("__rfmono")))

    def _stage_order_verbs(self, df: DataFrame, asts: list):
        """Bottom-up rewrite: each (asc|desc|iasc|idesc|rank inner)
        subtree is materialized as a window column __rfovN and replaced
        by that name, so arbitrary composition ((+ (asc b) 1),
        (sum (asc b)), nested verbs) compiles through the normal paths.
        Returns (staged df, rewritten asts)."""
        counter = [sum(1 for c in df.columns if c.startswith("__rfov"))]

        def rewrite(a):
            nonlocal df
            if isinstance(a, (Vec, DictLit)):
                return a
            if (isinstance(a, list) and a and isinstance(a[0], Sym)
                    and str(a[0]) in _ORDER_COL_VERBS and len(a) == 2):
                inner = rewrite(a[1])
                x = self._plain(self.compile_col(inner, df))
                is_float = df.select(x).schema[0].dataType.simpleString() in (
                    "double", "float")
                name = f"__rfov{counter[0]}"
                counter[0] += 1
                df = df.withColumn(
                    name, self._order_verb_col(str(a[0]), x, is_float))
                return Sym(name)
            if isinstance(a, list):
                return [rewrite(e) for e in a]
            return a

        new = [rewrite(a) for a in asts]
        return df, new

    @staticmethod
    def _order_verb_col(head: str, x: Column, is_float: bool = False) -> Column:
        """One order verb as a window Column (these are total-order ops —
        a global window by construction; Rayfall-surface scale, same
        contract as the MAX_COLLECT-guarded literal paths). Semantics
        pinned live against the reference by scripts/ref_diff_tables.py:
        rank is row-aligned ((update {r: (rank b)}) -> [2 0 1 3] for
        [3.0 1.0 2.0 5.0]); asc/desc/iasc/idesc zip by row position."""
        from pyspark.sql.window import Window as _W

        mono = F.col("__rfmono")
        pos = F.col("__rfpos")
        if head == "rank":
            # stable ties via the original position; nulls rank LARGEST
            # (live-pinned r8: (rank [null 7 8]) -> [2 0 1])
            return F.row_number().over(
                _W.orderBy(x.asc_nulls_last(), mono)) - 1
        whole = (_W.orderBy(mono)
                 .rowsBetween(_W.unboundedPreceding, _W.unboundedFollowing))
        # every collect goes through a struct with an explicit
        # leading is-null flag: collect_list of a BARE column silently
        # DROPS nulls (misaligning every row), and the flag pins the
        # reference's null order — null sorts as LARGEST (asc last,
        # desc/idesc first; live-pinned r8 via left-join backfill:
        # (asc [null 7 8]) -> [7 8 null], (desc …) -> [null 8 7],
        # (iasc …) -> [1 2 0], (idesc …) -> [0 2 1])
        nflag = x.isNull().alias("n")
        # struct-field comparison NORMALIZES -0.0 == 0.0 (unlike
        # sort_array over a bare double array, which uses
        # Double.compare bit order) — recover values._ord_key parity
        # with an explicit zero-sign field: only -0.0 casts to a
        # "-"-prefixed string among x == 0.0 values (1/x would be the
        # classic detector but ANSI mode rejects the division)
        zkey = (F.when(x == 0.0,
                       F.when(x.cast("string").startswith("-"), F.lit(-1))
                       .otherwise(F.lit(1)))
                .otherwise(F.lit(0)) if is_float else F.lit(0)).alias("z")
        if head in ("asc", "desc"):
            arr = F.sort_array(
                F.collect_list(
                    F.struct(nflag, x.alias("v"), zkey)).over(whole),
                asc=(head == "asc"))
            return F.element_at(arr, pos)["v"]
        if head == "iasc":
            pairs = F.sort_array(
                F.collect_list(
                    F.struct(nflag, x.alias("v"), zkey,
                             (pos - 1).alias("p"))).over(whole))
            return F.element_at(pairs, pos)["p"]
        # idesc: descending by value, ties in arrival order (stable,
        # values.idesc parity). Negating the VALUE breaks strings and
        # NaN ordering, so sort the struct descending and negate the
        # bounded integer POSITION instead: ties compare -p descending
        # == p ascending.
        pairs = F.sort_array(
            F.collect_list(
                F.struct(nflag, x.alias("v"), zkey,
                         (-(pos - 1)).alias("p"))).over(whole),
            asc=False)
        return -F.element_at(pairs, pos)["p"]

    @staticmethod
    def _unstage(df: DataFrame) -> DataFrame:
        """Restore original row order and drop every staged column."""
        out = df.orderBy("__rfmono")
        return out.drop(*[c for c in out.columns if c.startswith("__rf")])

    def _apply_take(self, df: DataFrame, take):
        """take: with the reference's cyclic positive-n semantics."""
        if take is None:
            return df
        if isinstance(take, int) and take > 0:
            return Q.take_cyclic(df, take)
        return Q.select(df, None, take=take)

    def _compile_by(self, ast, df):
        if ast is None:
            return None
        if isinstance(ast, (Sym, QSym)):
            return str(ast)
        if isinstance(ast, Vec):
            return [str(s) for s in ast]
        if isinstance(ast, DictLit):
            return {k: self.compile_col(v, df) for k, v in ast}
        raise RayfallError(f"unsupported by: {ast!r}")

    @staticmethod
    def _format(fmt: str, vals: list) -> str:
        """Bare-% substitution (ref core/format.c; kdb.format_ is the
        column twin)."""
        parts = fmt.split("%")
        out = parts[0]
        for i, p in enumerate(parts[1:]):
            out += (str(vals[i]) if i < len(vals) else "%") + p
        return out

    def _fn_arg(self, ast):
        """Function argument of map/fold/apply: a ``(fn …)`` form, a name
        bound to a lambda, or a _VALUE_FNS verb name; None if neither."""
        if isinstance(ast, list):
            v = self.eval(ast)
            return v if isinstance(v, Closure) else None
        if isinstance(ast, Sym):
            bound = self.env.get(str(ast))
            if isinstance(bound, Closure):
                return bound
            return _VALUE_FNS.get(str(ast))
        return None

    def _mut_target(self, ast):
        """Mutation target: a table expression, or a quoted name
        ``(insert 'employees …)`` that rebinds in place
        (docs queries/insert.md "In-Place Modification")."""
        if isinstance(ast, QSym):
            name = str(ast)
            obj = self.env.get(name)
            if not isinstance(obj, DataFrame):
                raise RayfallError(f"{name} is not a bound table")
            return obj, name
        return self.eval(ast), None

    def _key_names(self, ast) -> list[str]:
        if not isinstance(ast, Vec):
            raise RayfallError("join columns must be a [vector] of symbols")
        return [str(s) for s in ast]

    def _sort_keys(self, ast) -> list[str]:
        """xasc/xdesc key spec: a [vector] of symbols or one bare/quoted
        symbol (the live reference accepts both: (xasc t 'b) and
        (xasc t [b]))."""
        if isinstance(ast, Vec):
            return [str(s) for s in ast]
        if isinstance(ast, (Sym, QSym)):
            return [str(ast)]
        raise RayfallError("sort keys must be a symbol or [vector] of symbols")

    def _rows_df(self, target: DataFrame, data) -> DataFrame:
        """insert/upsert payload -> DataFrame in the target's schema
        (docs queries/insert.md: list / dict / table payloads)."""
        if isinstance(data, DataFrame):
            # align by name; absent columns insert null (ref
            # examples/update.rfl upserts a 3-column table into 4)
            return data.select(*[
                (F.col(c) if c in data.columns else F.lit(None))
                .cast(target.schema[c].dataType).alias(c)
                for c in target.columns
            ])
        names = list(target.columns)
        if isinstance(data, dict):
            # dict payloads match by NAME in any order; absent columns
            # insert null (ref examples/insert.rfl tests 6-10)
            cols = [data.get(n) for n in names]
        elif isinstance(data, list):
            if all(isinstance(c, list) for c in data):
                cols = data  # list of column vectors
            else:
                cols = [[v] for v in data]  # one row of scalars
        else:
            raise RayfallError(f"cannot insert {type(data).__name__}")
        df = V.build_table(self.spark, names, cols)
        return df.select(
            *[F.col(c).cast(target.schema[c].dataType) for c in names]
        )

    def _eval_window_join(self, args, *, wj: bool):
        if len(args) != 5 or not isinstance(args[4], DictLit):
            raise RayfallError(
                "(window-join [cols] intervals left right {aggs})"
            )
        keys = self._key_names(args[0])
        if len(keys) < 2:
            raise RayfallError("window-join needs at least [key time] columns")
        left, right = self.eval(args[2]), self.eval(args[3])
        aggs = {}
        for name, e in args[4]:
            c = self.compile_col(e, right)
            if isinstance(c, A.AggExpr):
                aggs[name] = c
            elif isinstance(e, Sym):
                # raw column: per-window collect (the reference's
                # MAPGROUP column, ref tests/lang.c:4305)
                aggs[name] = A.collect(str(e))
            else:
                raise RayfallError(
                    f"window-join agg {name!r} must be an aggregate verb or column"
                )
        join = J.window_join_wj if wj else (
            lambda *a, **kw: J.window_join(*a, closed=True, **kw)
        )

        # offset idiom: (map-left + [lo hi] (at LEFT 'time)) — constant
        # offsets around the left time; never collects, keeps the
        # decomposable fast plan available
        iv = args[1]
        if (
            isinstance(iv, list) and len(iv) == 4
            and iv[0] == "map-left" and iv[1] == "+"
            and isinstance(iv[2], Vec) and len(iv[2]) == 2
            and all(isinstance(x, int) and not isinstance(x, bool) for x in iv[2])
            and isinstance(iv[3], list) and len(iv[3]) == 3 and iv[3][0] == "at"
            and str(iv[3][2]) == keys[-1]
            and self.eval(iv[3][1]) is left
        ):
            lo, hi = int(iv[2][0]), int(iv[2][1])
            # the reference's result keeps the LEFT table's row order
            # (tests/lang.c window-join: minBid comes back per trade row);
            # the front-end honors it with an order column + sort — a
            # doc-scale cost; dataset-scale callers use operators.joins
            # directly and order explicitly
            lt = left.withColumn("__rf_ord", F.monotonically_increasing_id())
            out = join(lt, right, keys[:-1], keys[-1], lo, hi, aggs)
            return out.orderBy("__rf_ord").drop("__rf_ord")

        # general form: per-row interval vectors, pasted positionally
        # (doc-scale; the offset idiom above is the dataset-scale path)
        bounds = self.eval(iv)
        if not (isinstance(bounds, list) and len(bounds) == 2):
            raise RayfallError("intervals must be (list lo-vec hi-vec)")
        bt = V.build_table(self.spark, ["__rf_wlo", "__rf_whi"], bounds)
        lt = I.hconcat(left, bt).withColumn(
            "__rf_ord", F.monotonically_increasing_id())
        out = join(
            lt, right, keys[:-1], keys[-1],
            F.col("__rf_wlo"), F.col("__rf_whi"), aggs,
        )
        return out.orderBy("__rf_ord").drop("__rf_wlo", "__rf_whi", "__rf_ord")

    def _apply_unary(self, name: str, v):
        """Apply a unary VERB to an already-evaluated value (map over
        verbs: (map count (list …)) counts each element)."""
        missing = object()
        old = self.env.get("__mapv", missing)
        self.env["__mapv"] = v
        try:
            return self._eval_call([Sym(name), Sym("__mapv")])
        finally:
            if old is missing:
                self.env.pop("__mapv", None)
            else:
                self.env["__mapv"] = old

    def _type_of(self, ast) -> str:
        """(type x): the reference's type-name verb — scalar names
        lowercase, vector names uppercase (docs data-types/*.md:
        (type true) -> b8, (type [true]) -> B8). Literal ASTs dispatch
        statically; everything else evaluates and inspects."""
        from rayforce_spark.rayfall.reader import Char as _Char

        scalar_name = V.scalar_type_name

        if isinstance(ast, QSym):
            return "symbol"
        if isinstance(ast, _Char):
            return "c8"
        if isinstance(ast, str) and not isinstance(ast, (Sym, QSym)):
            return "C8"  # strings are char vectors
        if isinstance(ast, Vec):
            vals = [str(e) if isinstance(e, QSym) else e for e in ast]
            return scalar_name(vals[0]).upper() if vals else "LIST"
        if isinstance(ast, (bool, int, float, _dt.date)):
            return scalar_name(ast)
        v = self.eval(ast)
        if isinstance(v, DataFrame):
            return "TABLE"  # containers are uppercase (ref tests/lang.c)
        if isinstance(v, dict):
            return "DICT"
        if isinstance(v, V.EnumVals):
            return "ENUM"
        if isinstance(v, list):
            el = getattr(v, "eltype", None)
            if el:
                return el
            return scalar_name(v[0]).upper() if v else "LIST"
        if isinstance(v, (V.SymVal, V.GuidVal, _Char)):
            return scalar_name(v)
        if isinstance(v, str):
            return "C8"
        return scalar_name(v)

    def _eval_alter(self, args):
        """(alter obj fn [idx-or-col] val) — docs queries/alter.md: apply
        a binary verb at an index (vectors), to a column (tables), or to
        every element; (alter 'name …) mutates the binding in place."""
        in_place = False
        target_name = None
        a0 = args[0]
        if isinstance(a0, QSym):
            target_name = str(a0)
            obj = self.env.get(target_name)
            if obj is None:
                raise RayfallError(f"alter: unbound name {target_name}")
            in_place = True
        else:
            obj = self.eval(a0)
        fname = str(args[1])
        fn = _VALUE_FNS.get(fname)
        rest = [self.eval(a) for a in args[2:]]

        if isinstance(obj, DataFrame):
            if len(rest) != 2:
                raise RayfallError("(alter table fn 'col val)")
            col, val = str(rest[0]), rest[1]
            ops = {"+": lambda c: c + val, "-": lambda c: c - val,
                   "*": lambda c: c * val,
                   "/": lambda c: F.try_divide(c, F.lit(val))}
            if fname not in ops:
                raise RayfallError(f"alter: unsupported verb {fname} on tables")
            out = obj.withColumn(col, ops[fname](F.col(col)))
        elif isinstance(obj, list):
            out = list(obj)

            def _chk(i: int) -> int:
                # the reference rejects negative / out-of-range indices
                # with 'index (ref tests/lang.c:5236); python's wrapping
                # negative indexing would silently hit the tail instead
                # (live-fuzzed divergence, r8)
                i = int(i)
                if i < 0 or i >= len(out):
                    raise RayfallError(f"alter: index {i} out of range")
                return i

            if fname == "set":
                # replace at index/indices (ref examples/update.rfl)
                idx, val = rest
                if isinstance(idx, list):
                    vals = val if isinstance(val, list) else [val] * len(idx)
                    for i, v in zip(idx, vals):
                        out[_chk(i)] = v
                else:
                    out[_chk(idx)] = val
            elif fname == "concat":
                out = V.concat(out, rest[0])
            elif fname == "remove":
                idx = rest[0]
                drop = {_chk(i) for i in (idx if isinstance(idx, list) else [idx])}
                out = [v for i, v in enumerate(out) if i not in drop]
            elif fn is not None and len(rest) == 2:
                idx, val = _chk(rest[0]), rest[1]
                out[idx] = fn(out[idx], val)
            elif fn is not None and len(rest) == 1:
                out = fn(out, rest[0])
            else:
                raise RayfallError(f"alter: unsupported verb {fname}")
        else:
            raise RayfallError("alter expects a vector or table")
        if in_place:
            self.env[target_name] = out
        return out

    # ------------------------------------------------------------------
    # column context
    # ------------------------------------------------------------------

    def compile_col(self, ast, df: DataFrame):
        """AST -> Column (or AggExpr for aggregate verbs). Names resolve
        to ``df`` columns first, then environment scalars as literals
        (the reference's query-context order, ref core/eval.c:159-166)."""
        if isinstance(ast, QSym):
            return F.lit(str(ast))
        if isinstance(ast, Sym):
            name = str(ast)
            if name in df.columns:
                return F.col(name)
            if name in self.env:
                v = self.env[name]
                if isinstance(v, Column):
                    return v  # a column-lambda parameter binding
                if isinstance(v, (DataFrame, list, dict)):
                    raise RayfallError(f"{name} is not a column or scalar")
                return _lit(v)
            raise RayfallError(f"unknown column: {name}")
        if isinstance(ast, (int, float, str, bool, _dt.date)):
            return _lit(ast)
        if isinstance(ast, Vec):
            return [str(e) if isinstance(e, QSym) else e for e in ast]
        if isinstance(ast, list):
            return self._compile_call(ast, df)
        raise RayfallError(f"cannot compile {ast!r} to a column")

    def _compile_call(self, ast: list, df: DataFrame):
        if ast and isinstance(ast[0], list) and ast[0] and ast[0][0] == "fn":
            # ((fn [x] body) col…) in column context: pure expression
            # SUBSTITUTION — params bind to the compiled argument Columns
            # and the body compiles under them (ref examples/update.rfl:
            # (update {price: ((fn [x] (+ x 11)) price) …})). No UDF:
            # the lambda inlines into the Catalyst expression.
            params = [str(p) for p in ast[0][1]]
            body = ast[0][2:]
            cols = [self.compile_col(a, df) for a in ast[1:]]
            if len(cols) != len(params):
                raise RayfallError(
                    f"lambda expects {len(params)} args, got {len(cols)}")
            missing = object()
            saved = {p: self.env.get(p, missing) for p in params}
            self.env.update(zip(params, cols))
            try:
                out = None
                for form in body:
                    out = self.compile_col(form, df)
                return out
            finally:
                for p, old in saved.items():
                    if old is missing:
                        self.env.pop(p, None)
                    else:
                        self.env[p] = old
        head, args = str(ast[0]), ast[1:]

        if head in _AGG_VERBS:
            if head == "count" and not args:
                return A.count()
            if isinstance(args[0], Sym) and str(args[0]) in df.columns:
                # pass the name through: A._make records arg_name, which
                # the window-join/grouped-update rebuild paths require
                return _AGG_VERBS[head](str(args[0]))
            inner = self.compile_col(args[0], df)
            if isinstance(inner, A.AggExpr):
                raise RayfallError(f"nested aggregate under {head}")
            return _AGG_VERBS[head](inner)

        if head in _ARITH_VERBS:
            op = _ARITH_VERBS[head]
            out = self.compile_col(args[0], df)
            for a in args[1:]:
                out = self._arith(op, out, self.compile_col(a, df))
            return out
        if head == "/":
            # reference `/` always floors; the result carries the left
            # operand's type (ref tests/lang.c math, docs operations/
            # math.md: "integer division"). `div` is true division.
            out = self.compile_col(args[0], df)
            left_inty = self._is_inty(args[0], df)
            for a in args[1:]:
                rhs = self.compile_col(a, df)
                if left_inty and self._is_inty(a, df):
                    out = self._arith(K.ediv, out, rhs)
                else:
                    cast = "long" if left_inty else "double"
                    # try_divide: /0 -> null (ref core/ops.h:169; Spark
                    # 4's default ANSI mode would throw — found live by
                    # ref_diff_tables)
                    out = self._arith(
                        lambda x, y: F.floor(F.try_divide(x, y)).cast(cast),
                        out, rhs)
            return out
        if head == "div":
            out = self.compile_col(args[0], df)
            for a in args[1:]:
                out = self._arith(F.try_divide, out,
                                  self.compile_col(a, df))
            return out
        if head == "%":
            # runtime-typed like `/`: integer operands -> exact i64
            # floor-mod (emod); any float operand -> MODF64 (emod_f,
            # double) — pinned live by ref_diff_tables: (% -1 2.5) = 1.5,
            # (% 7 -2) = -1
            fn = (K.emod if all(self._is_inty(a, df) for a in args[:2])
                  else K.emod_f)
            return self._arith(
                fn, self.compile_col(args[0], df), self.compile_col(args[1], df)
            )

        if head in _CMP_VERBS:
            return _CMP_VERBS[head](
                self._plain(self.compile_col(args[0], df)),
                self._plain(self.compile_col(args[1], df)),
            )
        if head in ("and", "or"):
            cols = [self._plain(self.compile_col(a, df)) for a in args]
            out = cols[0]
            for c in cols[1:]:
                out = (out & c) if head == "and" else (out | c)
            return out
        if head in _UNARY_COL_VERBS:
            return _UNARY_COL_VERBS[head](self._plain(self.compile_col(args[0], df)))

        if head == "at":
            # (at table 'col): explicit column access for names shadowed
            # by verbs (docs queries/select.md "Column Name Conflicts")
            return F.col(str(self.eval(args[1])))
        if head == "xbar":
            # reference order is (xbar x n) — ref tests/lang.c:2411.
            # BOTH operands vectorize (pinned live: (xbar 3 h) buckets
            # the scalar 3 by per-row widths h); when n references a
            # column, spell xbar = x - (x mod n) so the emod pair keeps
            # n=0 -> null and the i64-exact decimal path
            x = self._plain(self.compile_col(args[0], df))
            if self._uses_columns(args[1], df):
                n = self._plain(self.compile_col(args[1], df))
                if all(self._is_inty(a, df) for a in args[:2]):
                    return K.xbar_ic(n, x)  # raw XBARI64, trunc division
                return K.xbar(n, x)  # XBARF64 floor form
            nval = self.eval(args[1])
            if type(nval) is int and self._is_inty(args[0], df):
                # exact XBARI64 for integer scalar widths too (negative
                # widths truncate, they don't floor)
                return K.xbar_ic(F.lit(nval), x)
            return K.xbar(nval, x)
        if head == "like":
            return K.like(self._plain(self.compile_col(args[0], df)), self.eval(args[1]))
        if head == "within":
            bounds = self.eval(args[1])
            return K.within(
                self._plain(self.compile_col(args[0], df)), _lit(bounds[0]), _lit(bounds[1])
            )
        if head == "in":
            vals = self.eval(args[1])
            return self._plain(self.compile_col(args[0], df)).isin(
                [int(v) if isinstance(v, TimeMs) else v for v in vals]
            )
        if head == "as":
            return K.as_(str(self.eval(args[0])), self._plain(self.compile_col(args[1], df)))

        raise RayfallError(f"unknown column verb: {head}")

    @staticmethod
    def _plain(c) -> Column:
        if isinstance(c, A.AggExpr):
            raise RayfallError("aggregate used where a row expression is required")
        if not isinstance(c, Column):
            raise RayfallError(f"expected a column expression, got {c!r}")
        return c

    @staticmethod
    def _arith(op, a, b):
        """Arithmetic over Columns/AggExprs: any aggregate operand keeps
        the result an aggregate (e.g. (- (max x) (min x)), H2O gq6)."""
        if isinstance(a, A.AggExpr) or isinstance(b, A.AggExpr):
            ac = a.col if isinstance(a, A.AggExpr) else a
            bc = b.col if isinstance(b, A.AggExpr) else b
            return A.agg(op(ac, bc))
        return op(a, b)

    def _uses_columns(self, ast, df) -> bool:
        """Does this column-context AST reference any df column?"""
        if isinstance(ast, Sym):
            return str(ast) in df.columns
        if isinstance(ast, list):
            # (at TABLE 'col) compiles to F.col(col) — a column ref even
            # though neither arg is a bare df column symbol
            if ast and isinstance(ast[0], Sym) and str(ast[0]) == "at":
                return True
            return any(self._uses_columns(a, df) for a in ast[1:])
        return False

    def _is_inty(self, ast, df) -> bool:
        """Static integer-ness for `/`: the reference's `/` floors on
        integer vectors and true-divides on floats (docs joins.md asof
        example) — runtime dispatch there, schema dispatch here."""
        if isinstance(ast, bool):
            return False
        if isinstance(ast, (int, TimeMs)):
            return True
        if isinstance(ast, Sym):
            name = str(ast)
            if name in df.columns:
                return dict(df.dtypes)[name] in ("tinyint", "smallint", "int", "bigint")
            v = self.env.get(name)
            return isinstance(v, int) and not isinstance(v, (bool, float))
        if isinstance(ast, list) and ast and isinstance(ast[0], Sym):
            h = str(ast[0])
            if h in ("+", "-", "*", "/", "%", "til", "count", "xbar"):
                return all(self._is_inty(a, df) for a in ast[1:])
            if h == "as":
                return str(ast[1]).lower() in ("i16", "i32", "i64", "time")
        return False


def eval_str(src: str, spark=None, env: dict[str, Any] | None = None):
    """One-shot evaluation of a Rayfall program; returns the last form's
    value (DataFrames stay lazy). For a persistent environment across
    calls, hold an :class:`Interp`."""
    if spark is None:
        from rayforce_spark.session import get_spark

        spark = get_spark()
    return Interp(spark, env).eval_str(src)
