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
query/join/mutation verbs. No lambdas, no bytecode VM, no control flow —
that is Python's job in this engine (SURVEY §2.9).
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


_QUERY_RESERVED = {"from", "where", "by", "take"}

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
    "<>": lambda a, b: a != b,
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
            return str(ast)
        if isinstance(ast, Sym):
            if str(ast) in self.env:
                return self.env[str(ast)]
            raise RayfallError(f"unbound name: {ast}")
        if isinstance(ast, Vec):
            return [str(e) if isinstance(e, QSym) else self.eval(e) if isinstance(e, (list, Sym)) else e for e in ast]
        if isinstance(ast, DictLit):
            return {k: self.eval(v) for k, v in ast}
        if isinstance(ast, list):
            return self._eval_call(ast)
        return ast  # int/float/str/date/TimeMs literal

    def _eval_call(self, ast: list):
        if not ast or not isinstance(ast[0], Sym):
            raise RayfallError(f"cannot call {ast!r}")
        head, args = str(ast[0]), ast[1:]

        # special forms ---------------------------------------------------
        if head == "set":
            if len(args) != 2 or not isinstance(args[0], Sym):
                raise RayfallError("(set name value)")
            val = self.eval(args[1])
            self.env[str(args[0])] = val
            return val
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
            if head == "left-join":
                return J.left_join(left, right, keys)
            if head == "inner-join":
                return J.inner_join(left, right, keys)
            if len(keys) < 2:
                raise RayfallError("asof-join needs at least [key time] columns")
            return J.asof_join(left, right, keys[:-1], keys[-1])
        if head in ("window-join", "window-join1"):
            return self._eval_window_join(args, wj=(head == "window-join"))
        if head == "insert":
            target = self.eval(args[0])
            return J.insert(target, self._rows_df(target, self.eval(args[1])))
        if head == "upsert":
            target = self.eval(args[0])
            n_keys = int(self.eval(args[1]))
            return J.upsert(target, self._rows_df(target, self.eval(args[2])), n_keys)
        if head == "at":
            obj = self.eval(args[0])
            col = self.eval(args[1])
            if isinstance(obj, DataFrame):
                return V.at_collect(obj, str(col))
            if isinstance(obj, dict):
                return obj[str(col)]
            raise RayfallError("(at table 'col)")
        if head == "map-left" or head == "map-right":
            fn = _VALUE_FNS.get(str(args[0]))
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
            return V.as_value(str(self.eval(args[0])), self.eval(args[1]))
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
            # subsumes (COVERAGE.md §2.7) — evaluate to the symbol values
            return self.eval(args[-1])
        if head == "count":
            x = self.eval(args[0])
            if isinstance(x, DataFrame):
                return x.count()
            return len(x) if isinstance(x, (list, dict)) else 1
        if head == "meta":
            return I.meta(self.eval(args[0]))
        if head == "key":
            x = self.eval(args[0])
            return I.keys_of(x) if isinstance(x, DataFrame) else list(x.keys())

        # table sorting (docs operations/order.md "Table Sorting Functions")
        if head in ("xasc", "xdesc"):
            from rayforce_spark.operators import order as O

            cols = self._key_names(args[0])
            df = self.eval(args[1])
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
            return V.filter_(self.eval(args[0]), self.eval(args[1]))
        if head == "within":
            return V.within_vals(self.eval(args[0]), self.eval(args[1]))
        if head in ("sum", "avg", "min", "max", "med", "dev", "first", "last"):
            return V.vagg(head, self.eval(args[0]))
        if head == "neg":
            return V.sub(0, self.eval(args[0]))
        if head == "abs":
            x = self.eval(args[0])
            return [abs(v) for v in x] if isinstance(x, list) else abs(x)

        raise RayfallError(f"unknown verb: {head}")

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
        df = self.eval(clauses["from"])
        if not isinstance(df, DataFrame):
            raise RayfallError(f"{verb}: from: must be a table")
        where = None
        if "where" in clauses:
            where = self.compile_col(clauses["where"], df)
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
                # every requested column is a group key: distinct keys
                out = df.filter(where) if where is not None else df
                if isinstance(by, dict):
                    out = out.select(*[c.alias(n) for n, c in by.items()])
                else:
                    out = out.select(*key_names)
                out = out.distinct()
                if "take" in clauses:
                    out = out.limit(int(self.eval(clauses["take"])))
                return out
            out_names = kept
        cols = {n: self.compile_col(clauses[n], df) for n in out_names}
        if update:
            if "take" in clauses:
                raise RayfallError("update has no take:")
            return Q.update(df, cols, where=where, by=by)
        take = self.eval(clauses["take"]) if "take" in clauses else None
        return Q.select(df, cols or None, where=where, by=by, take=take)

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

    def _key_names(self, ast) -> list[str]:
        if not isinstance(ast, Vec):
            raise RayfallError("join columns must be a [vector] of symbols")
        return [str(s) for s in ast]

    def _rows_df(self, target: DataFrame, data) -> DataFrame:
        """insert/upsert payload -> DataFrame in the target's schema
        (docs queries/insert.md: list / dict / table payloads)."""
        if isinstance(data, DataFrame):
            return data
        names = list(target.columns)
        if isinstance(data, dict):
            cols = [data[n] for n in names]
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
            return join(left, right, keys[:-1], keys[-1], lo, hi, aggs)

        # general form: per-row interval vectors, pasted positionally
        # (doc-scale; the offset idiom above is the dataset-scale path)
        bounds = self.eval(iv)
        if not (isinstance(bounds, list) and len(bounds) == 2):
            raise RayfallError("intervals must be (list lo-vec hi-vec)")
        bt = V.build_table(self.spark, ["__rf_wlo", "__rf_whi"], bounds)
        lt = I.hconcat(left, bt)
        out = join(
            lt, right, keys[:-1], keys[-1],
            F.col("__rf_wlo"), F.col("__rf_whi"), aggs,
        )
        return out.drop("__rf_wlo", "__rf_whi")

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
            out = self.compile_col(args[0], df)
            inty = self._is_inty(args[0], df)
            for a in args[1:]:
                rhs = self.compile_col(a, df)
                if inty and self._is_inty(a, df):
                    out = self._arith(K.ediv, out, rhs)
                else:
                    out = self._arith(lambda x, y: x / y, out, rhs)
                    inty = False
            return out
        if head == "%":
            return self._arith(
                K.emod, self.compile_col(args[0], df), self.compile_col(args[1], df)
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
            n = self.eval(args[0])
            return K.xbar(n, self._plain(self.compile_col(args[1], df)))
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
