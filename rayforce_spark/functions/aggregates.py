"""Aggregate verbs.

The reference registers aggregation builtins with an FN_AGGR flag
(ref core/env.c:135-146,177) so that ``select`` applies them per group over
a lazy group map (ref core/eval.c:723-728, core/aggr.c:375-392). Here the
same routing decision is carried by :class:`AggExpr` — a thin marker around
a Spark aggregate Column. The query layer (operators/query.py) sends
AggExprs through ``groupBy().agg()`` (or a Window for grouped update) and
treats plain Columns as projections / implicit per-group collects.

Null semantics: the reference's aggregates skip typed-null sentinels
(ref core/ops.h:141-152); Spark aggregates skip SQL NULL — identical
behavior for free (SURVEY §1.2).
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


class AggExpr:
    """Marker: a Column whose top node is an aggregate function.

    ``col`` is usable directly in ``DataFrame.agg`` and supports
    ``.over(window)`` for the grouped-update rewrite. When built by an
    ``A.*`` constructor, ``fn``/``arg`` record how to rebuild the
    aggregate over a masked input (grouped update with ``where`` — see
    operators.query.update).
    """

    __slots__ = ("col", "fn", "arg", "arg_name", "wrap")

    def __init__(self, col: Column, fn=None, arg: Column | None = None,
                 arg_name: str | None = None, wrap=None):
        self.col = col
        self.fn = fn
        self.arg = arg
        self.arg_name = arg_name
        # post-aggregation transform (e.g. sum's coalesce-to-0 identity);
        # in window form it must apply OUTSIDE the OVER clause, so the
        # window path threads through `windowed`, not `col`
        self.wrap = wrap

    def masked(self, cond: Column) -> Column:
        """agg(x) -> agg(CASE WHEN cond THEN x END): aggregate only rows
        passing ``cond`` (matches the reference's filter-then-group order,
        ref core/query.c:311-340)."""
        if self.fn is None or self.arg is None:
            raise ValueError(
                "cannot mask a composite aggregate; build it from A.* verbs"
            )
        out = self.fn(F.when(cond, self.arg))
        return self.wrap(out) if self.wrap else out

    def windowed(self, window, where: Column | None = None) -> Column:
        """The grouped-update form: aggregate over a window partition,
        optionally over passing rows only, with any post-transform applied
        outside the OVER clause."""
        if self.fn is not None and self.arg is not None:
            inner = (
                self.fn(F.when(where, self.arg)) if where is not None
                else self.fn(self.arg)
            )
            out = inner.over(window)
            return self.wrap(out) if self.wrap else out
        if where is not None:
            raise ValueError(
                "cannot mask a composite aggregate; build it from A.* verbs"
            )
        return self.col.over(window)

    def alias(self, name: str) -> Column:
        return self.col.alias(name)

    def over(self, window) -> Column:
        return self.col.over(window)

    # arithmetic on aggregates stays an aggregate expression
    # (e.g. max(v1) - min(v2), H2O groupby Q6)
    def _wrap(self, other, op):
        other_c = other.col if isinstance(other, AggExpr) else other
        return AggExpr(op(self.col, other_c))

    def __add__(self, other):
        return self._wrap(other, lambda a, b: a + b)

    def __sub__(self, other):
        return self._wrap(other, lambda a, b: a - b)

    def __mul__(self, other):
        return self._wrap(other, lambda a, b: a * b)

    def __truediv__(self, other):
        return self._wrap(other, lambda a, b: a / b)


def agg(col: Column) -> AggExpr:
    """Tag an arbitrary Spark aggregate Column as an aggregate verb."""
    return AggExpr(col)


def _make(fn, c: ColumnOrName) -> AggExpr:
    col = _col(c)
    return AggExpr(fn(col), fn, col, c if isinstance(c, str) else None)


# -- reference aggregate inventory (SURVEY §2.4) ----------------------------

def sum_(c: ColumnOrName) -> AggExpr:
    """ref core/math.c:2388 (flat), core/aggr.c:1107 (grouped).

    kdb sum has identity 0 — ``(sum [])`` is 0, and an all-null input
    sums to 0 (FOLD_ADD starts at 0 and skips nulls,
    ref tests/lang.c:4070) — where SQL SUM returns NULL; coalesce
    restores the reference semantics (type coercion picks the summed
    type)."""
    col = _col(c)
    wrap = lambda agg: F.coalesce(agg, F.lit(0))  # noqa: E731
    return AggExpr(wrap(F.sum(col)), F.sum, col,
                   c if isinstance(c, str) else None, wrap=wrap)


def avg(c: ColumnOrName) -> AggExpr:
    """ref core/math.c:2445, core/aggr.c:2013."""
    return _make(F.avg, c)


def sum_exact(c: ColumnOrName, *, scale: int = 6,
              precision: int = 18) -> AggExpr:
    """Order-independent exact sum of a double column: quantize each value
    to decimal(precision, scale) first, sum in decimal space (exact, any
    partial-aggregation order), then present as double with one final
    correctly-rounded cast. Use when the result must be bit-identical
    across engines/partitionings — plain double sums drift in the last
    ulps with partition count (fp addition is not associative)."""
    col = _col(c).cast(f"decimal({precision},{scale})")
    fn = lambda x: F.sum(x).cast("double")  # noqa: E731
    return AggExpr(fn(col), fn, col)


def avg_exact(c: ColumnOrName, *, scale: int = 6,
              precision: int = 18) -> AggExpr:
    """Order-independent mean: exact decimal sum (see sum_exact) cast to
    double, divided by the group count — exactly two deterministic fp
    operations, so the result is bit-identical regardless of partial
    aggregation order (and reproducible in any engine that sums decimals
    exactly)."""
    col = _col(c).cast(f"decimal({precision},{scale})")
    fn = lambda x: F.sum(x).cast("double") / F.count(x)  # noqa: E731
    return AggExpr(fn(col), fn, col)


def min_(c: ColumnOrName) -> AggExpr:
    """ref core/math.c:2428, core/aggr.c:1263."""
    return _make(F.min, c)


def max_(c: ColumnOrName) -> AggExpr:
    """ref core/math.c:2429, core/aggr.c:1181."""
    return _make(F.max, c)


def count(c: ColumnOrName | None = None) -> AggExpr:
    """Row count incl. nulls when bare (ref core/misc.c:43); non-null count
    of a column when given one (ref core/math.c:2389 ray_cnt)."""
    if c is None:
        return AggExpr(F.count(F.lit(1)), F.count, F.lit(1))
    return _make(F.count, c)


def count_distinct(c: ColumnOrName) -> AggExpr:
    """Composable (distinct + count) in the reference; native here."""
    return AggExpr(F.countDistinct(_col(c)))


def approx_count_distinct(c: ColumnOrName, rsd: float = 0.05) -> AggExpr:
    """HyperLogLog++ distinct-count sketch — the 100 TB path: exact
    count_distinct plans an Expand (one input duplication per distinct
    aggregate) and keeps every distinct value in the agg hash map;
    the sketch is fixed-size mergeable state per group. ``rsd`` is the
    max relative standard deviation (default 5%)."""
    fn = lambda col: F.approx_count_distinct(col, rsd)  # noqa: E731
    return _make(fn, c)


def first(c: ColumnOrName) -> AggExpr:
    """ref core/items.c:1031 (= at_idx 0, grouped fast path
    core/query.c:58-79): the literal first element — a null first element
    returns null, so NO ignorenulls. NB Spark only defines "first" up to
    encounter order; pair with a sorted input (or xasc) when the table
    order matters across partitions."""
    return _make(lambda x: F.first(x, ignorenulls=False), c)


def last(c: ColumnOrName) -> AggExpr:
    """ref core/items.c:1073, core/aggr.c:897 — literal last element,
    nulls included (see first for the ordering caveat)."""
    return _make(lambda x: F.last(x, ignorenulls=False), c)


def med(c: ColumnOrName) -> AggExpr:
    """Exact median — the reference is sort-based exact
    (ref core/math.c:2529, core/aggr.c:2233), so use F.median, not
    percentile_approx."""
    return _make(F.median, c)


def quantile(c: ColumnOrName, q: float) -> AggExpr:
    """Exact linear-interpolated quantile (generalizes med; Spark-native
    extension the reference composes manually via sort + index)."""
    fn = lambda col: F.percentile(col, F.lit(q))  # noqa: E731
    return _make(fn, c)


def quantiles(c: ColumnOrName, qs: "list[float]") -> AggExpr:
    """Exact quantiles at SEVERAL probabilities from one buffer/sort —
    an array-valued aggregate. N separate ``quantile()`` calls in one
    groupBy plan N independent ``percentile`` functions, each of which
    buffers every group value and sorts that buffer (N× the per-group
    memory and N sorts of identical data); ``percentile(col,
    array(...))`` is the same Catalyst expression evaluating all
    probabilities against ONE sorted buffer, element-for-element
    identical values (r12 optimization; measured 2.75 → 1.30 s warm
    min-of-3 on the 3-quantile gate row at sf0.1)."""
    arr = F.array(*[F.lit(float(q)) for q in qs])
    fn = lambda col: F.percentile(col, arr)  # noqa: E731
    return _make(fn, c)


def approx_quantile(c: ColumnOrName, q: float) -> AggExpr:
    """Approximate quantile sketch — the 100 TB path: fixed-size state
    per group (no per-group value buffering), mergeable partials."""
    fn = lambda col: F.percentile_approx(col, F.lit(q), F.lit(10000))  # noqa: E731
    return _make(fn, c)


def dev(c: ColumnOrName) -> AggExpr:
    """Population std-dev, 2-pass in the reference
    (ref core/math.c:2628-2700, core/aggr.c:2864) == stddev_pop."""
    return _make(F.stddev_pop, c)


def var(c: ColumnOrName) -> AggExpr:
    """Population variance (companion of dev)."""
    return _make(F.var_pop, c)


def collect(c: ColumnOrName) -> AggExpr:
    """Implicit per-group collect of a non-aggregated column under ``by``
    (ref core/aggr.c:3021 aggr_collect) — explicit spelling."""
    return _make(F.collect_list, c)
