"""Iteration combinators (adverbs) — SURVEY §2.8, ref core/iter.c.

The reference applies lambdas through combinators (map/pmap/fold/scan…)
over vectors; its bytecode VM + thread pool are the execution engine.
Spark-first translation:

* map over a column          -> expression / F.transform on arrays
* pmap (parallel map)        -> every Spark op (implicit)
* fold over a column         -> DataFrame.agg / F.aggregate on arrays
* scan (running fold)        -> cumulative Window frame
* per-group lambda           -> applyInPandas (Arrow-batched)
* per-row lambda (last path) -> pandas_udf

Python lambdas on scalars are the slow path by design — prefer the
expression forms; the pandas variants exist for genuinely opaque logic.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _c(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def map_(expr_fn: Callable[[Column], Column], c: ColumnOrName) -> Column:
    """(map f xs) over a table column — an expression, fused into the scan
    by whole-stage codegen (ref core/iter.c:585; pmap core/iter.c:625 is
    implicit: every expression runs data-parallel)."""
    return expr_fn(_c(c))


def map_array(expr_fn: Callable[[Column], Column], c: ColumnOrName) -> Column:
    """(map f xs) over an array column -> F.transform."""
    return F.transform(_c(c), expr_fn)


def fold_array(
    op: Callable[[Column, Column], Column],
    init,
    c: ColumnOrName,
    finish: Callable[[Column], Column] | None = None,
) -> Column:
    """(fold f init xs) over an array column -> F.aggregate
    (ref core/iter.c:838). ``init``'s type must match the accumulator —
    pass a cast Column (e.g. F.lit(0).cast("long")) for non-int folds."""
    init_c = init if isinstance(init, Column) else F.lit(init)
    return F.aggregate(_c(c), init_c, op, finish or (lambda x: x))


def scan_col(
    agg: Column,
    *,
    by: Sequence[str] = (),
    order: Sequence[ColumnOrName],
) -> Column:
    """(scan f xs): running aggregate as a cumulative window frame
    (ref core/iter.c:1212). ``agg`` is any aggregate Column (F.sum(...));
    ``order`` defines the scan order (add a tiebreak for determinism);
    ``by`` scopes the scan per group — without it the window is global
    (single-partition: use only for small results)."""
    w = (
        Window.partitionBy(*by)
        .orderBy(*[_c(o) for o in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return agg.over(w)


def fold_right_array(
    op: Callable[[Column, Column], Column],
    init,
    c: ColumnOrName,
    finish: Callable[[Column], Column] | None = None,
) -> Column:
    """(fold-right f init xs) over an array column
    (ref core/iter.c:1133): f(x1, f(x2, … f(xn, init))). Expressed as a
    left fold over the reversed array with flipped arguments — one
    F.aggregate, JVM-side."""
    init_c = init if isinstance(init, Column) else F.lit(init)
    return F.aggregate(
        F.reverse(_c(c)), init_c, lambda acc, x: op(x, acc),
        finish or (lambda x: x),
    )


def scan_right_array(
    op: Callable[[Column, Column], Column], init, c: ColumnOrName
) -> Column:
    """(scan-right f init xs) over an array column (ref core/iter.c:1579):
    out[i] = fold-right over the suffix xs[i:] — the running fold from the
    right, one element per input element. O(n²) per array like scan_array;
    for long sequences explode + scan_col on a reversed order instead."""
    arr = _c(c)
    init_c = init if isinstance(init, Column) else F.lit(init)
    idx = F.sequence(F.lit(1), F.size(arr))
    return F.transform(
        idx,
        lambda i: F.aggregate(
            F.reverse(F.slice(arr, i, F.size(arr) - i + 1)),
            init_c,
            lambda acc, x: op(x, acc),
        ),
    )


def map_left(
    op: Callable[[Column, Column], Column], xs: ColumnOrName, y
) -> Column:
    """(map-left f xs y) — kdb's eachleft f\\:, ref core/iter.c:665: apply
    ``f(x, y)`` for each x in the array ``xs`` with ``y`` fixed (the
    reference's window-join interval idiom
    ``(map-left + [-10000 10000] ts)``)."""
    y_c = y if isinstance(y, Column) else F.lit(y)
    return F.transform(_c(xs), lambda x: op(x, y_c))


def map_right(
    op: Callable[[Column, Column], Column], x, ys: ColumnOrName
) -> Column:
    """(map-right f x ys) — kdb's eachright f/:, ref core/iter.c:752:
    ``f(x, y)`` for each y in ``ys`` with ``x`` fixed."""
    x_c = x if isinstance(x, Column) else F.lit(x)
    return F.transform(_c(ys), lambda y: op(x_c, y))


def scan_array(
    op: Callable[[Column, Column], Column], init, c: ColumnOrName
) -> Column:
    """(scan f init xs) over an array column: prefix folds via transform +
    slice aggregation. O(n²) per array — for long sequences use scan_col
    on an exploded table instead."""
    arr = _c(c)
    init_c = init if isinstance(init, Column) else F.lit(init)
    idx = F.sequence(F.lit(1), F.size(arr))
    return F.transform(
        idx, lambda i: F.aggregate(F.slice(arr, 1, i), init_c, op)
    )


def apply_grouped(
    df: DataFrame,
    by: Sequence[str],
    fn: Callable,
    schema: str,
    *,
    impl: str = "batched",
) -> DataFrame:
    """Per-group lambda (the reference's grouped map/row idiom,
    ref core/compose.c:1166 + MAPGROUP) — fn: pandas.DataFrame ->
    pandas.DataFrame, called once per group.

    ``impl="spark"`` is the plain ``groupBy().applyInPandas`` — ONE
    Arrow frame + Python round-trip PER GROUP, which is the dominant
    cost when groups are small and many (measured: ~4 ms/group fixed
    overhead → 30 s for 7.5k tiny groups at sf0.1).

    ``impl="batched"`` (default, r9) keeps the per-group CONTRACT but
    amortizes the transport: rows hash-shuffle on the keys and sort
    within partitions, mapInPandas streams each partition's Arrow
    batches, groups are cut by key-change inside the batch (a group
    can span batch boundaries — the tail carries over), and fn runs
    per group at pandas speed with no per-group JVM↔Python round trip.
    Same one shuffle as impl="spark", ~10x fewer Arrow crossings.
    fn must not depend on within-group row order beyond what the input
    partitioning provides (same contract as impl="spark", where
    Spark's group assembly order is likewise unspecified)."""
    if impl == "spark":
        return df.groupBy(*by).applyInPandas(fn, schema)
    if impl != "batched":
        raise ValueError(f"apply_grouped: unknown impl {impl!r}")
    keys = list(by)

    def _stream(batches):
        import pandas as pd

        def run_all(frame):
            # one concatenated OUTPUT frame per input Arrow batch: a
            # yield per group would ship 1000s of tiny Arrow batches
            # back to the JVM (measured: comparable cost to the
            # per-group round trips this impl exists to remove)
            outs = [fn(g.reset_index(drop=True))
                    for _, g in frame.groupby(keys, dropna=False,
                                              sort=False)]
            return pd.concat(outs, ignore_index=True) if outs else None

        def key_of(frame, idx):
            return tuple(frame.iloc[idx][k] for k in keys)

        def same_key(a, b):
            return all(
                (x == y) or (pd.isna(x) and pd.isna(y))
                for x, y in zip(a, b))

        # the carried (possibly batch-spanning) trailing group
        # accumulates as a LIST of fragments and concatenates once at
        # flush time — re-concatenating the whole tail into every new
        # batch would cost O(k²) row copies for a group spanning k
        # Arrow batches (a 10M-row skewed group is ~1000 batches)
        frags: list = []
        for pdf in batches:
            if not len(pdf):
                continue
            if frags and not same_key(key_of(frags[-1], -1),
                                      key_of(pdf, 0)):
                out = run_all(pd.concat(frags, ignore_index=True))
                frags = []
                if out is not None and len(out):
                    yield out
            # rows arrive sorted by keys within the partition; every
            # complete group (key != last row's key) can flush now, the
            # last key's run waits for the next batch
            last = key_of(pdf, -1)
            is_tail = pd.Series(True, index=pdf.index)
            for k, v in zip(keys, last):
                is_tail &= pdf[k].eq(v) | (pdf[k].isna() & pd.isna(v))
            head = pdf[~is_tail]
            if len(head):
                if frags:  # carried run continues into head's first group
                    head = pd.concat([*frags, head], ignore_index=True)
                    frags = []
                out = run_all(head)
                if out is not None and len(out):
                    yield out
            frags.append(pdf[is_tail])
        if frags:
            out = run_all(pd.concat(frags, ignore_index=True))
            if out is not None and len(out):
                yield out

    return (
        df.repartition(*keys)
        .sortWithinPartitions(*keys)
        .mapInPandas(_stream, schema)
    )


def apply_rows(df: DataFrame, fn: Callable, schema: str) -> DataFrame:
    """Partition-streaming row lambda via mapInPandas (the honest analog
    of the reference's chunked kernel fan-out, ref core/pool.c:369)."""
    return df.mapInPandas(fn, schema)
