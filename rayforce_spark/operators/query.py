"""select / update — the reference's core query verbs, Spark-first.

The reference stages a select as from -> where -> by -> mappings -> collect
-> build (ref core/query.c:607-654, SURVEY §3.1). Here the same stages are
declared on a DataFrame and Catalyst performs the physical planning: the
reference's lazy MAPFILTER/MAPGROUP views (ref core/filter.c:29,
core/group.c:26) are subsumed by Catalyst's lazy plan + column pruning, and
its filter-pushed-into-grouping (ref core/query.c:47) by PushDownPredicate.

Scale notes: the grouped path is one hash-aggregate shuffle on the group
keys (partial + final, exactly the reference's partial/final pool model at
core/aggr.c:262-294). No collects, no driver loops; `take` with n>0 is a
LocalLimit (no shuffle).
"""

from __future__ import annotations

from typing import Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rayforce_spark.functions.aggregates import AggExpr, min_ as _agg_min

ColumnOrName = Union[Column, str]
ExprLike = Union[Column, str, AggExpr]


def _as_col(e: ExprLike) -> Column:
    if isinstance(e, AggExpr):
        return e.col
    if isinstance(e, str):
        return F.col(e)
    return e


def _normalize_by(by) -> list[tuple[str, Column]]:
    """``by`` accepts a column name, list of names, or {name: expr} for
    computed keys (the reference allows arbitrary exprs in by:, e.g.
    ``by: {bucket: (xbar 5 x)}``)."""
    if by is None:
        return []
    if isinstance(by, str):
        return [(by, F.col(by))]
    if isinstance(by, Mapping):
        return [(name, _as_col(e).alias(name)) for name, e in by.items()]
    if isinstance(by, Sequence):
        out = []
        for b in by:
            if isinstance(b, str):
                out.append((b, F.col(b)))
            else:
                raise TypeError("list-form `by` takes column names; use a dict for computed keys")
        return out
    raise TypeError(f"unsupported by: {type(by)}")


def select(
    df: DataFrame,
    cols: Mapping[str, ExprLike] | None = None,
    *,
    where: Column | None = None,
    by=None,
    take: int | tuple[int, int] | None = None,
    appearance_order: bool = False,
) -> DataFrame:
    """The reference's ``(select {cols… from: t where: … by: … take: …})``
    (ref core/query.c:607, docs queries/select.md).

    - ``cols``: {output_name: expression}. AggExpr values aggregate; plain
      columns project (ungrouped) or implicitly collect_list per group
      (grouped — ref core/aggr.c:3021).
    - ``where``: boolean Column, applied before grouping
      (ref core/query.c:311).
    - ``by``: group keys — name, list of names, or {name: expr}.
    - ``take``: limit; negative n = last n rows (table order), tuple =
      (start, n) slice. Positive limit is shuffle-free; tail/slice
      materialize a row index and are documented as small-result verbs.
    """
    out = df
    if where is not None:
        out = out.filter(where)

    keys = _normalize_by(by)

    if keys:
        # appearance_order: groups come back in FIRST-APPEARANCE row
        # order (the reference's by semantics, live-pinned by
        # ref_diff_tables) — a min-position agg + sort. Off by default:
        # the batch operator surface is order-free (the driver gate
        # hashes order-insensitively) and the extra sort is not free at
        # scale; the Rayfall front-end passes True (order is semantics
        # there).
        if appearance_order:
            out = out.withColumn(
                "__rford", F.monotonically_increasing_id())
        if cols:
            if appearance_order:
                cols = {**cols, "__rford": _agg_min("__rford")}
            aggs = []
            for name, e in cols.items():
                if isinstance(e, AggExpr):
                    aggs.append(e.col.alias(name))
                else:
                    # implicit per-group collect of a non-aggregated column
                    aggs.append(F.collect_list(_as_col(e)).alias(name))
            med_split = _split_median(out, cols, keys)
            if med_split is not None:
                if appearance_order:
                    med_split = med_split.orderBy("__rford").drop("__rford")
                return med_split if take is None else _take(med_split, take)
        else:
            # default columns: first per remaining column
            # (ref core/query.c:474 select_collect_fields)
            key_names = {n for n, _ in keys}
            aggs = [
                (F.min(c) if c == "__rford" else F.first(c)).alias(c)
                for c in out.columns if c not in key_names
            ]
        out = out.groupBy(*[c for _, c in keys]).agg(*aggs)
        if appearance_order:
            out = out.orderBy("__rford").drop("__rford")
    elif cols:
        has_agg = any(isinstance(e, AggExpr) for e in cols.values())
        if has_agg:
            if not all(isinstance(e, AggExpr) for e in cols.values()):
                raise ValueError(
                    "ungrouped select mixing aggregates and plain columns; "
                    "wrap plain columns in A.first/A.last or add `by`"
                )
            out = out.agg(*[e.col.alias(n) for n, e in cols.items()])
        else:
            out = out.select(*[_as_col(e).alias(n) for n, e in cols.items()])

    if take is not None:
        out = _take(out, take)
    return out


def _split_median(out: DataFrame, cols, keys) -> DataFrame | None:
    """Planning rule: a grouped agg that MIXES exact median with other
    aggregates forces the whole aggregation onto the slow object-hash /
    sort path (median buffers per-group values; count_distinct adds an
    Expand). Running the medians in their own narrow aggregation and
    null-safe-joining back on the group keys keeps everything else in
    codegen'd HashAggregate — measured 3x faster on the mixed-stats
    query. Returns None when no split applies (no medians, or nothing
    but medians)."""
    med = {
        n: e for n, e in cols.items()
        if isinstance(e, AggExpr) and e.fn is F.median
    }
    if not med or len(med) == len(cols):
        return None
    rest = {n: e for n, e in cols.items() if n not in med}
    if not all(isinstance(e, AggExpr) for e in rest.values()):
        return None  # implicit collects keep single-agg semantics
    key_cols = [c for _, c in keys]
    key_names = [n for n, _ in keys]
    # alias both plans and join on qualified names: both sides share the
    # same lineage, and unqualified fast[k] == slow[k] rests on Spark's
    # ambiguous-self-join resolution (config-dependent, warns "trivially
    # true predicate") — explicit aliases make the resolution
    # deterministic
    fast = out.groupBy(*key_cols).agg(
        *[e.col.alias(n) for n, e in rest.items()]
    ).alias("__rf_fast")
    slow = out.groupBy(*key_cols).agg(
        *[e.col.alias(n) for n, e in med.items()]
    ).alias("__rf_slow")
    cond = None
    for k in key_names:
        c = F.col(f"__rf_fast.{k}").eqNullSafe(F.col(f"__rf_slow.{k}"))
        cond = c if cond is None else cond & c
    joined = fast.join(slow, cond)
    return joined.select(
        *[F.col(f"__rf_fast.{k}") for k in key_names],
        *[F.col(n) for n in cols if n not in key_names],
    )


def _take(df: DataFrame, take) -> DataFrame:
    """take: clause (ref core/query.c:294-304, core/items.c:398-430).

    n>0 head (LocalLimit — scale-safe); n<0 tail; (start, n) slice. Tail
    and slice depend on table order, which Spark only preserves as
    partition/file read order — we materialize it via
    monotonically_increasing_id, a small-result verb by construction.
    """
    if isinstance(take, int):
        if take >= 0:
            return df.limit(take)
        n = -take
        w = Window.orderBy(F.monotonically_increasing_id())
        total = Window.partitionBy()
        ranked = df.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__cnt", F.count(F.lit(1)).over(total)
        )
        return ranked.filter(F.col("__rn") > F.col("__cnt") - n).drop("__rn", "__cnt")
    start, n = take
    w = Window.orderBy(F.monotonically_increasing_id())
    ranked = df.withColumn("__rn", F.row_number().over(w))
    return ranked.filter(
        (F.col("__rn") > start) & (F.col("__rn") <= start + n)
    ).drop("__rn")


def take_cyclic(df: DataFrame, n: int) -> DataFrame:
    """Reference ``take:`` semantics for positive n: when n exceeds the
    row count, rows CYCLE (live-pinned by ref_diff_tables: take: 3 on a
    1-row result repeats the row 3x — kdb take, same as the vector verb).

    The shortfall check counts the LIMITED frame (at most n rows — cheap
    and scale-safe), so the common n <= count case stays a plain
    LocalLimit. The cycling join itself is n-row-bounded driver work.
    Used by the Rayfall front-end; the batch operator surface keeps
    ``select(take=n)`` = limit (a training pipeline never wants silent
    row duplication)."""
    if n <= 0:
        return _take(df, n)
    head = df.limit(n)
    c = head.count()
    if c == 0 or c >= n:
        return head
    spark = df.sparkSession
    w = Window.orderBy(F.monotonically_increasing_id())
    pos = head.withColumn("__rfp", F.row_number().over(w) - 1)
    reps = spark.range(n).select(
        F.col("id").alias("__rfi"),
        (F.col("id") % c).alias("__rfk"))
    out = (reps.join(pos, reps.__rfk == pos.__rfp)
           .orderBy("__rfi")
           .drop("__rfi", "__rfk", "__rfp"))
    return out


def update(
    df: DataFrame,
    cols: Mapping[str, ExprLike],
    *,
    where: Column | None = None,
    by=None,
) -> DataFrame:
    """The reference's ``(update {cols… from: t where: … by: …})``
    (ref core/update.c:938,753, docs queries/update.md).

    - plain expr: withColumn (replace or add).
    - with ``where``: only matching rows get the new value; existing
      columns keep their old value elsewhere, new columns are null
      elsewhere.
    - with ``by`` + AggExpr: the group aggregate is broadcast back to every
      member row — the window-function rewrite of the reference's grouped
      update (ref core/update.c:753). With ``where`` too, the aggregate is
      computed over passing rows only and only those rows are updated
      (goldens: ref tests/lang.c:2902).
    """
    keys = _normalize_by(by)
    w = Window.partitionBy(*[c for _, c in keys]) if keys else None

    out = df
    for name, e in cols.items():
        if isinstance(e, AggExpr):
            if w is None:
                raise ValueError(f"aggregate update for '{name}' requires `by`")
            expr = e.windowed(w, where)
        else:
            expr = _as_col(e)
        if where is not None:
            old = F.col(name) if name in out.columns else F.lit(None)
            expr = F.when(where, expr).otherwise(old)
        out = out.withColumn(name, expr)
    return out


def delete(df: DataFrame, *, where: Column) -> DataFrame:
    """Row deletion = inverted filter (reference expresses this via
    select/remove, ref core/compose.c:825)."""
    return df.filter(~where)


def select_cube(df: DataFrame, cols: Mapping[str, ExprLike], *,
                by: Sequence[str], where: Column | None = None,
                rollup: bool = False) -> DataFrame:
    """Cube/rollup aggregation — a Spark capability the reference lacks
    (SURVEY §2.4 'Missing vs Spark'); exposed with select's shape.
    Null key cells mark subtotal rows (SQL GROUPING semantics)."""
    out = df.filter(where) if where is not None else df
    grouped = out.rollup(*by) if rollup else out.cube(*by)
    return grouped.agg(*[
        (e.col if isinstance(e, AggExpr) else _as_col(e)).alias(n)
        for n, e in cols.items()
    ])


def pivot(df: DataFrame, *, by: str, pivot_col: str, values: Sequence,
          agg: AggExpr) -> DataFrame:
    """Pivot (wide) aggregation — likewise beyond the reference's surface.
    ``values`` must be explicit (at 100 TB, discovering pivot values is a
    separate distinct pass — make the caller own it)."""
    return df.groupBy(by).pivot(pivot_col, list(values)).agg(agg.col)
