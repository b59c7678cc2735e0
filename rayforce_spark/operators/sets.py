"""Set / membership verbs (SURVEY §2.6, ref core/items.c).

Two shapes per verb, mirroring the reference (which applies them to raw
vectors): a Column predicate form for use inside where:, and a DataFrame
form for key-set algebra. The DataFrame forms are semi/anti joins —
shuffle-on-key, broadcastable when one side is small, no driver collect.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def _keys(on) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


# -- predicate forms ---------------------------------------------------------

def in_(x: ColumnOrName, values) -> Column:
    """Per-element membership (ref core/items.c:736, typed hash
    core/index.h:73-89). ``values``: Python sequence -> isin (broadcast
    literal); Column (array) -> array_contains.

    kdb nulls are sentinel VALUES, so ``(in 0N [0N 1])`` is true — where
    SQL's IN yields NULL for a null probe. The result here is total
    boolean: a null probe matches iff the value set contains null, and a
    miss against a null-containing set is false, not null."""
    x = _col(x)
    if isinstance(values, Column):
        has_null = F.exists(values, lambda v: v.isNull())
        return F.when(x.isNull(), has_null).otherwise(
            F.coalesce(F.array_contains(values, x), F.lit(False))
        )
    vals = list(values)
    has_null = any(v is None for v in vals)
    non_null = [v for v in vals if v is not None]
    base = x.isin(non_null) if non_null else F.lit(False)
    return F.when(x.isNull(), F.lit(has_null)).otherwise(
        F.coalesce(base, F.lit(False))
    )


def within(x: ColumnOrName, lo, hi) -> Column:
    """x in [lo, hi] (ref core/items.c:848)."""
    return _col(x).between(lo, hi)


# -- DataFrame key-set forms -------------------------------------------------

def semi(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of left whose key appears in right (the reference composes
    this as (where (in ks other)) — ref core/items.c:736)."""
    return left.join(right, _keys(on), "left_semi")


def anti(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of left whose key does NOT appear in right."""
    return left.join(right, _keys(on), "left_anti")


def _row_eq(left: DataFrame, right: DataFrame) -> Column:
    cond = None
    for c in left.columns:
        e = left[c].eqNullSafe(right[c])
        cond = e if cond is None else cond & e
    return cond


def except_(left: DataFrame, right: DataFrame) -> DataFrame:
    """Left rows whose value does NOT appear in right
    (ref core/items.c:916: filter(x, not(in(x,y))) — a FILTER, so left
    duplicates survive: (except [1 1 2 2 3] [1 3]) = [2 2],
    ref tests/lang.c:3964 — unlike SQL EXCEPT which dedups). Null-safe:
    kdb nulls are sentinel values, so a null left row is excluded when
    right contains null."""
    return left.join(right, _row_eq(left, right), "left_anti")


def sect(left: DataFrame, right: DataFrame) -> DataFrame:
    """Left rows whose value appears in right (ref core/items.c:898:
    filter(x, in(x,y)) — left duplicates survive, unlike SQL INTERSECT).
    Null-safe like except_."""
    return left.join(right, _row_eq(left, right), "left_semi")


def union(left: DataFrame, right: DataFrame) -> DataFrame:
    """Distinct union (ref core/items.c:1022 — preserves first-seen order;
    order is not meaningful on a distributed table, documented
    divergence)."""
    return left.unionByName(right).distinct()


def find(haystack: DataFrame, needles: DataFrame, on) -> DataFrame:
    """Index of each needle key in haystack (ref core/items.c:302): returns
    needles + ``idx`` = first row index in haystack holding that key (null
    if absent). Row index = table order via monotonically_increasing_id
    rank (small-result verb; the reference's find is positional by
    nature)."""
    keys = _keys(on)
    from pyspark.sql import Window

    w = Window.orderBy(F.monotonically_increasing_id())
    h = haystack.withColumn("idx", F.row_number().over(w) - 1)
    firsts = h.groupBy(*keys).agg(F.min("idx").alias("idx"))
    return needles.join(firsts, keys, "left")
