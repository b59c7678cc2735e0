"""Ordering / ranking / bucketing verbs (SURVEY §2.5, ref core/order.c,
core/sort.c).

The reference's radix/counting sort machinery is physical detail — Spark's
Tungsten sort (range-partition + per-partition sort) is the distributed
equivalent and is what orderBy plans to. Rank verbs are Window functions;
note a global Window.orderBy is a single-partition bottleneck at scale, so
rank/xrank take optional partition keys for the distributed form.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _cols(cs) -> list:
    if isinstance(cs, (str, Column)):
        return [cs]
    return list(cs)


def _c(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def xasc(df: DataFrame, cols) -> DataFrame:
    """Sort table ascending by columns (ref core/order.c:246). NaN/null
    sort first, matching the reference's NaN-smallest rule
    (ref core/ops.h:97)."""
    return df.orderBy(*[F.col(c).asc_nulls_first() if isinstance(c, str) else c for c in _cols(cols)])


def xdesc(df: DataFrame, cols) -> DataFrame:
    """Sort table descending by columns (ref core/order.c:334)."""
    return df.orderBy(*[F.col(c).desc_nulls_last() if isinstance(c, str) else c for c in _cols(cols)])


def rank(df: DataFrame, cols, *, by: Sequence[str] = (),
         out: str = "rank") -> DataFrame:
    """0-based rank of each element in sort order (ref core/order.c:519 —
    the reference's rank is the sort permutation rank, i.e. row_number of
    the stable ascending sort, 0-based). Pass extra tie-break columns for
    a deterministic permutation."""
    w = Window.partitionBy(*by).orderBy(*[_c(c) for c in _cols(cols)])
    return df.withColumn(out, F.row_number().over(w) - 1)


def xrank(df: DataFrame, n: int, cols, *, by: Sequence[str] = (),
          out: str = "bucket") -> DataFrame:
    """n-quantile bucket per element, 0-based: bucket = rank*n div len
    (ref core/order.c:589-596 xrank_worker). NOT ntile(n)-1 — ntile
    front-loads the larger groups (sizes 3,3,2,2 for len=10 n=4), the
    reference's formula interleaves them (3,2,3,2); they only agree when
    n divides len."""
    w = Window.partitionBy(*by).orderBy(*[_c(c) for c in _cols(cols)])
    cnt = Window.partitionBy(*by)
    rank0 = F.row_number().over(w) - 1
    return df.withColumn(
        out,
        ((rank0 * n) - F.pmod(rank0 * n, F.count(F.lit(1)).over(cnt)))
        / F.count(F.lit(1)).over(cnt),
    ).withColumn(out, F.col(out).cast("long"))


def bin_(boundaries: Sequence, x: ColumnOrName) -> Column:
    """Binary search bucketing: index of last boundary <= x, -1 if below
    all (ref core/items.c:1552, parallel partials core/items.c:1399).
    ``boundaries`` must be sorted ascending; compiles to width_bucket-style
    CASE over a broadcast literal array."""
    x = x if isinstance(x, Column) else F.col(x)
    arr = F.array(*[F.lit(b) for b in boundaries])
    # count of boundaries <= x, minus 1 -> index of last <= x
    return (
        F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + F.when(b <= x, 1).otherwise(0),
        )
        - 1
    )


def binr(boundaries: Sequence, x: ColumnOrName) -> Column:
    """Index of first boundary >= x, len(boundaries) if above all
    (ref core/items.c:1599)."""
    x = x if isinstance(x, Column) else F.col(x)
    n = len(boundaries)
    arr = F.array(*[F.lit(b) for b in boundaries])
    lt = F.aggregate(
        arr, F.lit(0), lambda acc, b: acc + F.when(b < x, 1).otherwise(0)
    )
    return lt


def top_k(df: DataFrame, cols, k: int, *, by: Sequence[str] = ()) -> DataFrame:
    """Top-k rows by value (per group if ``by``): the distributed idiom for
    the reference's (take k (xdesc …)) composition. Descending on every
    order column; pass extra tie-break columns for determinism."""
    order = [_c(c).desc() for c in _cols(cols)]
    if by:
        w = Window.partitionBy(*by).orderBy(*order)
        return (
            df.withColumn("__rf_rn", F.row_number().over(w))
            .filter(F.col("__rf_rn") <= k)
            .drop("__rf_rn")
        )
    return df.orderBy(*order).limit(k)
