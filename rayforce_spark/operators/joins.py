"""Join verbs: left/inner equi-joins, asof join, window join, insert/upsert.

Reference semantics (SURVEY §2.3, ref core/join.c, core/index.c):

* all joins are multi-column equi-key;
* ``left-join`` de-duplicates the right side by key — the hash index maps
  key -> single row, last match wins (ref core/index.c:2886);
* ``asof-join``: exact-match leading keys + greatest right temporal value
  <= left value (ref core/index.c:3194, docs queries/joins.md:108-152);
* ``window-join``: per left row, aggregate right rows whose time falls in
  a per-row interval [lo_i, hi_i] (ref core/index.c:3287).

Spark-first design: equi-joins map to df.join (Catalyst picks
broadcast/SMJ/shuffled-hash; AQE re-plans at runtime). asof is the
union + partitioned-window ``last(ignorenulls)`` rewrite — ONE shuffle on
(keys), no per-key collect, no driver loop, scales to arbitrarily many
left/right rows per key. window join is an equi-join on keys with a range
conjunct (hash join + filter) followed by a grouped re-aggregation keyed by
a left row id; AQE's skew-join splitting handles hot keys.
"""

from __future__ import annotations

from typing import Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rayforce_spark.functions.aggregates import AggExpr

_LEFT_TAG = "__rf_is_left"
_RID = "__rf_rid"
_LID = "__rf_lid"


def _keys(on) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def dedup_last(df: DataFrame, keys: Sequence[str], order_col: Column | None = None) -> DataFrame:
    """Keep the last row per key, in table order (reference hash-index
    last-write-wins, ref core/index.c:2886). Spark has no implicit row
    order, so 'last' is defined by ``order_col`` (default: parquet read
    order via monotonically_increasing_id).

    Implemented as a single hash aggregation (max_by of the packed row) —
    partial/final combine, no sort, no window: at scale this is one
    shuffle with map-side combine, strictly cheaper than the
    row_number-window formulation."""
    order_col = order_col if order_col is not None else F.monotonically_increasing_id()
    payload = [c for c in df.columns if c not in keys]
    packed = df.select(
        *keys, F.struct(*payload).alias("__rf_row"), order_col.alias("__rf_ord")
    )
    agg = packed.groupBy(*keys).agg(
        F.max_by("__rf_row", "__rf_ord").alias("__rf_row")
    )
    return agg.select(*keys, *[F.col(f"__rf_row.{c}").alias(c) for c in payload])


def left_join(left: DataFrame, right: DataFrame, on: Union[str, Sequence[str]],
              *, dedup: bool = True, order_col: Column | None = None) -> DataFrame:
    """Left outer equi-join with reference dedup semantics
    (ref core/join.c:158, core/index.c:2886).

    ``dedup=True`` reproduces the reference's key->single-row index (last
    match wins); pass False for standard SQL multiplicity.
    """
    keys = _keys(on)
    r = dedup_last(right, keys, order_col) if dedup else right
    return left.join(r, keys, "left")


def inner_join(left: DataFrame, right: DataFrame, on: Union[str, Sequence[str]]) -> DataFrame:
    """Inner equi-join (ref core/join.c:200, core/index.c:2930)."""
    return left.join(right, _keys(on), "inner")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    asof: str,
    *,
    right_cols: Sequence[str] | None = None,
    strict: bool = False,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: for each left row, the right row with the greatest
    ``asof`` value <= the left's (< if ``strict``), matching exactly on the
    leading keys ``on``; null right columns where no match.

    Reference: ref core/join.c:300, core/index.c:3194 (hash leading keys,
    per-key time-sorted right rows, parallel binary search per left row);
    docs queries/joins.md:108-152; examples/asof.rfl. Duplicate right
    timestamps: the LAST right row in table order wins (binary-search
    upper bound over the sorted run).

    Spark plan: tag and union both sides, then one window
    ``partitionBy(keys).orderBy(asof, side, row_order)`` with
    ``last(col, ignorenulls=True)`` carrying right values forward onto left
    rows. Exactly one shuffle on the keys; no per-group state; works at any
    rows-per-key cardinality (the window frame is running, not buffered).
    """
    keys = _keys(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != asof]
    out_names = {c: (c + suffix if c in left.columns else c) for c in right_cols}

    # right row order for duplicate-timestamp last-wins
    r = right.select(
        *keys,
        F.col(asof).alias("__rf_t"),
        F.monotonically_increasing_id().alias(_RID),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    ).withColumn(_LEFT_TAG, F.lit(0))

    l = left.withColumn("__rf_t", F.col(asof)).withColumn(_LEFT_TAG, F.lit(1)).withColumn(
        _RID, F.lit(None).cast("long")
    )
    for c in right_cols:
        l = l.withColumn(out_names[c], F.lit(None).cast(r.schema[out_names[c]].dataType))

    u = l.select(*l.columns).unionByName(r, allowMissingColumns=True)

    # strict (<): left rows (tag 1) sort BEFORE right rows (tag 0) at equal
    # time, so a same-time right row is not visible; non-strict: right rows
    # first so last() picks them up.
    side_order = F.col(_LEFT_TAG).desc() if strict else F.col(_LEFT_TAG).asc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__rf_t").asc(), side_order, F.col(_RID).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in u.columns if c not in out_names.values()],
        *[F.last(out_names[c], ignorenulls=True).over(w).alias(out_names[c]) for c in right_cols],
    )
    return (
        filled.filter(F.col(_LEFT_TAG) == 1)
        .drop(_LEFT_TAG, _RID, "__rf_t")
    )


def window_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    time_col: str,
    lo: Column,
    hi: Column,
    aggs: Mapping[str, AggExpr],
    *,
    closed: bool = True,
) -> DataFrame:
    """Window join: per left row, aggregate right rows with
    ``time_col`` in [lo, hi] (closed bounds; ``closed=False`` = open
    bounds, the reference's window-join1 variant), exact-matching the
    leading keys.

    Reference: ref core/join.c:358-488, core/index.c:3287,
    docs queries/joins.md:154-243. ``lo``/``hi`` are expressions over the
    LEFT row (the reference supplies [lo-vec hi-vec]).

    Spark plan: equi-join on keys with the range conjunct (hash join on
    keys, range as post-filter), then re-aggregate on a left row id.
    Skewed keys are split by AQE skew-join. Left rows with no right rows
    in range are preserved (null/zero aggregates) via a left join.
    """
    keys = _keys(on)
    lt = left.withColumn(_LID, F.monotonically_increasing_id()).withColumn(
        "__rf_lo", lo
    ).withColumn("__rf_hi", hi)

    rt_names = {c: f"__rf_r_{c}" for c in right.columns}
    rt = right.select(*[F.col(c).alias(rt_names[c]) for c in right.columns])

    eq = [lt[k] == rt[rt_names[k]] for k in keys]
    t = rt[rt_names[time_col]]
    rng = (t >= lt["__rf_lo"]) & (t <= lt["__rf_hi"]) if closed else (
        (t > lt["__rf_lo"]) & (t < lt["__rf_hi"])
    )
    cond = eq[0]
    for e in eq[1:]:
        cond = cond & e
    joined = lt.join(rt, cond & rng, "left")

    # aggregate right columns per left row; aggs reference right column
    # names — remap them onto the aliased right side.
    agg_cols = []
    for name, a in aggs.items():
        if not isinstance(a, AggExpr) or a.fn is None or a.arg_name is None:
            raise ValueError(
                "window_join aggs must be A.* verbs over right column names"
            )
        out_c = a.fn(F.col(rt_names.get(a.arg_name, a.arg_name)))
        # keep the verb's post-aggregation wrap (e.g. sum's kdb 0 identity,
        # A.sum_'s coalesce) — a left row with no right rows in range must
        # agree with the select/update paths
        agg_cols.append((a.wrap(out_c) if a.wrap else out_c).alias(name))

    left_cols = [c for c in left.columns]
    out = (
        joined.groupBy(_LID, *[lt[c] for c in left_cols])
        .agg(*agg_cols)
        .drop(_LID)
    )
    return out


def insert(target: DataFrame, rows: DataFrame) -> DataFrame:
    """Append rows (ref core/update.c:414, docs queries/insert.md) —
    unionByName; in-place named insert goes through Session.set."""
    return target.unionByName(rows)


def upsert(target: DataFrame, rows: DataFrame, n_keys: int,
           *, order_col: Column | None = None) -> DataFrame:
    """Keyed insert-or-replace; the first ``n_keys`` columns form the key
    (ref core/update.c:556, core/index.c:3001, examples/upsert.rfl).

    Matching keys are replaced by the LAST row for that key in ``rows``
    (reference last-write-wins); new keys are appended.
    """
    keys = list(target.columns[:n_keys])
    fresh = dedup_last(rows.select(*target.columns), keys, order_col)
    kept = target.join(fresh, keys, "left_anti")
    return kept.unionByName(fresh)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    how: str = "inner",
    *,
    salt: int = 16,
) -> DataFrame:
    """Equi-join with explicit key salting for pathological skew.

    For the case AQE's skew-join splitting can't fix: a handful of hot
    keys whose matching RIGHT rows are few but whose LEFT rows flood one
    shuffle partition. The left side gets a deterministic salt in
    [0, salt) (hash of the whole row spread via a row id), the right side
    is replicated ``salt`` times, and the join runs on keys + salt — hot
    keys now spread over ``salt`` partitions. Cost: right side is
    materialized salt x (use only when right is small relative to left but
    above the broadcast threshold). Results are identical to
    ``left.join(right, on, how)`` for 'inner' and 'left'.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = _keys(on)
    lsalt = F.pmod(
        F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)
    ).cast("int")
    l_salted = left.withColumn("__rf_salt", lsalt)
    r_salted = right.withColumn(
        "__rf_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")),
    )
    return (
        l_salted.join(r_salted, [*keys, "__rf_salt"], how)
        .drop("__rf_salt")
    )
