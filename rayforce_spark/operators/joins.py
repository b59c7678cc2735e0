"""Join verbs: left/inner equi-joins, asof join, window join, insert/upsert.

Reference semantics (SURVEY §2.3, ref core/join.c, core/index.c):

* all joins are multi-column equi-key;
* ``left-join`` de-duplicates the right side by key — the hash index maps
  key -> single row, FIRST match wins (ref core/index.c:2886; live-pinned
  r8 against the binary — SURVEY §2.3's "last match wins" reading was
  wrong, and r9 flipped the batch default to keep="first" to match);
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

from rayforce_spark.functions import aggregates as _A
from rayforce_spark.functions.aggregates import AggExpr
from rayforce_spark.functions.kdb import ediv, to_ns

_LEFT_TAG = "__rf_is_left"
_RID = "__rf_rid"
_LID = "__rf_lid"


def _keys(on) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def dedup_last(df: DataFrame, keys: Sequence[str], order_col: Column | None = None,
               *, keep: str = "last") -> DataFrame:
    """Keep one row per key, in table order. Spark has no implicit row
    order, so position is defined by ``order_col`` (default: parquet
    read order via monotonically_increasing_id).

    ``keep="last"`` is the mutation-index rule (upsert overwrites, ref
    core/index.c:2886 last-write-wins); ``keep="first"`` is the JOIN
    probe rule — the reference's left-join/inner-join keep the FIRST
    right row per key (live-pinned r8 against the binary:
    (left-join [k] L R) with R keys [1 1] backfills y from the first
    row; kdb keyed tables keep the first row per key the same way).

    Implemented as a single hash aggregation (max_by/min_by of the
    packed row) — partial/final combine, no sort, no window: at scale
    this is one shuffle with map-side combine, strictly cheaper than
    the row_number-window formulation."""
    if keep not in ("first", "last"):
        raise ValueError(f"dedup_last: keep must be 'first' or 'last', got {keep!r}")
    order_col = order_col if order_col is not None else F.monotonically_increasing_id()
    pick = F.max_by if keep == "last" else F.min_by
    payload = [c for c in df.columns if c not in keys]
    packed = df.select(
        *keys, F.struct(*payload).alias("__rf_row"), order_col.alias("__rf_ord")
    )
    agg = packed.groupBy(*keys).agg(
        pick("__rf_row", "__rf_ord").alias("__rf_row")
    )
    return agg.select(*keys, *[F.col(f"__rf_row.{c}").alias(c) for c in payload])


def left_join(left: DataFrame, right: DataFrame, on: Union[str, Sequence[str]],
              *, dedup: bool = True, order_col: Column | None = None,
              overwrite: bool = False, keep: str = "first") -> DataFrame:
    """Left outer equi-join with reference dedup semantics
    (ref core/join.c:158, core/index.c:2886).

    ``dedup=True`` reproduces the reference's key->single-row index;
    pass False for standard SQL multiplicity. ``keep`` picks which
    duplicate right row survives — the default is "first", the
    reference's own join-probe rule (live-pinned r8 against the binary:
    the hash index keeps the first right row per key, same as kdb keyed
    tables; SURVEY §2.3's earlier "last match wins" reading was wrong).
    r9 flipped the batch default to match — the r1-era "last" default
    was a pre-pin guess; pass keep="last" for last-write-wins
    (the UPSERT rule, which dedup_last keeps as ITS default).

    ``overwrite=True`` applies the reference's (kdb lj) rule for non-key
    columns present on BOTH sides: on a matched row the RIGHT value
    replaces the left one; unmatched rows keep the left value
    (live-pinned vs the reference binary by scripts/ref_diff_tables.py).
    The default keeps Spark's SQL behavior (duplicate columns error),
    which the batch operator surface has always had; the Rayfall
    front-end passes True."""
    keys = _keys(on)
    r = dedup_last(right, keys, order_col, keep=keep) if dedup else right
    if not overwrite:
        return left.join(r, keys, "left")
    overlap = [c for c in r.columns if c in left.columns and c not in keys]
    ren = {c: f"__rf_o_{c}" for c in overlap}
    r = r.select(*keys,
                 *[F.col(c).alias(ren.get(c, c))
                   for c in r.columns if c not in keys],
                 F.lit(1).alias("__rf_m"))
    j = left.join(r, keys, "left")
    matched = F.col("__rf_m").isNotNull()
    out = [F.when(matched, F.col(ren[c])).otherwise(left[c]).alias(c)
           if c in ren else left[c] for c in left.columns]
    extra = [F.col(c) for c in r.columns
             if c not in keys and c not in ren.values() and c != "__rf_m"]
    return j.select(*out, *extra)


def inner_join(left: DataFrame, right: DataFrame, on: Union[str, Sequence[str]],
               *, overwrite: bool = False, dedup: bool = False,
               order_col: Column | None = None, keep: str = "first") -> DataFrame:
    """Inner equi-join (ref core/join.c:200, core/index.c:2930).

    ``overwrite=True``: non-key columns on both sides take the RIGHT
    value (every row is matched) — see :func:`left_join`.

    ``dedup=True`` reproduces the reference's key->single-row index
    (core/index.c:2930 probes a hash index, so each left row matches at
    most ONE right row — the FIRST per key, live-pinned r8, same rule
    as left_join); the default keeps SQL multiplicity, which the batch
    surface has always had. The Rayfall front-end passes True."""
    keys = _keys(on)
    if dedup:
        right = dedup_last(right, keys, order_col, keep=keep)
    if not overwrite:
        return left.join(right, keys, "inner")
    overlap = [c for c in right.columns if c in left.columns and c not in keys]
    ren = {c: f"__rf_o_{c}" for c in overlap}
    r = right.select(*keys,
                     *[F.col(c).alias(ren.get(c, c))
                       for c in right.columns if c not in keys])
    j = left.join(r, keys, "inner")
    out = [F.col(ren[c]).alias(c) if c in ren else left[c]
           for c in left.columns]
    extra = [F.col(c) for c in r.columns
             if c not in keys and c not in ren.values()]
    return j.select(*out, *extra)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    asof: str,
    *,
    right_cols: Sequence[str] | None = None,
    strict: bool = False,
    suffix: str = "_r",
    overwrite: bool = False,
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
    # overwrite=True: reference (kdb aj) rule — a right column that also
    # exists on the left REPLACES the left value on matched rows and
    # keeps the left value where no right row qualifies (live-pinned by
    # scripts/ref_diff_tables.py). Default keeps the suffixing batch API.
    if overwrite:
        out_names = {c: (f"__rf_v_{c}" if c in left.columns else c)
                     for c in right_cols}
    else:
        out_names = {c: (c + suffix if c in left.columns else c)
                     for c in right_cols}

    # right row order for duplicate-timestamp last-wins. __rf_t goes
    # through to_ns so i64-ns-long and Timestamp(NTZ) asof columns — even
    # mixed across the two sides — order in one comparable dtype
    # (the reference dispatches its temporal types at runtime,
    # ref core/ops.h:264-277; Spark dispatches here, statically).
    r = right.select(
        *keys,
        to_ns(F.col(asof), right.schema[asof].dataType).alias("__rf_t"),
        F.monotonically_increasing_id().alias(_RID),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    ).withColumn(_LEFT_TAG, F.lit(0))
    if overwrite:
        r = r.withColumn("__rf_m", F.lit(1))

    l = left.withColumn(
        "__rf_t", to_ns(F.col(asof), left.schema[asof].dataType)
    ).withColumn(_LEFT_TAG, F.lit(1)).withColumn(
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
    carry = list(out_names.values()) + (["__rf_m"] if overwrite else [])
    filled = u.select(
        *[c for c in u.columns if c not in carry],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carry],
    )
    out = filled.filter(F.col(_LEFT_TAG) == 1).drop(_LEFT_TAG, _RID, "__rf_t")
    if overwrite:
        matched = F.col("__rf_m").isNotNull()
        sel = []
        for c in out.columns:
            if c in ("__rf_m",) or c.startswith("__rf_v_"):
                continue
            if f"__rf_v_{c}" in out.columns:
                sel.append(F.when(matched, F.col(f"__rf_v_{c}"))
                           .otherwise(F.col(c)).alias(c))
            else:
                sel.append(F.col(c))
        out = out.select(*sel)
    return out


def window_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    time_col: str,
    lo: Union[Column, int],
    hi: Union[Column, int],
    aggs: Mapping[str, AggExpr],
    *,
    closed: bool = True,
    bounds: str | None = None,
    row_id_col: str | None = None,
) -> DataFrame:
    """Window join: per left row, aggregate right rows with
    ``time_col`` in [lo, hi] (closed bounds = the reference's
    ``window-join1``, ref tests/lang.c:4297-4303; ``closed=False`` = open
    bounds; ``bounds`` in ``"[]" "()" "(]" "[)"`` overrides ``closed``
    for half-open intervals), exact-matching the leading keys. The
    reference's ``window-join`` (kdb wj: prevailing row at window entry +
    half-open window) is :func:`window_join_wj`.

    Reference: ref core/join.c:358-488, core/index.c:3287,
    docs queries/joins.md:154-243. ``lo``/``hi`` are expressions over the
    LEFT row (the reference supplies [lo-vec hi-vec]) — or plain ints,
    read as CONSTANT offsets around the left time (``[t+lo, t+hi]``, ns
    for temporal columns, column units for longs), the reference's own
    benchmark idiom.

    Spark plan: constant offsets with decomposable aggregates route to
    :func:`window_join_fixed` — the block-decomposed running-aggregate
    plan that never enumerates (left, right) pairs (the generic form is
    quadratic on dense keys). Everything else: equi-join on keys with the
    range conjunct (hash join on keys, range as post-filter), then
    re-aggregate on a left row id. Skewed keys are split by AQE
    skew-join. Left rows with no right rows in range are preserved
    (null/zero aggregates) via a left join.
    """
    keys = _keys(on)
    if bounds is None:
        bounds = "[]" if closed else "()"
    if bounds not in ("[]", "()", "(]", "[)"):
        raise ValueError(f"bounds must be one of [] () (] [), got {bounds!r}")
    norm_time = None
    if isinstance(lo, int) and isinstance(hi, int):
        try:
            if bounds not in ("[]", "()"):
                raise ValueError("half-open bounds take the generic plan")
            return window_join_fixed(
                left, right, on, time_col, lo, hi, aggs,
                closed=(bounds == "[]"), row_id_col=row_id_col,
            )
        except ValueError:
            # non-decomposable agg (or degenerate interval): build the
            # offset bounds on the ns shadow and take the generic plan
            t_ns = to_ns(F.col(time_col), left.schema[time_col].dataType)
            lo, hi = t_ns + F.lit(lo), t_ns + F.lit(hi)
            norm_time = True
    lid = (
        F.col(row_id_col) if row_id_col is not None
        else F.monotonically_increasing_id()
    )
    lt = left.withColumn(_LID, lid).withColumn(
        "__rf_lo", lo
    ).withColumn("__rf_hi", hi)

    rt_names = {c: f"__rf_r_{c}" for c in right.columns}
    rt = right.select(*[F.col(c).alias(rt_names[c]) for c in right.columns])

    eq = [lt[k] == rt[rt_names[k]] for k in keys]
    t = rt[rt_names[time_col]]
    if norm_time:
        t = to_ns(t, right.schema[time_col].dataType)
    lo_cmp = (t >= lt["__rf_lo"]) if bounds[0] == "[" else (t > lt["__rf_lo"])
    hi_cmp = (t <= lt["__rf_hi"]) if bounds[1] == "]" else (t < lt["__rf_hi"])
    rng = lo_cmp & hi_cmp
    cond = eq[0]
    for e in eq[1:]:
        cond = cond & e
    joined = lt.join(rt, cond & rng, "left")

    # aggregate right columns per left row; aggs reference right column
    # names — remap them onto the aliased right side.
    agg_cols = []
    # rows-in-window count: the reference's wj NULLS every aggregate
    # except count on an EMPTY window (ref core/aggr.c:150-153 Null
    # branch; live-pinned by scripts/ref_diff_tables.py — sum/avg/min/max
    # null, count 0), so the kdb 0-identity wrap (A.sum_) applies only
    # when at least one right row is in range
    n_in = F.count(rt[rt_names[time_col]])
    for name, a in aggs.items():
        if not isinstance(a, AggExpr) or a.fn is None or a.arg_name is None:
            raise ValueError(
                "window_join aggs must be A.* verbs over right column names"
            )
        out_c = a.fn(F.col(rt_names.get(a.arg_name, a.arg_name)))
        if a.wrap:
            out_c = F.when(n_in > 0, a.wrap(out_c)).otherwise(out_c)
        agg_cols.append(out_c.alias(name))

    left_cols = [c for c in left.columns]
    out = (
        joined.groupBy(_LID, *[lt[c] for c in left_cols])
        .agg(*agg_cols)
        .drop(_LID)
    )
    return out


def window_join_fixed(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    time_col: str,
    lo: int,
    hi: int,
    aggs: Mapping[str, AggExpr],
    *,
    closed: bool = True,
    row_id_col: str | None = None,
) -> DataFrame:
    """Window join for CONSTANT interval offsets (the reference's own
    benchmark idiom ``(map-left + [-10000 10000] ts)``) and decomposable
    aggregates (min/max/sum/count/avg): per left row, aggregate right rows
    with ``time_col`` in [t+lo, t+hi].

    ``row_id_col``: a left column already unique per row (primary key).
    Without it the plan synthesizes monotonic ids and pins them with a
    lazy localCheckpoint (a synthetic id may not be recomputed
    identically across plan fan-out); with it the checkpoint
    materialization is skipped entirely — always pass one when you have
    one.

    Semantics identical to :func:`window_join` with ``lo=col+lo, hi=col+hi``
    (ref core/join.c:358-488); the plan is what changes. The generic form
    enumerates every (left row, in-window right row) pair — with dense
    right rows per key that is O(rows-in-window) per left row, quadratic
    on hot keys (the reference's wj1 bench: 3 symbols, ~100k quotes per
    ±10s window — 1e12 pairs). This form never enumerates pairs:

    Every interval of length B = hi-lo intersects exactly two width-B time
    blocks, so agg([t+lo, t+hi]) = combine(suffix-agg of block b from
    t+lo, prefix-agg of block b+1 up to t+hi). Each left row explodes
    into two PROBE rows (one at t+hi in block b+1, one at t+lo in block
    b) carrying the left payload, unioned with the raw right rows;
    running aggregates over ``partitionBy(keys, block)`` — ascending for
    the prefix, descending for the suffix — read the split values
    directly AT the probe rows, because probe rows carry null values and
    running sum/min/max/count skip nulls. A final row-id fold stitches
    each left row's two halves (and its payload) back together. TWO
    exchanges total — right+probes into the window, probes into the fold
    — no pair blowup, no per-key buffering, no join-back: the
    sorted-merge running-extrema plan the reference hand-codes per key,
    expressed distributively.
    """
    if hi <= lo:
        raise ValueError(f"window_join_fixed needs hi > lo, got [{lo}, {hi}]")
    keys = _keys(on)
    B = int(hi - lo)

    # per-agg partial/running/combine plans keyed by the A.* verb
    def _plan(a: AggExpr):
        if not isinstance(a, AggExpr) or a.fn is None or a.arg_name is None:
            raise ValueError(
                "window_join_fixed aggs must be A.* verbs over right columns"
            )
        both_null_is_null = lambda p, s, v: (  # noqa: E731
            F.when(p.isNull() & s.isNull(), F.lit(None))
            .otherwise(F.coalesce(p, F.lit(0)) + F.coalesce(s, F.lit(0)))
            if v else F.coalesce(p, F.lit(0)) + F.coalesce(s, F.lit(0))
        )
        if a.fn is F.min:
            return [F.min], lambda p, s: F.least(p[0], s[0])
        if a.fn is F.max:
            return [F.max], lambda p, s: F.greatest(p[0], s[0])
        if a.fn is F.sum:
            return [F.sum], lambda p, s: both_null_is_null(p[0], s[0], True)
        if a.fn is F.count:
            # count partials are non-null; sum them, empty window -> 0
            return [F.count], lambda p, s: (
                F.coalesce(p[0], F.lit(0)) + F.coalesce(s[0], F.lit(0))
            )
        if a.fn is F.avg:
            return [F.sum, F.count], lambda p, s: F.try_divide(
                both_null_is_null(p[0], s[0], True),
                F.coalesce(p[1], F.lit(0)) + F.coalesce(s[1], F.lit(0)),
            )
        raise ValueError(
            "window_join_fixed supports min/max/sum/count/avg (decomposable"
            " running aggregates); use window_join for anything else"
        )

    plans = {name: _plan(a) for name, a in aggs.items()}
    arg_names = sorted({a.arg_name for a in aggs.values()})

    # Tie order at equal time: closed bounds include an exactly-at-bound
    # right row, so right rows sort BEFORE probe rows (running agg at the
    # probe sees them); open bounds (window-join1) flip it.
    side_rt, side_pr = (0, 1) if closed else (1, 0)

    # right rows — time through to_ns: offsets and block math run on the
    # canonical i64-ns shadow whether the column is a long or a
    # Timestamp(NTZ) (offsets are then ns / column units respectively).
    # ediv = exact floor-div (double-routed / loses bits above 2^53).
    rt = right.select(
        *keys,
        to_ns(F.col(time_col), right.schema[time_col].dataType).alias("__rf_t"),
        *[F.col(n).alias(f"__rf_r_{n}") for n in arg_names],
    )
    from pyspark.sql.types import StructType

    pay_type = StructType(left.schema.fields)
    # the right-side row-id placeholder must union-type with the probe
    # side's id: a caller-supplied row_id_col may be any unique column
    # (string UUID, int, ...), so mirror its dtype; the synthetic
    # monotonic id is always long.
    lid_type = (
        left.schema[row_id_col].dataType if row_id_col is not None else "long"
    )
    rt = rt.select(
        *keys,
        ediv(F.col("__rf_t"), F.lit(B)).alias("__rf_blk"),
        "__rf_t",
        F.lit(side_rt).alias("__rf_side"),
        F.lit(None).cast(lid_type).alias(_LID),
        F.lit(0).alias("__rf_kind"),
        F.lit(None).cast(pay_type).alias("__rf_pay"),
        *[f"__rf_r_{n}" for n in arg_names],
    )

    # probe rows: each left row explodes into block(t+hi) (reads the
    # running PREFIX there) and block(t+lo) (reads the running SUFFIX),
    # carrying the whole left row as a struct payload. One linear pass —
    # no plan fan-out, so a synthetic monotonic row id is computed once
    # and both probes of a left row always agree on it (task retries
    # recompute the partition as a unit); a caller-supplied key is
    # nicer (stable across runs) but no longer required for correctness.
    lid = (
        F.col(row_id_col) if row_id_col is not None
        else F.monotonically_increasing_id()
    )
    lt_ns = to_ns(F.col(time_col), left.schema[time_col].dataType)
    null_args = [
        F.lit(None).cast(right.schema[n].dataType).alias(f"__rf_r_{n}")
        for n in arg_names
    ]
    # the id select stays SEPARATE from (and below) the explode select:
    # expressions in the same select as a generator are evaluated per
    # OUTPUT row, which would mint two different monotonic ids per left
    # row (observed; nondeterministic exprs are not collapsed through
    # Generate, so a dedicated projection pins the evaluation point)
    base = left.select(
        *keys,
        lid.alias(_LID),
        F.struct(*left.columns).alias("__rf_pay"),
        lt_ns.alias("__rf_lt"),
    )
    probes_src = base.select(
        *keys,
        _LID,
        "__rf_pay",
        F.explode(
            F.array(
                F.struct(
                    (F.col("__rf_lt") + hi).alias("t"), F.lit(1).alias("kind")
                ),
                F.struct(
                    (F.col("__rf_lt") + lo).alias("t"), F.lit(2).alias("kind")
                ),
            )
        ).alias("__rf_pb"),
    ).select(
        *keys,
        ediv(F.col("__rf_pb.t"), F.lit(B)).alias("__rf_blk"),
        F.col("__rf_pb.t").alias("__rf_t"),
        F.lit(side_pr).alias("__rf_side"),
        F.col(_LID),
        F.col("__rf_pb.kind").alias("__rf_kind"),
        "__rf_pay",
        *null_args,
    )

    u = rt.unionByName(probes_src)

    # running prefix (time order) and suffix (reverse) aggregates over
    # right+probe rows together — probe rows carry null values, and
    # running sum/min/max/count skip nulls, so the value AT a probe row
    # IS the block prefix/suffix split this left row needs. One exchange
    # on (keys, block), two in-partition sort orders.
    wasc = (
        Window.partitionBy(*keys, "__rf_blk")
        .orderBy(F.col("__rf_t").asc(), F.col("__rf_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wdesc = (
        Window.partitionBy(*keys, "__rf_blk")
        .orderBy(F.col("__rf_t").desc(), F.col("__rf_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run_cols = []
    for name, (fns, _) in plans.items():
        arg = F.col(f"__rf_r_{aggs[name].arg_name}")
        for i, fn in enumerate(fns):
            run_cols.append(fn(arg).over(wasc).alias(f"__pre_{name}_{i}"))
            run_cols.append(fn(arg).over(wdesc).alias(f"__suf_{name}_{i}"))
    probes = u.select(_LID, "__rf_kind", "__rf_pay", *run_cols).filter(
        F.col("__rf_kind") != 0
    )

    # fold each left row's two probe rows into one (exactly one row per
    # kind per _LID, so any agg picks the value; map-side combine) and
    # recover the left payload — no join back to the left side at all
    hi_probe = F.col("__rf_kind") == 1
    fold_cols = [F.first("__rf_pay").alias("__rf_pay")]
    for name, (fns, _) in plans.items():
        for i in range(len(fns)):
            fold_cols.append(
                F.max(F.when(hi_probe, F.col(f"__pre_{name}_{i}")))
                .alias(f"__pre_{name}_{i}")
            )
            fold_cols.append(
                F.max(F.when(~hi_probe, F.col(f"__suf_{name}_{i}")))
                .alias(f"__suf_{name}_{i}")
            )
    per_lid = probes.groupBy(_LID).agg(*fold_cols)

    out_cols = []
    for name, (fns, comb) in plans.items():
        p = [F.col(f"__pre_{name}_{i}") for i in range(len(fns))]
        s = [F.col(f"__suf_{name}_{i}") for i in range(len(fns))]
        out = comb(p, s)
        # NO a.wrap here: sum's combine already yields null on an empty
        # window, which IS the reference's wj semantics (empty window ->
        # null for sum/avg/min/max, 0 for count — ref core/aggr.c:150-153,
        # live-pinned by scripts/ref_diff_tables.py); the kdb 0-identity
        # coalesce would undo it. (Sub-edge: an in-range right row whose
        # VALUE is null also reads as empty here — the generic plan
        # distinguishes; this fast path trades that for the no-pair plan.)
        out_cols.append(out.alias(name))
    return per_lid.select(
        *[F.col(f"__rf_pay.{c}").alias(c) for c in left.columns], *out_cols
    )


_WID = "__rf_wid"


def window_join_wj(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    time_col: str,
    lo: Union[Column, int],
    hi: Union[Column, int],
    aggs: Mapping[str, AggExpr],
    *,
    row_id_col: str | None = None,
) -> DataFrame:
    """The reference's ``window-join`` — kdb wj convention: per left row
    with window [lo, hi], aggregate the PREVAILING right row (greatest
    right ``time_col`` <= lo, exact-matching the leading keys) together
    with the right rows in the half-open window (lo, hi].

    Semantics pinned by the reference's own tests (ref tests/lang.c:4289:
    windows ±2000ms over quotes at :00/:02/:04 give minBid [99 100] — the
    second window [10:00:03, 10:00:07] contains only Bid 101, so the 100
    is the prevailing quote at window entry) and the docs example's 72501
    lower bound (docs queries/joins.md:183). The bounds-only variant
    ``window-join1`` is :func:`window_join` with ``closed=True``.

    Spark plan: in-window :func:`window_join` on (lo, hi] + :func:`asof_join`
    at the window entry for the prevailing values + an expression-level
    per-verb merge — keyed shuffles only, no per-pair enumeration, scales
    like its two components. Supported verbs: min/max/sum/count/avg/
    first/last/collect (each needs a merge rule for one extra row).

    Int ``lo``/``hi`` are offsets around the left time (ns for temporal
    columns, column units for longs). Column bounds must be in the right
    side's raw column units (pass long/ns columns).
    """
    keys = _keys(on)
    fixed = isinstance(lo, int) and isinstance(hi, int)

    if row_id_col is None:
        # the asof and in-window branches fork the plan from lt; pin the
        # nondeterministic ids so a task retry / AQE replan cannot
        # re-assign them on one branch only (same rationale as
        # items.with_pos_id)
        lt = left.withColumn(_WID, F.monotonically_increasing_id()).localCheckpoint()
        wid = _WID
    else:
        lt, wid = left, row_id_col

    # --- branch 1: in-window aggregation over (lo, hi] -------------------
    # avg merges as (sum + prev)/(count + 1) — decompose it
    inw_aggs: dict[str, AggExpr] = {}
    plans: dict[str, tuple] = {}
    for name, a in aggs.items():
        if not isinstance(a, AggExpr) or a.fn is None or a.arg_name is None:
            raise ValueError("window_join_wj aggs must be A.* verbs over right column names")
        if a.fn is F.avg:
            inw_aggs[f"__wj_s_{name}"] = _A.sum_(a.arg_name)
            inw_aggs[f"__wj_c_{name}"] = _A.count(a.arg_name)
        else:
            inw_aggs[name] = a
        plans[name] = (a.fn, a.arg_name)

    inw = window_join(
        lt, right, on, time_col, lo, hi, inw_aggs,
        bounds="(]", row_id_col=wid,
    )

    # --- branch 2: prevailing right values at window entry ---------------
    if fixed:
        entry = to_ns(F.col(time_col), left.schema[time_col].dataType) + F.lit(lo)
    else:
        entry = lo
    aux = lt.select(*keys, wid, entry.alias(time_col))
    src_cols = sorted({arg for _, arg in plans.values()})
    pv = asof_join(aux, right, keys, time_col, right_cols=src_cols)
    prev_name = {c: (c + "_r" if c in aux.columns else c) for c in src_cols}
    pv = pv.select(F.col(wid), *[F.col(prev_name[c]).alias(f"__wj_p_{c}") for c in src_cols])

    merged = inw.join(pv, wid, "left")

    # --- merge: fold the prevailing row into each aggregate --------------
    out_cols = []
    for name, (fn, arg) in plans.items():
        p = F.col(f"__wj_p_{arg}")
        if fn is F.min:
            e = F.least(F.col(name), p)  # least/greatest skip nulls
        elif fn is F.max:
            e = F.greatest(F.col(name), p)
        elif fn is F.sum:
            # in-window sum is null on an empty window (ref wj semantics,
            # see window_join); fold the prevailing row in without
            # resurrecting a 0 when BOTH sides are absent
            e = (F.when(F.col(name).isNull() & p.isNull(), F.lit(None))
                 .otherwise(F.coalesce(F.col(name), F.lit(0))
                            + F.coalesce(p, F.lit(0))))
        elif fn is F.count:
            e = F.col(name) + F.when(p.isNull(), F.lit(0)).otherwise(F.lit(1))
        elif fn is F.avg:
            s = (F.coalesce(F.col(f"__wj_s_{name}"), F.lit(0))
                 + F.coalesce(p, F.lit(0)))
            c = F.col(f"__wj_c_{name}") + F.when(p.isNull(), F.lit(0)).otherwise(F.lit(1))
            e = F.when(c > 0, s / c)
        elif fn is F.first:
            e = F.coalesce(p, F.col(name))  # prevailing row is earliest
        elif fn is F.last:
            e = F.coalesce(F.col(name), p)
        elif fn is F.collect_list:
            e = F.when(p.isNull(), F.col(name)).otherwise(
                F.concat(F.array(p), F.col(name))
            )
        else:
            raise ValueError(f"window_join_wj: no merge rule for aggregate of {name!r}")
        out_cols.append(e.alias(name))

    return merged.select(*list(left.columns), *out_cols)


def insert(target: DataFrame, rows: DataFrame) -> DataFrame:
    """Append rows (ref core/update.c:414, docs queries/insert.md) —
    unionByName; in-place named insert goes through Session.set."""
    return target.unionByName(rows)


def upsert(target: DataFrame, rows: DataFrame, n_keys: int,
           *, order_col: Column | None = None) -> DataFrame:
    """Keyed insert-or-replace; the first ``n_keys`` columns form the key
    (ref core/update.c:556, core/index.c:3001, examples/upsert.rfl).

    Reference semantics, live-pinned by scripts/ref_diff_tables.py (r7 —
    the old anti-join+append formulation moved updated rows to the end
    and collapsed duplicate-key target rows; the fuzzer caught both):
    * a key already present updates its FIRST matching target row IN
      PLACE — later duplicate-key target rows are untouched — with the
      LAST ``rows`` occurrence winning (hash-index last-write, ref
      core/index.c:2886);
    * keys NOT in the target append EVERY input occurrence, in ``rows``
      order — the batch is matched against the ORIGINAL index, so
      duplicate new keys do not collapse ((upsert t 1 (list [7 7] …))
      appends two rows; live-probed r7 review);

    Plan: one keyed window (row_number per key over a pinned row id)
    marks first occurrences; the deduped ``rows`` side joins in (small
    in practice — AQE broadcasts it); unmatched rows union at the end.
    The output restores (target order, then input order) with an
    explicit sort — row position is part of this verb's semantics, so
    the sort is the contract, not overhead."""
    from pyspark.sql import Window

    keys = list(target.columns[:n_keys])
    val_cols = [c for c in target.columns if c not in keys]
    rin = rows.select(*target.columns).withColumn(
        "__rf_pos",
        order_col if order_col is not None
        else F.monotonically_increasing_id())
    fresh = dedup_last(rin, keys, F.col("__rf_pos"))
    f2 = fresh.select(
        *keys, F.lit(True).alias("__rf_hit"),
        *[F.col(c).alias(f"__rf_u_{c}") for c in val_cols])
    t = target.withColumn("__rf_tord", F.monotonically_increasing_id())
    t = t.withColumn(
        "__rf_occ",
        F.row_number().over(Window.partitionBy(*keys).orderBy("__rf_tord")))
    hit = F.col("__rf_hit").isNotNull() & (F.col("__rf_occ") == 1)
    updated = (
        t.join(f2, keys, "left")
        .select(
            *keys,
            *[F.when(hit, F.col(f"__rf_u_{c}")).otherwise(F.col(c)).alias(c)
              for c in val_cols],
            "__rf_tord")
        .orderBy("__rf_tord").select(*target.columns)
    )
    appended = (
        rin.join(target.select(*keys).distinct(), keys, "left_anti")
        .orderBy("__rf_pos").select(*target.columns)
    )
    # per-branch sorts (order_col may be any orderable type, so the two
    # order domains never mix); union concatenates the sorted branches
    return updated.unionByName(appended)


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
