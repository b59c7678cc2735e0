"""Dtype-parity property tests for the temporal layer.

The class of bug that cost round 3 its gate: the fixture's ``events.ts``
flipped from i64-ns longs to ``timestamp[us]`` parquet and every temporal
operator broke. The engine's contract is now: every temporal operator
accepts BOTH the canonical i64-ns LongType shadow (SURVEY §1.2) and
Spark Timestamp(NTZ) columns, with identical results (the reference
dispatches its temporal types at runtime, ref core/ops.h:264-277; we
dispatch statically via ``functions/kdb.to_ns``).

Strategy: build one event log from a seeded RNG, materialize it twice —
``ts`` as ns-longs and as TIMESTAMP_NTZ — run each operator on both, and
require row-identical output. Inputs include duplicate timestamps per
key (asof last-wins tiebreak), pre-epoch timestamps (negative ns:
floor-division/ms_of_day edge), and gap boundaries (exactly-equal-to-gap
deltas must NOT break a session).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from rayforce_spark import A, K
from rayforce_spark.datapipe import sessionize_batch
from rayforce_spark.operators.joins import asof_join, window_join, window_join_fixed

SEC_NS = 1_000_000_000
GAP_NS = 600 * SEC_NS  # 10 min


def _make_events(spark, n=400, seed=7, pre_epoch=False):
    """(user_id, ts_ns, value, event_id) rows with dup timestamps and
    exact-gap deltas; ts values are µs-aligned so the Timestamp(NTZ) twin
    (µs precision) is lossless."""
    rng = random.Random(seed)
    base = -3 * 86_400 * SEC_NS if pre_epoch else 1_700_000_000 * SEC_NS
    rows = []
    t = base
    for i in range(n):
        step_choices = [0, 1_000, SEC_NS, 30 * SEC_NS, GAP_NS, GAP_NS + 1_000]
        t += rng.choice(step_choices)
        rows.append((rng.randrange(5), t, rng.random() * 100, i))
    df = spark.createDataFrame(
        rows, "user_id INT, ts_ns LONG, value DOUBLE, event_id LONG"
    )
    long_df = df.withColumn("ts", F.col("ts_ns")).drop("ts_ns")
    # K.ns_to_us: exact decimal division (plain /1000 routes the 1.7e18
    # ns epoch through double and silently loses microseconds)
    ts_df = df.withColumn(
        "ts",
        F.timestamp_micros(K.ns_to_us("ts_ns")).cast("timestamp_ntz"),
    ).drop("ts_ns")
    assert isinstance(long_df.schema["ts"].dataType, LongType)
    assert isinstance(ts_df.schema["ts"].dataType, TimestampNTZType)
    return long_df, ts_df


def _rows(df, ts_cols=()):
    """Collected rows with any temporal column normalized to ns for the
    cross-dtype compare (output bounds keep the input's dtype by design)."""
    for c in ts_cols:
        if c in df.columns and not isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, K.to_ns(F.col(c), df.schema[c].dataType))
    return sorted([tuple(r) for r in df.collect()], key=repr)


@pytest.mark.parametrize("pre_epoch", [False, True])
def test_asof_join_dtype_parity(spark, pre_epoch):
    for side in ("long", "ts", "mixed"):
        l_long, l_ts = _make_events(spark, seed=1, pre_epoch=pre_epoch)
        r_long, r_ts = _make_events(spark, n=150, seed=2, pre_epoch=pre_epoch)
        right_cols = {"value": "click_value", "event_id": "click_id"}
        rl = r_long.select("user_id", "ts", *[F.col(k).alias(v) for k, v in right_cols.items()])
        rt = r_ts.select("user_id", "ts", *[F.col(k).alias(v) for k, v in right_cols.items()])
        if side == "long":
            out = asof_join(l_long, rl, on="user_id", asof="ts")
        elif side == "ts":
            out = asof_join(l_ts, rt, on="user_id", asof="ts")
        else:  # long left, timestamp right — to_ns makes them comparable
            out = asof_join(l_long, rt, on="user_id", asof="ts")
        got = _rows(out.select("user_id", "event_id", "click_id"), ())
        if side == "long":
            baseline = got
        else:
            assert got == baseline, f"asof_join diverges for {side} input"


@pytest.mark.parametrize("pre_epoch", [False, True])
def test_window_join_dtype_parity(spark, pre_epoch):
    l_long, l_ts = _make_events(spark, seed=3, pre_epoch=pre_epoch)
    r_long, r_ts = _make_events(spark, n=150, seed=4, pre_epoch=pre_epoch)
    aggs = {
        "n_click": A.count("value"),
        "sum_click": A.sum_("value"),
        "max_click": A.max_("value"),
    }
    lo, hi = -60 * SEC_NS, 60 * SEC_NS
    # sums are rounded: the block-decomposed plan adds the same values in
    # a different association order than the pair-enumerating plan, and fp
    # addition drifts in the last ulp (seeded data, deterministic compare)
    cols = [
        "user_id", "event_id", "n_click",
        F.round("sum_click", 6).alias("sum_click"), "max_click",
    ]
    outs = {}
    for name, (l, r) in {
        "long_fixed": (l_long, r_long),
        "ts_fixed": (l_ts, r_ts),
    }.items():
        out = window_join_fixed(l, r, on="user_id", time_col="ts",
                                lo=lo, hi=hi, aggs=aggs)
        outs[name] = _rows(out.select(*cols))
    # the generic pair-enumerating plan on ns-longs is the semantic oracle
    ref = window_join(
        l_long, r_long, on="user_id", time_col="ts",
        lo=F.col("ts") + F.lit(lo), hi=F.col("ts") + F.lit(hi), aggs=aggs,
    )
    ref_rows = _rows(ref.select(*cols))
    assert outs["long_fixed"] == ref_rows
    assert outs["ts_fixed"] == ref_rows


def test_window_join_int_offsets_route(spark):
    # plain-int lo/hi goes through the block-decomposed fixed plan and
    # must agree with the Column-expression generic form
    l_long, _ = _make_events(spark, seed=5)
    r_long, _ = _make_events(spark, n=150, seed=6)
    aggs = {"n_click": A.count("value"), "min_click": A.min_("value")}
    auto = window_join(l_long, r_long, on="user_id", time_col="ts",
                       lo=-30 * SEC_NS, hi=30 * SEC_NS, aggs=aggs)
    generic = window_join(
        l_long, r_long, on="user_id", time_col="ts",
        lo=F.col("ts") - F.lit(30 * SEC_NS),
        hi=F.col("ts") + F.lit(30 * SEC_NS), aggs=aggs,
    )
    cols = ["user_id", "event_id", "n_click", "min_click"]
    assert _rows(auto.select(*cols)) == _rows(generic.select(*cols))


@pytest.mark.parametrize("pre_epoch", [False, True])
def test_sessionize_dtype_parity(spark, pre_epoch):
    l_long, l_ts = _make_events(spark, seed=8, pre_epoch=pre_epoch)
    kw = dict(key_col="user_id", ts_col="ts", gap=GAP_NS,
              tiebreak=["event_id"])
    a = sessionize_batch(l_long, **kw)
    b = sessionize_batch(l_ts, **kw)
    cols = ["user_id", "session_seq", "session_start", "session_end", "n_events"]
    assert _rows(a.select(*cols), ("session_start", "session_end")) == \
        _rows(b.select(*cols), ("session_start", "session_end"))


def test_ms_of_day_truncated_reference_parity(spark):
    # reference timestamp_to_time is C truncated %/: pre-epoch -> negative
    # (ref core/ops.h:269); the default floor-mod form gives a clock value
    rows = [(-1_234_567_000,), (1_234_567_000,)]  # ns: -1.234567s, +1.234567s
    df = spark.createDataFrame(rows, "ts LONG")
    out = df.select(
        K.ms_of_day("ts").alias("clock"),
        K.ms_of_day("ts", truncated=True).alias("trunc"),
    ).collect()
    pre, post = out[0], out[1]
    assert pre.trunc == -1234 and pre.clock == 86_400_000 - 1235
    assert post.trunc == 1234 and post.clock == 1234


@pytest.mark.parametrize("pre_epoch", [False, True])
def test_scalar_temporal_dtype_parity(spark, pre_epoch):
    l_long, l_ts = _make_events(spark, seed=9, pre_epoch=pre_epoch)
    lt, tt = l_long.schema["ts"].dataType, l_ts.schema["ts"].dataType
    a = l_long.select(
        "event_id",
        K.to_ns("ts", lt).alias("ns"),
        K.ns_to_us("ts", lt).alias("us"),
        K.ns_to_timestamp("ts", lt).alias("t"),
        K.ms_of_day("ts", lt).alias("ms"),
        K.xbar_time(3600, "ts", lt).alias("bar"),
    )
    b = l_ts.select(
        "event_id",
        K.to_ns("ts", tt).alias("ns"),
        K.ns_to_us("ts", tt).alias("us"),
        K.ns_to_timestamp("ts", tt).alias("t"),
        K.ms_of_day("ts", tt).alias("ms"),
        K.xbar_time(3600, "ts", tt).alias("bar"),
    )
    assert _rows(a) == _rows(b)
