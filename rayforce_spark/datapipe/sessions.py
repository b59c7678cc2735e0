"""Batch sessionization — the offline twin of streaming.stateful.sessionize.

The reference's session idiom is a timer-swept in-memory session table
(examples/sesslog.rfl, ref core/chrono.c:361); the batch form used by
large-scale pipelines (user journeys, conversation threading, log
chunking) is fully declarative: flag gap breaks with a lag window, turn
the flags into session ordinals with a running sum, aggregate per
(key, session). Two window passes + one aggregation, all on the same
partition key — Catalyst plans a single shuffle on ``key_col``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rayforce_spark.functions.kdb import to_ns


def sessionize_batch(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    gap: float | int,
    aggs: dict[str, Column] | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Assign gap-based sessions and aggregate one row per session.

    A new session starts when the time since the key's previous event
    exceeds ``gap`` (ns for Timestamp(NTZ) columns, column units for
    longs — the gap test runs on the i64-ns shadow either way, so both
    temporal dtypes sessionize identically). Returns
    (key, session_seq, session_start, session_end, n_events, **aggs) —
    ``session_seq`` is the 1-based session ordinal per key; the session
    bounds keep ``ts_col``'s own dtype. Pass ``tiebreak`` columns to make
    the event order (and hence lag) deterministic when timestamps collide.
    """
    order = [ts_col, *(tiebreak or [])]
    tns = to_ns(F.col(ts_col), df.schema[ts_col].dataType)
    w = Window.partitionBy(key_col).orderBy(*order)
    is_break = (
        F.when(F.lag(ts_col).over(w).isNull(), 1)
        .when(tns - F.lag(tns).over(w) > gap, 1)
        .otherwise(0)
    )
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessioned = df.withColumn("__brk", is_break).withColumn(
        "session_seq", F.sum("__brk").over(run)
    )
    extra = aggs or {}
    return (
        sessioned.groupBy(key_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            *[c.alias(n) for n, c in extra.items()],
        )
    )
