"""Streaming operators: timer triggers and windowed (xbar) aggregation.

ref core/chrono.c:361 (ray_timer: interval callbacks on the event loop),
docs xbar time-bucketing idiom. The reference has no watermark/late-data
concept; Spark's is exposed as-is.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_xbar_agg(
    stream: DataFrame,
    ts_col: str,
    window: str,
    aggs: dict[str, Column],
    *,
    by: list[str] | None = None,
    watermark: str = "10 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling- (or, with ``slide``, sliding-) window aggregation — the
    streaming form of the reference's ``(select {… by: {bar: (xbar N
    time)}})`` idiom. ``window`` is a Spark interval string ("5 minutes");
    watermark bounds state for late data. A ``slide`` shorter than
    ``window`` emits overlapping bars (each event lands in
    window/slide bars) — the reference has no sliding idiom short of a
    window-join; here it's the same groupBy.

    Accepts either temporal shape (Timestamp(NTZ) or the engine's i64-ns
    shadow longs — watermarks need a timestamp, so ns-longs get one
    projection through ns_to_timestamp first).
    """
    from pyspark.sql.types import LongType

    from rayforce_spark.functions.kdb import ns_to_timestamp

    if isinstance(stream.schema[ts_col].dataType, LongType):
        stream = stream.withColumn(ts_col, ns_to_timestamp(ts_col))
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide else F.window(F.col(ts_col), window)
    )
    keys = [win.alias("bar")] + [F.col(c) for c in (by or [])]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )


def timer(
    stream_df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    *,
    interval: str = "5 seconds",
    checkpoint: str | None = None,
    output_mode: str = "update",
) -> StreamingQuery:
    """(timer interval fn) — ref core/chrono.c:361. The callback receives
    each micro-batch (DataFrame, batch_id) on the trigger cadence via
    foreachBatch; state/offsets are checkpointed instead of the
    reference's in-process timer heap."""
    writer = (
        stream_df.writeStream.outputMode(output_mode)
        .foreachBatch(fn)
        .trigger(processingTime=interval)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
