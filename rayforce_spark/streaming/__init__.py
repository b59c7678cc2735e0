"""Streaming analogs (SURVEY §1.3, §2.9).

The reference's streaming story is: timers (ref core/chrono.c:361), an
async IPC event loop (ref core/poll.h), in-place inserts into session
tables (examples/sesslog.rfl), and journaling — write expressions to a
file handle, replay them with read (examples/journal.rfl,
ref core/io.c:214,343).

Structured Streaming subsumes all of it: the journal becomes an
append-only file source, timers become triggers, session-table inserts
become foreachBatch sinks, and xbar time-bucketing becomes windowed
aggregation with watermarks (a capability the reference lacks — exposed,
not invented: late-data semantics are Spark's documented ones).
"""

from rayforce_spark.streaming.journal import (
    Journal,
    read_journal_stream,
    replay_journal,
)
from rayforce_spark.streaming.ops import (
    stream_decontaminate,
    stream_dedup,
    stream_jaccard_index_ingest,
    stream_minhash_index_ingest,
    stream_simhash_index_ingest,
    stream_window_join,
    stream_xbar_agg,
    timer,
)
from rayforce_spark.streaming.stateful import (
    sessionize,
    stream_embedding_neardup,
    stream_neardup,
)

__all__ = [
    "Journal",
    "read_journal_stream",
    "replay_journal",
    "sessionize",
    "stream_decontaminate",
    "stream_dedup",
    "stream_embedding_neardup",
    "stream_jaccard_index_ingest",
    "stream_minhash_index_ingest",
    "stream_neardup",
    "stream_simhash_index_ingest",
    "stream_window_join",
    "stream_xbar_agg",
    "timer",
]
