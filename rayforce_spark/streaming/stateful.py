"""Custom stateful streaming operators via applyInPandasWithState.

The reference's stateful idiom is a session table mutated by timer
callbacks and incoming IPC messages (examples/sesslog.rfl, timers
ref core/chrono.c:361). The Spark-native form is keyed state in a
streaming query: per-key state survives across micro-batches, with
timeout-driven finalization replacing the reference's timer sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionize(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts_sec",
    value_col: str = "value",
    gap_sec: int = 1800,
) -> DataFrame:
    """Gap-based sessionization with explicit keyed state: emits one row
    per closed session (key, session_start, session_end, n_events,
    sum_value). Sessions close when ``gap_sec`` passes without an event
    for the key (processing-time timeout finalizes idle keys).

    State per key is four scalars — O(keys) memory, checkpointed by the
    engine; this is the applyInPandasWithState shape any custom stateful
    operator (counters, CDC folding, online aggregates) follows.
    """
    out_schema = (
        f"{key_col} long, session_start double, session_end double, "
        "n_events long, sum_value double"
    )
    state_schema = "start double, last double, n long, total double"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (k,) = key
        closed = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                closed.append((k, start, last, n, total))
                state.remove()
        else:
            ts_all, v_all = [], []
            for pdf in pdfs:
                ts_all.extend(pdf[ts_col].tolist())
                v_all.extend(pdf[value_col].tolist())
            order = sorted(range(len(ts_all)), key=lambda i: ts_all[i])
            if state.exists:
                start, last, n, total = state.get
            else:
                start = last = None
                n, total = 0, 0.0
            for i in order:
                t, v = float(ts_all[i]), float(v_all[i])
                if last is not None and t - last > gap_sec:
                    closed.append((k, start, last, n, total))
                    start, n, total = t, 0, 0.0
                if start is None:
                    start = t
                last = t
                n += 1
                total += v
            state.update((start, last, n, total))
            state.setTimeoutDuration(gap_sec * 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[key_col, "session_start", "session_end",
                         "n_events", "sum_value"],
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
