"""Custom stateful streaming operator (applyInPandasWithState)."""

import time

from rayforce_spark.streaming import Journal, read_journal_stream
from rayforce_spark.streaming.stateful import sessionize


def test_sessionize_closes_on_gap(spark, tmp_path):
    jpath = str(tmp_path / "sess")
    schema = "user_id long, ts_sec double, value double"
    j = Journal(jpath, schema)
    # user 1: two sessions separated by > gap; user 2: one session
    j.append([
        {"user_id": 1, "ts_sec": 0.0, "value": 1.0},
        {"user_id": 1, "ts_sec": 10.0, "value": 2.0},
        {"user_id": 1, "ts_sec": 5000.0, "value": 7.0},
        {"user_id": 2, "ts_sec": 100.0, "value": 5.0},
    ])
    stream = read_journal_stream(spark, jpath, schema)
    out = sessionize(stream, gap_sec=1800)
    # NB: with ProcessingTimeTimeout the stateful operator requests a batch
    # every trigger to fire pending timeouts, so the query never drains —
    # poll the sink for the expected row instead of processAllAvailable().
    q = (
        out.writeStream.outputMode("append")
        .format("memory").queryName("sessions").start()
    )
    try:
        deadline = time.time() + 120
        rows = {}
        while time.time() < deadline:
            rows = {
                (r.user_id, r.session_start): (r.n_events, r.sum_value)
                for r in spark.sql("SELECT * FROM sessions").collect()
            }
            if rows:
                break
            time.sleep(0.5)
        # the first session of user 1 closed because a later event crossed
        # the gap; open sessions (u1 second, u2) remain in state
        assert rows == {(1, 0.0): (2, 3.0)}
    finally:
        q.stop()
