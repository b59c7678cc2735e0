"""Checkpoint recovery for the stateful streaming operators.

The 100 TB streaming story depends on state surviving a restart: a
sessionize query is stopped cold after consuming half its input, then
restarted from the SAME checkpoint over the same sink, and the combined
output must equal the batch twin exactly — sessions spanning the restart
boundary prove the applyInPandasWithState state was restored, and the
parquet sink's manifest proves no duplicated or lost batches
(exactly-once file sink semantics).
"""

import time

from pyspark.sql import functions as F

from rayforce_spark.streaming import Journal, read_journal_stream
from rayforce_spark.streaming.stateful import sessionize


def _run_until_done(out, sink, ckpt, timeout=240, expect_rows=None):
    """Run until all available input is committed, then stop.

    availableNow does not self-terminate under a ProcessingTimeTimeout
    stateful op (it keeps scheduling batches to fire pending timeouts),
    so poll: done when the query terminated on its own OR two DISTINCT
    zero-input batches committed after all expected input rows. The
    determinism fixes over the r11 shape (which flaked under full-suite
    load — r11 verdict #4):

    - progress is read from ``recentProgress`` (the ~100-entry buffer),
      deduped by batchId — NOT ``lastProgress``, which only reports the
      single most recent finished batch: under load the data batch's
      progress is replaced by follow-on timeout batches before the
      first 2-second poll ever sees it, so any lastProgress-based
      accounting either misses data rows (livelock against an
      expect_rows gate) or double-counts a slow batch across two polls
      (the original early-stop flake);
    - with ``expect_rows``, zero-input batches only count once that many
      input rows have committed — the kill point is pinned to a known
      stream position instead of racing the source's pickup latency.
    """
    q = (
        out.writeStream.outputMode("append")
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + timeout
    seen_batches = set()
    rows = 0
    zero_runs = 0
    try:
        while time.time() < deadline:
            if q.awaitTermination(2):
                return
            for lp in q.recentProgress:  # oldest..newest, ~last 100
                if lp["batchId"] in seen_batches:
                    continue
                seen_batches.add(lp["batchId"])
                if lp["numInputRows"] > 0:
                    rows += lp["numInputRows"]
                    zero_runs = 0
                elif expect_rows is None or rows >= expect_rows:
                    zero_runs += 1
            if zero_runs >= 2:
                return
        raise AssertionError(
            f"query did not drain in time (committed {rows} rows,"
            f" expected {expect_rows})")
    finally:
        q.stop()


def test_sessionize_survives_restart_mid_stream(spark, tmp_path):
    jpath = str(tmp_path / "log")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts_sec double, value double"
    gap = 100.0

    j = Journal(jpath, schema)
    # phase-1 events: user 1 session A (0,10), session B starts at 500;
    # user 2 session (100, 120) — session B and user 2's stay OPEN in
    # state at shutdown
    j.append([
        {"user_id": 1, "ts_sec": 0.0, "value": 1.0},
        {"user_id": 1, "ts_sec": 10.0, "value": 2.0},
        {"user_id": 2, "ts_sec": 100.0, "value": 5.0},
    ])
    j.append([
        {"user_id": 1, "ts_sec": 500.0, "value": 3.0},
        {"user_id": 2, "ts_sec": 120.0, "value": 7.0},
    ])

    def stream():
        return sessionize(
            read_journal_stream(spark, jpath, schema), gap_sec=gap)

    _run_until_done(stream(), sink, ckpt, expect_rows=5)

    # cold restart: phase-2 events CONTINUE session B (510 is within the
    # gap of 500 — only restored state can know that) and then close
    # everything via per-user sentinels
    j.append([
        {"user_id": 1, "ts_sec": 510.0, "value": 4.0},
        {"user_id": 2, "ts_sec": 130.0, "value": 9.0},
    ])
    j.append([
        {"user_id": 1, "ts_sec": 10_000.0, "value": 0.0},
        {"user_id": 2, "ts_sec": 10_000.0, "value": 0.0},
    ])
    _run_until_done(stream(), sink, ckpt, expect_rows=4)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {
        (1, 0.0, 10.0, 2, 3.0),      # closed in phase 1
        (2, 100.0, 130.0, 3, 21.0),  # spans the restart boundary
        (1, 500.0, 510.0, 2, 7.0),   # event 510 joined restored state
    }


def test_file_sink_is_exactly_once_across_restart(spark, tmp_path):
    # stateless pipeline, same contract: re-running from the checkpoint
    # must not duplicate already-committed batches in the sink manifest
    jpath = str(tmp_path / "log2")
    sink = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    schema = "k long, v double"
    j = Journal(jpath, schema)
    j.append([{"k": i, "v": float(i)} for i in range(100)])

    def stream():
        return (read_journal_stream(spark, jpath, schema)
                .withColumn("v2", F.col("v") * 2))

    _run_until_done(stream(), sink, ckpt, expect_rows=100)
    # restart with NO new data, then with new data
    _run_until_done(stream(), sink, ckpt)
    j.append([{"k": i, "v": float(i)} for i in range(100, 150)])
    _run_until_done(stream(), sink, ckpt, expect_rows=50)

    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 150
    assert {r.k for r in rows} == set(range(150))
    assert all(r.v2 == 2.0 * r.k for r in rows)
