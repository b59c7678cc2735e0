"""Batch-vs-stream equivalence harness (STREAMCHECK).

The streaming family (streaming/stateful.py, streaming/ops.py) cannot be
oracle-gated through DuckDB — stateful micro-batch semantics aren't
SQL-expressible — so this harness provides the equivalent evidence: feed
the SAME sf0.01 rows through each streaming operator (journal file
source, one file per micro-batch) AND through its batch twin, and assert
exact multiset equality of the results.

Per-operator equivalence contracts (how streaming-only semantics are
made comparable):
* sessionize — a stream emits only CLOSED sessions, so a per-key
  sentinel event far beyond the gap is appended to the FEED (not the
  batch input): every real session closes; sentinel sessions stay open
  in state and are never emitted. Batch twin: sessions.sessionize_batch.
* asof join — left rows emit once the event-time watermark passes them,
  so a per-key right-side flush row at max_ts + 1 day is appended to the
  feed; flush rows cannot match any real left row (asof takes <=).
  Batch twin: joins.asof_join (right side pre-deduped to unique
  (key, ts) so last-wins tie order can't differ between table order and
  arrival order).
* window join — stream-stream interval join emits matches as both sides
  arrive; no flush needed for inner. Batch twin: the same interval-join
  condition on static frames.
* dedup — duplicates are fed as exact row copies within the watermark;
  any surviving representative equals any other. Batch twin:
  dropDuplicates on the keys.
* minhash near-dup — state caps/TTL are sized so nothing evicts; the
  stream scores each doc against every EARLIER doc in its band bucket,
  so after (id_a, id_b)-dedup the pair set equals the batch all-pairs-
  per-bucket rule computed with the SAME signature/band expressions.
* embedding near-dup — same argument per (table, bucket); batch twin is
  similarity.embedding_dup_pairs_lsh with identical
  planes/tables/seed/threshold.
* xbar agg — complete-mode memory sink vs a batch window groupBy.
* decontaminate — map-only (precomputed eval gram set probed
  row-locally), so append mode drains deterministically; the row runs
  BOTH membership impls (plan-literal expr / broadcast+searchsorted
  pandas) and requires stream==batch AND expr==pandas.

Floats are rounded to 6 dp on both sides before comparison (the stream
sums in arrival order, the batch in partition order — same f64 math,
different association). All inputs are replayed from the SAME journal
files the stream reads, so both sides see bit-identical values.

Usage: python scripts/streamcheck.py [sf_dir]
Writes STREAMCHECK.json + STREAMCHECK.md at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
STABLE_SECS = 8
TIMEOUT_SECS = 300

# When True (the second, crash-recovery pass over CHECKS), every
# _stream_table call runs the kill-and-resume protocol instead of a
# clean run: durable sink + checkpoint, stop the query after >=1
# committed non-empty micro-batch (maxFilesPerTrigger=1 guarantees
# files remain), restart from the same checkpoint, then apply the
# normal drain/settle/stability poll. The caller-facing contract is
# unchanged: a DataFrame of the final sink contents.
RECOVERY = False


def _stream_table(spark, out_df, name, mode="append", expect_input=None):
    if RECOVERY:
        return _stream_table_restart(spark, out_df, name, mode,
                                     expect_input)
    return _stream_table_clean(spark, out_df, name, mode, expect_input)


def _committed_rows(q, acc: dict) -> int:
    for p in q.recentProgress:
        acc[p.batchId] = p.numInputRows
    return sum(acc.values())


def _stream_table_restart(spark, out_df, name, mode="append",
                          expect_input=None):
    """Kill-and-resume: prove the stateful ops' exactly-once claims —
    state restores from the checkpoint and the durable sink doesn't
    double-emit (the file sink's metadata log dedups, the complete-mode
    memory sink recomputes). Phase 1 stops the query as soon as one
    non-empty micro-batch has committed; phase 2 restarts the SAME plan
    on the SAME checkpoint and drains."""
    base = tempfile.mkdtemp(prefix=f"screcov_{name}_")
    ck, sink = os.path.join(base, "ck"), os.path.join(base, "out")

    def start():
        w = (out_df.writeStream.outputMode(mode)
             .option("checkpointLocation", ck))
        if mode == "complete":  # file sinks can't do complete
            return w.format("memory").queryName(name).start()
        return w.format("parquet").option("path", sink).start()

    def table():
        return (spark.table(name) if mode == "complete"
                else spark.read.parquet(sink))

    # one dict across BOTH phases, keyed by batchId: a micro-batch the
    # restarted query replays (same checkpoint, same batchId — the sink
    # dedups it) overwrites its phase-1 entry instead of double-counting
    # toward the drain check
    seen: dict[int, int] = {}
    q = start()
    try:
        deadline = time.time() + TIMEOUT_SECS
        while time.time() < deadline:
            if _committed_rows(q, seen) > 0:
                break
            time.sleep(0.2)
    finally:
        q.stop()
    _committed_rows(q, seen)  # final accounting after stop

    q = start()
    try:
        seen2: dict[int, int] = {}
        last_batch_rows = None
        last_n, last_change = -1, time.time()
        deadline = time.time() + TIMEOUT_SECS
        while time.time() < deadline:
            _committed_rows(q, seen2)
            seen.update(seen2)
            if seen2:
                last_batch_rows = seen2[max(seen2)]
            drained = (expect_input is None
                       or sum(seen.values()) >= expect_input)
            settled = (last_batch_rows == 0
                       or not q.status.get("isTriggerActive", False))
            try:
                n = table().count()
            except Exception:  # sink not yet materialized
                n = -1
            if n != last_n:
                last_n, last_change = n, time.time()
            elif (drained and settled
                  and time.time() - last_change > STABLE_SECS):
                break
            time.sleep(0.5)
    finally:
        q.stop()
    # detach the result from the on-disk sink so the scratch dir (full
    # parquet sink + checkpoint) can be removed — it otherwise
    # accumulates sf-sized data in /tmp across the 8x2-scale sweeps
    out = table().localCheckpoint(eager=True)
    shutil.rmtree(base, ignore_errors=True)
    return out


def _stream_table_clean(spark, out_df, name, mode="append", expect_input=None):
    """Run a streaming DataFrame into a memory sink until the row count
    is stable for STABLE_SECS. Two sharp edges, both hit in r7:
    * processAllAvailable() is NOT usable here — the stateful ops use
      ProcessingTimeTimeout, whose timeout-only empty micro-batches keep
      committing after the data drains, so pAA spins for the full state
      TTL (observed: 800+ stages churning a saturated box);
    * a bare stability poll races a slow first micro-batch (at sf0.1,
      0 rows after 8 quiet seconds read as 'done' — recorded as a false
      MISMATCH). So when the caller passes ``expect_input`` (the fed row
      count — every feed is fully written before start), the poll
      refuses to exit until the query's cumulative numInputRows reaches
      it, then applies the stability window on top."""
    q = (out_df.writeStream.outputMode(mode)
         .format("memory").queryName(name).start())
    try:
        seen_batches: dict[int, int] = {}
        last_batch_rows = None
        last_n, last_change = -1, time.time()
        deadline = time.time() + TIMEOUT_SECS
        while time.time() < deadline:
            for p in q.recentProgress:
                seen_batches[p.batchId] = p.numInputRows
            if seen_batches:
                last_batch_rows = seen_batches[max(seen_batches)]
            drained = (expect_input is None
                       or sum(seen_batches.values()) >= expect_input)
            # a committed final-data batch may still be FOLLOWED by a
            # slow watermark/timeout emission batch (sf0.1 asof: 100k
            # emissions land in the batch AFTER the flush rows) — don't
            # read a quiet sink as done while such a batch is active:
            # settled = the query is idle, or its latest committed batch
            # consumed no input (timeout-churn steady state)
            settled = (last_batch_rows == 0
                       or not q.status.get("isTriggerActive", False))
            n = spark.sql(f"SELECT count(*) FROM {name}").first()[0]
            if n != last_n:
                last_n, last_change = n, time.time()
            elif (drained and settled
                  and time.time() - last_change > STABLE_SECS):
                break
            time.sleep(0.5)
    finally:
        q.stop()
    return spark.table(name)


def _canon(df):
    return Counter(tuple(r) for r in df.collect())


def _feed(tmp, name, schema, batches):
    from rayforce_spark.streaming import Journal

    path = os.path.join(tmp, name)
    j = Journal(path, schema)
    for rows in batches:
        j.append(rows)
        time.sleep(0.02)  # distinct mtimes -> deterministic file order
    return path


def _chunks(rows, n_files):
    k = max(1, -(-len(rows) // n_files))
    return [rows[i:i + k] for i in range(0, len(rows), k)]


def _result(name, stream_df, batch_df, notes=""):
    s, b = _canon(stream_df), _canon(batch_df)
    match = s == b
    extra = ""
    if not match:
        only_s = list((s - b).items())[:3]
        only_b = list((b - s).items())[:3]
        extra = f" stream-only={only_s} batch-only={only_b}"
    return {
        "op": name,
        "match": match,
        "stream_rows": sum(s.values()),
        "batch_rows": sum(b.values()),
        "notes": notes + extra,
    }


def check_sessionize(spark, t, tmp):
    from pyspark.sql import functions as F

    from rayforce_spark.datapipe.sessions import sessionize_batch
    from rayforce_spark.streaming import read_journal_stream
    from rayforce_spark.streaming.stateful import sessionize

    ev = t["events"].select(
        "user_id", (F.col("ts") / 1e9).alias("ts_sec"), "value")
    rows = sorted((r.asDict() for r in ev.collect()),
                  key=lambda r: r["ts_sec"])
    span = rows[-1]["ts_sec"] - rows[0]["ts_sec"]
    gap = max(span / 50.0, 1.0)
    sentinel_ts = rows[-1]["ts_sec"] + 100 * gap
    users = sorted({r["user_id"] for r in rows})
    sentinels = [{"user_id": u, "ts_sec": sentinel_ts, "value": 0.0}
                 for u in users]
    schema = "user_id long, ts_sec double, value double"
    path = _feed(tmp, "sess", schema, _chunks(rows, 4) + [sentinels])

    out = sessionize(read_journal_stream(spark, path, schema), gap_sec=gap)
    stream = _stream_table(spark, out, "sc_sessions",
                           expect_input=len(rows) + len(sentinels)).select(
        "user_id", F.round("session_start", 6).alias("s"),
        F.round("session_end", 6).alias("e"), "n_events",
        F.round("sum_value", 6).alias("v"))

    batch = sessionize_batch(
        ev, key_col="user_id", ts_col="ts_sec", gap=gap,
        aggs={"sum_value": F.sum("value")},
    ).select(
        "user_id", F.round("session_start", 6).alias("s"),
        F.round("session_end", 6).alias("e"), "n_events",
        F.round("sum_value", 6).alias("v"))
    return _result("sessionize", stream, batch,
                   f"gap={gap:.1f}s, {len(users)} keys, sentinel-flushed")


def check_asof(spark, t, tmp):
    from pyspark.sql import functions as F

    from rayforce_spark.operators.joins import asof_join
    from rayforce_spark.streaming import read_journal_stream, replay_journal
    from rayforce_spark.streaming.stateful import stream_asof_join

    left = t["events"].select("user_id", "ts", "event_id")
    right = (t["events"].groupBy("user_id", "ts")
             .agg(F.max("value").alias("value")))  # unique (key, ts)
    lrows = sorted((r.asDict() for r in left.collect()),
                   key=lambda r: r["ts"])
    rrows = sorted((r.asDict() for r in right.collect()),
                   key=lambda r: r["ts"])
    flush_ts = max(lrows[-1]["ts"], rrows[-1]["ts"]) + 86_400 * 10**9
    users = sorted({r["user_id"] for r in lrows})
    flush = [{"user_id": u, "ts": flush_ts, "value": None} for u in users]
    ls = "user_id long, ts long, event_id long"
    rs = "user_id long, ts long, value double"
    lpath = _feed(tmp, "asof_l", ls, _chunks(lrows, 3))
    rpath = _feed(tmp, "asof_r", rs, _chunks(rrows, 3) + [flush])

    out = stream_asof_join(
        read_journal_stream(spark, lpath, ls),
        read_journal_stream(spark, rpath, rs),
        "user_id", "ts", right_cols=["value"],
    )
    stream = _stream_table(spark, out, "sc_asof",
                           expect_input=len(lrows) + len(rrows) + len(flush)).select(
        "user_id", (F.unix_micros("ts")).alias("t_us"), "event_id",
        F.round("value", 6).alias("v"))

    batch = asof_join(
        replay_journal(spark, lpath, ls),
        replay_journal(spark, rpath, rs).filter(F.col("ts") < flush_ts),
        "user_id", "ts", right_cols=["value"],
    ).select(
        # integer div: ts/1000 in double loses µs precision above 2^53 ns
        "user_id", F.expr("ts div 1000").alias("t_us"),
        "event_id", F.round("value", 6).alias("v"))
    return _result("stream_asof_join", stream, batch,
                   f"{len(lrows)} left rows, right flush-advanced watermark")


def check_window_join(spark, t, tmp):
    from pyspark.sql import functions as F

    from rayforce_spark.functions.kdb import ns_to_timestamp
    from rayforce_spark.streaming import read_journal_stream, replay_journal
    from rayforce_spark.streaming.ops import stream_window_join

    left = t["events"].select("user_id", "ts", "event_id")
    right = (t["events"].groupBy("user_id", "ts")
             .agg(F.max("value").alias("value")))
    lrows = sorted((r.asDict() for r in left.collect()),
                   key=lambda r: r["ts"])
    rrows = sorted((r.asDict() for r in right.collect()),
                   key=lambda r: r["ts"])
    ls = "user_id long, ts long, event_id long"
    rs = "user_id long, ts long, value double"
    lpath = _feed(tmp, "wj_l", ls, _chunks(lrows, 3))
    rpath = _feed(tmp, "wj_r", rs, _chunks(rrows, 3))
    lo, hi = -60.0, 60.0

    out = stream_window_join(
        read_journal_stream(spark, lpath, ls),
        read_journal_stream(spark, rpath, rs),
        "user_id", "ts", lo, hi,
    )
    stream = _stream_table(spark, out, "sc_wj",
                           expect_input=len(lrows) + len(rrows)).select(
        "user_id", F.unix_micros("ts").alias("t_us"), "event_id",
        F.unix_micros("r_ts").alias("rt_us"),
        F.round("r_value", 6).alias("v"))

    l = replay_journal(spark, lpath, ls).withColumn(
        "ts", ns_to_timestamp("ts"))
    r = replay_journal(spark, rpath, rs).withColumn(
        "ts", ns_to_timestamp("ts"))
    cond = (
        (l["user_id"] == r["user_id"])
        & r["ts"].between(l["ts"] + F.expr(f"INTERVAL {lo} SECONDS"),
                          l["ts"] + F.expr(f"INTERVAL {hi} SECONDS"))
    )
    batch = l.join(r, cond, "inner").select(
        l["user_id"], F.unix_micros(l["ts"]).alias("t_us"), "event_id",
        F.unix_micros(r["ts"]).alias("rt_us"),
        F.round(r["value"], 6).alias("v"))
    return _result("stream_window_join", stream, batch,
                   f"interval [{lo},{hi}]s")


def check_dedup(spark, t, tmp):
    from rayforce_spark.streaming import read_journal_stream, replay_journal
    from rayforce_spark.streaming.ops import stream_dedup

    ev = t["events"].select("event_id", "ts", "user_id", "value")
    rows = sorted((r.asDict() for r in ev.collect()), key=lambda r: r["ts"])
    # duplicate every row (exact copies, same batch AND later batch)
    schema = "event_id long, ts long, user_id long, value double"
    chunks = _chunks(rows, 3)
    path = _feed(tmp, "dedup", schema, chunks + [chunks[0]])

    out = stream_dedup(
        read_journal_stream(spark, path, schema), ["event_id"],
        ts_col="ts", watermark="1 hour")
    stream = _stream_table(spark, out, "sc_dedup",
                           expect_input=len(rows) + len(chunks[0])).select(
        "event_id", "user_id", "value")  # ts projected to timestamp inside

    batch = replay_journal(spark, path, schema).dropDuplicates(
        ["event_id"]).select("event_id", "user_id", "value")
    return _result("stream_dedup", stream, batch,
                   f"{len(rows)} rows + {len(chunks[0])} replayed copies")


def check_neardup(spark, t, tmp):
    from pyspark.sql import functions as F

    from rayforce_spark.datapipe.dedup import (
        minhash_signature_from_hashes, with_shingle_hashes)
    from rayforce_spark.streaming import read_journal_stream, replay_journal
    from rayforce_spark.streaming.stateful import stream_neardup

    num_perm, bands, k, thr = 64, 16, 3, 0.5
    docs = t["documents"].select("doc_id", "text")
    rows = sorted((r.asDict() for r in docs.collect()),
                  key=lambda r: r["doc_id"])
    schema = "doc_id long, text string"
    path = _feed(tmp, "neardup", schema, _chunks(rows, 3))

    out = stream_neardup(
        read_journal_stream(spark, path, schema),
        num_perm=num_perm, bands=bands, shingle_k=k, threshold=thr,
        max_per_bucket=10**6, state_ttl_sec=10**6)
    stream = _stream_table(spark, out, "sc_neardup",
                           expect_input=len(rows)).select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est")
    ).dropDuplicates(["id_a", "id_b"])

    # batch twin: the SAME signature/band expressions, all pairs sharing
    # any band bucket, est = matching coords / num_perm
    rpb = num_perm // bands
    d = replay_journal(spark, path, schema)
    sig = with_shingle_hashes(
        d.select(F.col("doc_id").alias("__id"), F.col("text").alias("__text")),
        "__text", k, "__bh",
    ).select("__id", minhash_signature_from_hashes(
        F.col("__bh"), num_perm=num_perm).alias("__sig"))
    banded = sig.select("__id", "__sig", F.explode(F.array(*[
        F.hash(F.slice("__sig", b * rpb + 1, rpb), F.lit(b))
        for b in range(bands)])).alias("__bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    est = F.size(F.filter(
        F.zip_with("a.__sig", "b.__sig",
                   lambda x, y: x.isNotNull() & y.isNotNull() & (x == y)),
        lambda v: v)) / F.lit(float(num_perm))
    batch = (
        a.join(b, (F.col("a.__bucket") == F.col("b.__bucket"))
               & (F.col("a.__id") < F.col("b.__id")))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"),
                F.round(est, 6).alias("est"))
        .filter(F.col("est") >= thr)
        .dropDuplicates(["id_a", "id_b"])
    )
    return _result("stream_neardup", stream, batch,
                   f"{len(rows)} docs, bands={bands}")


def check_embedding_neardup(spark, t, tmp):
    from pyspark.sql import functions as F

    from rayforce_spark.datapipe.similarity import embedding_dup_pairs_lsh
    from rayforce_spark.streaming import read_journal_stream, replay_journal
    from rayforce_spark.streaming.stateful import stream_embedding_neardup

    dim, planes, tables, thr, seed = 64, 2, 8, 0.4, 42
    emb = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    rows = sorted(
        ({"vec_id": r.vec_id, "embedding": list(r.embedding)}
         for r in emb.collect()), key=lambda r: r["vec_id"])
    schema = "vec_id long, embedding array<double>"
    path = _feed(tmp, "embdup", schema, _chunks(rows, 3))

    out = stream_embedding_neardup(
        read_journal_stream(spark, path, schema),
        dim=dim, threshold=thr, planes=planes, tables=tables, seed=seed,
        max_per_bucket=10**6, state_ttl_sec=10**6)
    stream = _stream_table(spark, out, "sc_embdup",
                           expect_input=len(rows)).select(
        "id_a", "id_b", F.round("cos", 6).alias("c")
    ).dropDuplicates(["id_a", "id_b"])

    batch = embedding_dup_pairs_lsh(
        replay_journal(spark, path, schema), "embedding", "vec_id",
        threshold=thr, dim=dim, planes=planes, tables=tables, seed=seed,
    ).select("id_a", "id_b", F.round("cos", 6).alias("c"))
    return _result("stream_embedding_neardup", stream, batch,
                   f"{len(rows)} vectors, planes={planes} tables={tables}")


def check_xbar(spark, t, tmp):
    from pyspark.sql import functions as F

    from rayforce_spark.functions.kdb import ns_to_timestamp
    from rayforce_spark.streaming import read_journal_stream, replay_journal
    from rayforce_spark.streaming.ops import stream_xbar_agg

    ev = t["events"].select("user_id", "ts", "value")
    rows = sorted((r.asDict() for r in ev.collect()), key=lambda r: r["ts"])
    schema = "user_id long, ts long, value double"
    path = _feed(tmp, "xbar", schema, _chunks(rows, 4))

    out = stream_xbar_agg(
        read_journal_stream(spark, path, schema), "ts", "1 hour",
        {"n": F.count(F.lit(1)), "v": F.sum("value")})
    stream = _stream_table(spark, out, "sc_xbar", mode="complete",
                           expect_input=len(rows)).select(
        F.unix_micros("bar.start").alias("b"), "n",
        F.round("v", 6).alias("v"))

    batch = (replay_journal(spark, path, schema)
             .withColumn("ts", ns_to_timestamp("ts"))
             .groupBy(F.window("ts", "1 hour").alias("bar"))
             .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
             .select(F.unix_micros("bar.start").alias("b"), "n",
                     F.round("v", 6).alias("v")))
    return _result("stream_xbar_agg", stream, batch, "1-hour tumbling bars")


def check_decontaminate(spark, t, tmp):
    from pyspark.sql import functions as F

    from rayforce_spark.datapipe import decontaminate
    from rayforce_spark.streaming import read_journal_stream, replay_journal
    from rayforce_spark.streaming.ops import stream_decontaminate

    docs = t["documents"].select("doc_id", "text")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    rows = sorted(
        (r.asDict() for r in docs.filter(F.col("doc_id") % 97 != 0).collect()),
        key=lambda r: r["doc_id"])
    schema = "doc_id long, text string"
    path = _feed(tmp, "decon", schema, _chunks(rows, 3))

    n_ev = ev.count()
    # exercise BOTH membership impls on the same feed: the plan-literal
    # expr path and the broadcast+searchsorted pandas path must agree
    # with each other and with the batch anti join
    out_e = stream_decontaminate(
        read_journal_stream(spark, path, schema), ev, "text", n=3,
        impl="expr")
    stream_e = _stream_table(spark, out_e, "sc_decon_e",
                              expect_input=len(rows))
    out_p = stream_decontaminate(
        read_journal_stream(spark, path, schema), ev, "text", n=3,
        impl="pandas")
    stream_p = _stream_table(spark, out_p, "sc_decon_p",
                              expect_input=len(rows))

    batch = decontaminate(replay_journal(spark, path, schema), ev,
                          "text", "doc_id", n=3)
    r = _result("stream_decontaminate", stream_e, batch,
                f"{len(rows)} docs vs {n_ev}-doc eval holdout, 3-grams")
    impls_agree = _canon(stream_e) == _canon(stream_p)
    r["match"] = r["match"] and impls_agree
    r["notes"] += f"; expr==pandas impl: {impls_agree}"
    return r


def check_pack(spark, t, tmp):
    """Streaming first-fit packing == batch pack_greedy, row for row:
    docs fed in id order (the packer's cross-batch contract), 4 journal
    files so shard state must survive micro-batch boundaries."""
    from rayforce_spark.datapipe import pack_greedy
    from rayforce_spark.streaming import read_journal_stream, replay_journal
    from rayforce_spark.streaming.stateful import stream_pack

    docs = t["documents"].select("doc_id", "text")
    rows = sorted((r.asDict() for r in docs.collect()),
                  key=lambda r: r["doc_id"])
    schema = "doc_id long, text string"
    path = _feed(tmp, "pack", schema, _chunks(rows, 4))

    out = stream_pack(read_journal_stream(spark, path, schema),
                      budget=2048, shards=8, salt=5)
    stream = _stream_table(spark, out, "sc_pack", expect_input=len(rows))

    batch = pack_greedy(replay_journal(spark, path, schema),
                        "text", "doc_id", budget=2048, shards=8,
                        salt=5).select("doc_id", "shard", "n_tok", "pack")
    return _result("stream_pack", stream, batch,
                   f"{len(rows)} docs, budget 2048, 8 shards, "
                   "4 micro-batch files (state spans batches)")


def _run_foreach_batch(spark, stream_df, fn, ck_base):
    """Run a foreachBatch sink query to completion, honoring RECOVERY:
    in recovery mode the query is killed after its first committed
    micro-batch (maxFilesPerTrigger=1 is already patched onto the
    journal source) and restarted on the SAME checkpoint — the replayed
    batch_id must be a no-op for an idempotent sink.
    processAllAvailable is safe here (no stateful timeout batches)."""
    ck = os.path.join(ck_base, "ck")

    def start():
        return (stream_df.writeStream.foreachBatch(fn)
                .option("checkpointLocation", ck).start())

    q = start()
    if RECOVERY:
        seen: dict[int, int] = {}
        deadline = time.time() + TIMEOUT_SECS
        try:
            while time.time() < deadline:
                if _committed_rows(q, seen) > 0:
                    break
                time.sleep(0.2)
        finally:
            q.stop()
        q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _check_index_ingest(spark, t, tmp, *, name, set_index, ingest_fn,
                        full_pairs, val_col, note):
    """Shared body for the three index-ingest legs (10-12): build the
    index on the old 2/3 of documents, stream the other 1/3 through the
    family's foreachBatch ingest (3 micro-batches), and compare the
    accumulated pair partitions against the batch twin = the family's
    full-run pair set over old+new MINUS the pairs entirely inside the
    old corpus (the index builder's job). Every family's leg params are
    exact-recall, so both sides are deterministic sets."""
    from pyspark.sql import functions as F

    from rayforce_spark.streaming import read_journal_stream

    docs = t["documents"].select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new_rows = sorted(
        (r.asDict() for r in
         docs.filter(F.col("doc_id") % 3 == 0).collect()),
        key=lambda r: r["doc_id"])
    schema = "doc_id long, text string"
    path = _feed(tmp, f"{name}_feed", schema, _chunks(new_rows, 3))

    idx = os.path.join(tmp, f"{name}_index")
    pairs = os.path.join(tmp, f"{name}_pairs")
    set_index(old, idx)
    fn = ingest_fn(idx, pairs)
    _run_foreach_batch(spark, read_journal_stream(spark, path, schema),
                       fn, tmp)
    stream = spark.read.parquet(pairs).select(
        "id_a", "id_b", F.round(val_col, 6).alias("v"))

    old_ids = {r.doc_id for r in old.select("doc_id").collect()}
    both_old = (F.col("id_a").isin(list(old_ids))
                & F.col("id_b").isin(list(old_ids)))
    batch = (full_pairs(docs).filter(~both_old)
             .select("id_a", "id_b", F.round(val_col, 6).alias("v")))
    return _result(name, stream, batch,
                   f"{len(new_rows)} streamed docs vs {len(old_ids)} "
                   f"indexed, 3 micro-batches, {note}")


def check_minhash_index_ingest(spark, t, tmp):
    """STREAMCHECK leg 10 (r10 directive 5): continuous day-2 ingestion
    against a persisted MinHash index — foreachBatch probes each
    micro-batch (minhash_index_pairs), writes the batch's canonical
    pair partition, extends the index, commits a marker; idempotent
    under replay (the recovery pass kills the query mid-stream and
    re-runs the last batch_id). Params use bands=num_perm, so recall is
    exact and the emitted set is deterministic: every exact-Jaccard
    pair with at least one side on the stream, exactly once.
    shingle_k=3 (the gate row's tuning): k=1 on the template-dense
    corpus emitted ~5M pairs at sf0.1 and the leg spent ~12 min on
    materialization alone — same code path, pathological volume."""
    from rayforce_spark.datapipe import minhash_lsh_pairs, set_minhash_index
    from rayforce_spark.streaming.ops import stream_minhash_index_ingest

    kw = dict(num_perm=32, bands=32, shingle_k=3)
    thr = 0.5
    return _check_index_ingest(
        spark, t, tmp, name="stream_minhash_index",
        set_index=lambda old, p: set_minhash_index(
            old, p, "text", "doc_id", **kw),
        ingest_fn=lambda idx, pairs: stream_minhash_index_ingest(
            idx, pairs, "text", "doc_id", threshold=thr),
        full_pairs=lambda docs: minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=thr, **kw),
        val_col="jaccard", note="exact-recall banding")


def check_simhash_index_ingest(spark, t, tmp):
    """STREAMCHECK leg 11 (r10): the SimHash family's streaming ingest
    — same foreachBatch shape and idempotency contract as leg 10;
    pigeonhole banding makes recall exact, so the emitted hamming-pair
    set is deterministic."""
    from rayforce_spark.datapipe import set_simhash_index, simhash_dup_pairs
    from rayforce_spark.streaming.ops import stream_simhash_index_ingest

    return _check_index_ingest(
        spark, t, tmp, name="stream_simhash_index",
        set_index=lambda old, p: set_simhash_index(
            old, p, "text", "doc_id", max_hamming=3),
        ingest_fn=lambda idx, pairs: stream_simhash_index_ingest(
            idx, pairs, "text", "doc_id"),
        full_pairs=lambda docs: simhash_dup_pairs(
            docs, "text", "doc_id", max_hamming=3),
        val_col="hamming", note="pigeonhole-exact bands")


def check_jaccard_index_ingest(spark, t, tmp):
    """STREAMCHECK leg 12 (r10): the exact-Jaccard family's streaming
    ingest — cross-batch pairs stay exact across the stream by the
    frozen-order prefix argument (set_jaccard_index); the full-run twin
    sorts under a DIFFERENT (global-df) order, which is the point: two
    exact algorithms, one emitted set. shingle_k=3 keeps the
    template-dense corpus's pair volume sane (see leg 10)."""
    from rayforce_spark.datapipe import jaccard_dup_pairs, set_jaccard_index
    from rayforce_spark.streaming.ops import stream_jaccard_index_ingest

    return _check_index_ingest(
        spark, t, tmp, name="stream_jaccard_index",
        set_index=lambda old, p: set_jaccard_index(
            old, p, "text", "doc_id", shingle_k=3, threshold=0.5),
        ingest_fn=lambda idx, pairs: stream_jaccard_index_ingest(
            idx, pairs, "text", "doc_id"),
        full_pairs=lambda docs: jaccard_dup_pairs(
            docs, "text", "doc_id", shingle_k=3, threshold=0.5),
        val_col="jaccard", note="frozen-order exact prefixes")


CHECKS = [
    check_sessionize,
    check_asof,
    check_window_join,
    check_dedup,
    check_neardup,
    check_embedding_neardup,
    check_xbar,
    check_decontaminate,
    check_pack,
    check_minhash_index_ingest,
    check_simhash_index_ingest,
    check_jaccard_index_ingest,
]


def main():
    from rayforce_spark.session import get_spark, load_tables

    only = set(sys.argv[2:])
    spark = get_spark("streamcheck")
    t = load_tables(spark, SF_DIR)

    def run_one(fn, tmp):
        try:
            return fn(spark, t, tmp)
        except Exception as e:  # record, keep going
            return {"op": fn.__name__.replace("check_", ""), "match": False,
                    "stream_rows": -1, "batch_rows": -1,
                    "notes": f"EXC: {type(e).__name__}: {e}"}

    results = []
    for fn in CHECKS:
        if only and fn.__name__.replace("check_", "") not in only:
            continue
        tmp = tempfile.mkdtemp(prefix="streamcheck_")
        t0 = time.time()
        try:
            r = run_one(fn, tmp)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        r["sec"] = round(time.time() - t0, 1)

        # crash-recovery leg (r8): same op, fresh feed, kill after the
        # first committed micro-batch and resume from the checkpoint.
        # maxFilesPerTrigger=1 (patched onto the journal source for
        # this pass only) guarantees the kill lands mid-stream.
        global RECOVERY
        import rayforce_spark.streaming as _RS
        orig_src = _RS.read_journal_stream
        tmp2 = tempfile.mkdtemp(prefix="streamcheck_rec_")
        t1 = time.time()
        RECOVERY = True
        _RS.read_journal_stream = (
            lambda sp, path, schema: orig_src(sp, path, schema,
                                              max_files_per_trigger=1))
        try:
            r2 = run_one(fn, tmp2)
        finally:
            RECOVERY = False
            _RS.read_journal_stream = orig_src
            shutil.rmtree(tmp2, ignore_errors=True)
        r["recovery"] = r2["match"]
        r["recovery_sec"] = round(time.time() - t1, 1)
        if not r2["match"]:
            r["notes"] += f"; RECOVERY FAIL: {r2['notes']}"

        print(f"[streamcheck] {r['op']}: "
              f"{'OK' if r['match'] else 'MISMATCH'} "
              f"(recovery {'OK' if r['recovery'] else 'MISMATCH'}) "
              f"({r['stream_rows']} rows, {r['sec']}s+"
              f"{r['recovery_sec']}s) {r['notes']}",
              file=sys.stderr)
        results.append(r)

    out = {
        "metric": "stream_batch_equivalence",
        "sf_dir": SF_DIR,
        "ok": sum(1 for r in results if r["match"]),
        "recovery_ok": sum(1 for r in results if r.get("recovery")),
        "total": len(results),
        "results": results,
    }
    if only:  # partial run: report only, don't overwrite the record
        print(json.dumps(out))
        return (0 if out["ok"] == out["total"]
            and out["recovery_ok"] == out["total"] else 1)
    tag = os.path.basename(SF_DIR.rstrip("/"))
    fname = ("STREAMCHECK.json" if tag == "sf0.01"
             else f"STREAMCHECK_{tag}.json")
    with open(os.path.join(REPO, fname), "w") as f:
        json.dump(out, f, indent=2)
    lines = "\n".join(
        f"| {r['op']} | {'✅' if r['match'] else '❌'} | "
        f"{'✅' if r.get('recovery') else '❌'} | "
        f"{r['stream_rows']} | {r['sec']}+{r.get('recovery_sec', 0)} | "
        f"{r['notes']} |"
        for r in results)
    if tag != "sf0.01":  # canonical .md tracks the gate scale only
        print(json.dumps(out))
        return (0 if out["ok"] == out["total"]
            and out["recovery_ok"] == out["total"] else 1)
    with open(os.path.join(REPO, "STREAMCHECK.md"), "w") as f:
        f.write(f"""# STREAMCHECK — batch-vs-stream equivalence

Generated by `scripts/streamcheck.py` at `{SF_DIR}`. The same journaled
rows are run through each streaming operator (file source, one file per
micro-batch, memory sink polled to stability) AND its batch twin; rows
are compared as exact multisets (floats rounded to 6 dp — see the module
docstring for each operator's equivalence contract, e.g. sentinel events
to close trailing sessions, a right-side flush row to advance the asof
watermark).

| operator | match | recovery | rows | sec | notes |
|---|---|---|---|---|---|
{lines}

**{out['ok']}/{out['total']} equivalent; {out['recovery_ok']}/{out['total']} recover from a mid-stream kill (stop after the first committed micro-batch, restart from checkpoint) with the final multiset still equal to the batch twin.**
""")
    print(json.dumps(out))
    return (0 if out["ok"] == out["total"]
            and out["recovery_ok"] == out["total"] else 1)


if __name__ == "__main__":
    raise SystemExit(main())
