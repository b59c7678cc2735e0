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


def stream_window_join(
    left: DataFrame,
    right: DataFrame,
    on: "str | list[str]",
    time_col: str,
    lo_seconds: float,
    hi_seconds: float,
    *,
    watermark: str = "10 minutes",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream window join: the streaming twin of the batch
    ``window_join`` — per left event, right events with the same keys
    whose time falls in ``[t+lo_seconds, t+hi_seconds]``.

    The reference's engine has no streaming join (its IPC loop mutates
    session tables row-by-row, examples/sesslog.rfl); Structured
    Streaming's watermarked interval join is the scale form: both sides
    declare a watermark, and the time-range conjunct lets Spark BOUND
    the join state (old rows are dropped once the watermark passes
    t+hi). Aggregate downstream for the window_join(aggs=...) shape.

    Accepts Timestamp(NTZ) or i64-ns-long time columns (longs get one
    ns_to_timestamp projection — watermarks need timestamps). Right
    columns (except the keys) are prefixed with ``right_prefix``.
    ``how``: "inner" (default), or the outer forms Spark supports for
    stream-stream joins ("leftOuter"/"rightOuter"/"fullOuter").
    """
    from pyspark.sql.types import LongType

    from rayforce_spark.functions.kdb import ns_to_timestamp

    keys = [on] if isinstance(on, str) else list(on)
    if isinstance(left.schema[time_col].dataType, LongType):
        left = left.withColumn(time_col, ns_to_timestamp(time_col))
    if isinstance(right.schema[time_col].dataType, LongType):
        right = right.withColumn(time_col, ns_to_timestamp(time_col))
    l = left.withWatermark(time_col, watermark)
    r = right.withWatermark(time_col, watermark)
    for c in r.columns:
        if c not in keys:
            r = r.withColumnRenamed(c, f"{right_prefix}{c}")
    rt = F.col(f"{right_prefix}{time_col}")
    lt = F.col(time_col)
    cond = None
    for k in keys:
        e = l[k] == r[k]
        cond = e if cond is None else cond & e
    cond = cond & rt.between(
        lt + F.expr(f"INTERVAL {lo_seconds} SECONDS"),
        lt + F.expr(f"INTERVAL {hi_seconds} SECONDS"),
    )
    joined = l.join(r, cond, how)
    # Collapse the duplicated key columns. For rightOuter/fullOuter the
    # LEFT copy is NULL on unmatched right rows, so plain drop(right key)
    # would lose the key those rows exist to report — coalesce instead.
    if how in ("rightOuter", "fullOuter", "right_outer", "full_outer"):
        out = [
            F.coalesce(l[c], r[c]).alias(c) if c in keys else joined[c]
            for c in left.columns
        ]
        out += [
            joined[c] for c in joined.columns
            if c.startswith(right_prefix) and c not in left.columns
        ]
        return joined.select(*out)
    return joined.drop(*[r[k] for k in keys])


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


def stream_decontaminate(
    stream: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    *,
    n: int = 8,
    impl: str = "auto",
    expr_max_grams: int = 10_000,
    max_eval_grams: int = 50_000_000,
) -> DataFrame:
    """Decontaminate a document STREAM at ingest: drop any arriving doc
    that shares a word ``n``-gram with the static eval set — the
    streaming twin of datapipe.decontam.decontaminate.

    A stream can't run the batch op's anti join (stream-static left-anti
    isn't an SS-supported join type, and doc-level granularity would need
    stateful reassembly after an exploded gram join), so this does what
    production ingest pipelines do: PRECOMPUTE the eval gram set once
    (eval sets are small and static by definition — benchmarks change
    rarely) and test each arriving doc row-locally. Map-only: no state,
    no shuffle, any output mode, works under any trigger.

    Two row-local membership impls, picked by eval-set size:
    * ``expr``  — the gram set as a plan literal, probed with
      ``arrays_overlap`` (JVM hashset, zero Python). Per-row cost grows
      with the literal size, so it's capped at ``expr_max_grams``.
    * ``pandas`` — the sorted gram array as a SPARK BROADCAST, probed
      with numpy searchsorted inside an Arrow-batched pandas UDF:
      O(|doc grams| * log |eval|) per row, scales to multi-million-gram
      eval suites (the shape a real 100 TB ingest uses — ship the
      artifact, not a join).
    """
    from rayforce_spark.datapipe.dedup import with_shingle_hashes

    ev = with_shingle_hashes(eval_df.select(text_col), text_col, n, "__g")
    evg = ev.select(F.explode("__g").alias("g")).distinct()
    n_grams = evg.count()
    if n_grams > max_eval_grams:
        # the precomputed-set design assumes a benchmark-sized eval side
        # (~400 MB of i64 at the default cap); beyond that the artifact
        # no longer fits a driver/broadcast and the BATCH anti join
        # (datapipe.decontam, per micro-batch via foreachBatch) is the
        # right tool — fail loudly instead of silently OOMing the driver
        raise ValueError(
            f"eval side has {n_grams} distinct {n}-grams "
            f"(> max_eval_grams={max_eval_grams}); decontaminate per "
            "micro-batch with datapipe.decontam via foreachBatch instead")
    grams = sorted(r[0] for r in evg.collect())
    if not grams:
        return stream
    if impl == "auto":
        impl = "expr" if len(grams) <= expr_max_grams else "pandas"

    st = with_shingle_hashes(stream, text_col, n, "__g")
    if impl == "expr":
        # null text -> null gram array -> arrays_overlap yields NULL;
        # coalesce to False so null-text rows pass (matching the pandas
        # impl and the batch op, which explode null to no grams)
        hit = F.coalesce(F.arrays_overlap("__g", F.lit(grams)),
                         F.lit(False))
    elif impl == "pandas":
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        spark = stream.sparkSession
        bc = spark.sparkContext.broadcast(
            np.asarray(grams, dtype=np.int64))

        def _hit_fn(gs):
            evs = bc.value
            out = np.zeros(len(gs), dtype=bool)
            for i, arr in enumerate(gs):
                if arr is None or len(arr) == 0:
                    continue
                a = np.asarray(arr, dtype=np.int64)
                idx = np.minimum(np.searchsorted(evs, a), len(evs) - 1)
                out[i] = bool(np.any(evs[idx] == a))
            return pd.Series(out)

        # real-object annotations: `from __future__ import annotations`
        # would leave string hints that pandas_udf cannot resolve
        _hit_fn.__annotations__ = {"gs": pd.Series, "return": pd.Series}
        hit = pandas_udf(_hit_fn, "boolean")("__g")
    else:
        raise ValueError(f"unknown impl {impl!r}")
    return st.filter(~hit).drop("__g")


def stream_dedup(
    stream: DataFrame,
    keys: list[str],
    *,
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming EXACT dedup on ``keys`` — the streaming twin of
    datapipe.dedup.dedup_exact for ingestion pipelines (drop replayed /
    double-delivered documents before they reach the corpus).

    With ``ts_col``, state is WATERMARK-BOUNDED
    (dropDuplicatesWithinWatermark): a duplicate arriving within the
    watermark of its first occurrence is dropped, and per-key state ages
    out — the only shape that survives unbounded streams at scale.
    Without ``ts_col`` it falls back to exact dropDuplicates, whose
    state grows with distinct keys forever — bounded/replay use only.

    Accepts the engine's i64-ns shadow longs for ``ts_col`` (projected
    through ns_to_timestamp, same contract as stream_xbar_agg).
    """
    if ts_col is None:
        return stream.dropDuplicates(keys)
    from pyspark.sql.types import LongType

    from rayforce_spark.functions.kdb import ns_to_timestamp

    if isinstance(stream.schema[ts_col].dataType, LongType):
        stream = stream.withColumn(ts_col, ns_to_timestamp(ts_col))
    return (
        stream.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def stream_minhash_index_ingest(
    index_path: str,
    pairs_path: str,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.7,
    intra_batch: bool = True,
    compact_every: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """Continuous day-2 ingestion against a persisted MinHash index
    (datapipe.dedup.set_minhash_index): returns a ``foreachBatch``
    callable that, per micro-batch, probes the batch against the index
    (minhash_index_pairs — the indexed corpus is never re-shingled),
    finds intra-batch pairs with the index's own banding params, writes
    the canonical pair set (id_a < id_b, exact jaccard >= threshold) to
    ``pairs_path``, and extends the index with the batch — the
    streaming twin of the batch dedup-then-extend loop in
    examples/train_prep.py. Wire it as::

        (stream.writeStream
         .foreachBatch(stream_minhash_index_ingest(idx, pairs, "text", "doc_id"))
         .option("checkpointLocation", ck).start())

    IDEMPOTENT under micro-batch replay (crash/restart re-runs the last
    uncommitted batch with the same batch_id):

    - pair output goes to ``pairs_path/batch=<batch_id>`` with
      mode=overwrite — a replayed batch rewrites its own partition,
      never double-appends;
    - cross pairs anti-join away the batch's OWN ids, so a replay that
      finds the batch already extended into the index (crash landed
      between extend and commit marker) emits the same cross set;
    - the extend append is the one non-idempotent step, so a commit
      MARKER (``index_path/_batches/batch-<id>``, written LAST via the
      Hadoop FS API — local paths and object stores alike) skips fully
      committed batches on replay; the one torn window (extend
      committed, marker not) duplicates that batch's index rows, which
      probes tolerate by construction (minhash_index_pairs dedups its
      verified pairs by pair key) at the bounded cost of one batch's
      extra index bytes.

    Emission semantics over the whole stream: every near-dup pair
    (a, b) with at least one side arriving on the stream is emitted
    exactly once, in the batch of its later-arriving side
    (``intra_batch=False`` drops same-batch pairs for pipelines that
    run minhash_lsh_pairs over the batch separately); pairs entirely
    inside the pre-built index are the batch builder's job.
    """
    from rayforce_spark.datapipe.dedup import (
        _read_minhash_meta,
        compact_minhash_index,
        extend_minhash_index,
        minhash_index_pairs,
        minhash_lsh_pairs,
    )

    def pairs_of(batch_df: DataFrame) -> DataFrame:
        spark = batch_df.sparkSession
        ids = batch_df.select(F.col(id_col).alias("__bid"))
        cross = (
            minhash_index_pairs(index_path, batch_df, text_col, id_col,
                                threshold=threshold)
            .join(ids, F.col("index_id") == F.col("__bid"), "left_anti")
            .select(F.least("new_id", "index_id").alias("id_a"),
                    F.greatest("new_id", "index_id").alias("id_b"),
                    "jaccard")
        )
        if not intra_batch:
            return cross
        meta = _read_minhash_meta(spark, index_path)
        return cross.unionByName(minhash_lsh_pairs(
            batch_df, text_col, id_col, threshold=threshold,
            num_perm=meta["num_perm"], bands=meta["bands"],
            shingle_k=meta["shingle_k"], sig_impl=meta["sig_impl"],
        ))

    return _index_ingest_foreachbatch(
        index_path, pairs_path, pairs_of,
        lambda b: extend_minhash_index(b, index_path, text_col, id_col),
        compact=compact_minhash_index, compact_every=compact_every)


def _index_ingest_foreachbatch(index_path, pairs_path, pairs_of,
                               extend, compact=None, compact_every=None,
                               ) -> Callable[[DataFrame, int], None]:
    """The family-independent foreachBatch core shared by the three
    index-ingest wrappers (minhash / simhash / jaccard — the
    idempotency contract is documented on stream_minhash_index_ingest
    and identical for all three): marker-skip, one localCheckpoint of
    the micro-batch, per-batch overwrite pair partition, extend, commit
    marker last.

    ``compact``/``compact_every``: run ``compact(spark, index_path)``
    (a compact_*_index) after every ``compact_every``-th committed
    batch. foreachBatch is the ONE place auto-compaction is safe by
    construction: micro-batches are serial, so the compaction window
    can never overlap this stream's own extends/probes (the
    compact↔extend hazard the _compacting lease enforces against
    everyone else). A compaction that crashes mid-rewrite leaves the
    lease held; the next batch sees it BEFORE touching the index and
    re-runs the compaction to completion (duplicate-tolerant —
    dedup._compact_leg's crash-safety note), self-healing instead of
    wedging the stream on the lease error."""
    from rayforce_spark.sources._sidecar import _fs_path

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fs, _ = _fs_path(spark, index_path)
        if compact is not None:
            from rayforce_spark.datapipe.dedup import _lease

            _, lease = _lease(spark, index_path)
            if fs.exists(lease):  # crashed compaction — finish it first
                compact(spark, index_path)
        marker = spark._jvm.org.apache.hadoop.fs.Path(
            f"{index_path}/_batches/batch-{batch_id}")
        if fs.exists(marker):
            return  # fully committed before a restart — replay is a no-op
        # freeze the micro-batch once: the probe, the intra-batch pairs,
        # the id anti-join and the extend are four separate Spark jobs,
        # and re-reading the source per job would re-pay the scan 4x
        batch_df = batch_df.localCheckpoint(eager=True)
        if batch_df.count() > 0:
            pairs_of(batch_df).write.mode("overwrite").parquet(
                f"{pairs_path}/batch={batch_id}")
            extend(batch_df)
        fs.mkdirs(marker)  # the commit marker, written LAST
        # compaction AFTER the commit marker: a crash mid-compaction
        # replays nothing (the batch is committed) and the next batch
        # self-heals the lease
        if compact is not None and compact_every and (
                (batch_id + 1) % int(compact_every) == 0):
            compact(spark, index_path)

    return _ingest


def stream_simhash_index_ingest(
    index_path: str,
    pairs_path: str,
    text_col: str,
    id_col: str,
    *,
    intra_batch: bool = True,
    compact_every: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """Continuous day-2 ingestion against a persisted SimHash index —
    the hamming-distance twin of :func:`stream_minhash_index_ingest`
    (same foreachBatch shape, same idempotency contract; see that
    docstring). Emits canonical (id_a < id_b, hamming) pairs at the
    index's stored max_hamming; recall is exact by the pigeonhole
    bound, so the whole-stream emission is deterministic."""
    from rayforce_spark.datapipe.dedup import (
        _read_simhash_meta,
        compact_simhash_index,
        extend_simhash_index,
        simhash_dup_pairs,
        simhash_index_pairs,
    )

    def pairs_of(batch_df: DataFrame) -> DataFrame:
        spark = batch_df.sparkSession
        ids = batch_df.select(F.col(id_col).alias("__bid"))
        cross = (
            simhash_index_pairs(index_path, batch_df, text_col, id_col)
            .join(ids, F.col("index_id") == F.col("__bid"), "left_anti")
            .select(F.least("new_id", "index_id").alias("id_a"),
                    F.greatest("new_id", "index_id").alias("id_b"),
                    "hamming")
        )
        if not intra_batch:
            return cross
        meta = _read_simhash_meta(spark, index_path)
        return cross.unionByName(simhash_dup_pairs(
            batch_df, text_col, id_col, max_hamming=meta["max_hamming"],
            bands=meta["bands"], token_hash=meta["token_hash"],
        ))

    return _index_ingest_foreachbatch(
        index_path, pairs_path, pairs_of,
        lambda b: extend_simhash_index(b, index_path, text_col, id_col),
        compact=compact_simhash_index, compact_every=compact_every)


def stream_jaccard_index_ingest(
    index_path: str,
    pairs_path: str,
    text_col: str,
    id_col: str,
    *,
    intra_batch: bool = True,
    compact_every: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """Continuous day-2 ingestion against a persisted exact-Jaccard
    index — the exact-similarity twin of
    :func:`stream_minhash_index_ingest` (same foreachBatch shape, same
    idempotency contract; see that docstring). Emits canonical
    (id_a < id_b, jaccard) pairs at the index's stored threshold;
    cross-batch pairs stay EXACT across the whole stream by the
    frozen-order prefix argument (set_jaccard_index), intra-batch pairs
    come from jaccard_dup_pairs over the batch alone."""
    from rayforce_spark.datapipe.dedup import (
        _read_jaccard_meta,
        compact_jaccard_index,
        extend_jaccard_index,
        jaccard_dup_pairs,
        jaccard_index_pairs,
    )

    def pairs_of(batch_df: DataFrame) -> DataFrame:
        spark = batch_df.sparkSession
        ids = batch_df.select(F.col(id_col).alias("__bid"))
        cross = (
            jaccard_index_pairs(index_path, batch_df, text_col, id_col)
            .join(ids, F.col("index_id") == F.col("__bid"), "left_anti")
            .select(F.least("new_id", "index_id").alias("id_a"),
                    F.greatest("new_id", "index_id").alias("id_b"),
                    "jaccard")
        )
        if not intra_batch:
            return cross
        meta = _read_jaccard_meta(spark, index_path)
        return cross.unionByName(jaccard_dup_pairs(
            batch_df, text_col, id_col, shingle_k=meta["shingle_k"],
            threshold=meta["threshold"],
            max_doc_freq=meta["max_doc_freq"],
        ))

    return _index_ingest_foreachbatch(
        index_path, pairs_path, pairs_of,
        lambda b: extend_jaccard_index(b, index_path, text_col, id_col),
        compact=compact_jaccard_index, compact_every=compact_every)
