"""Storage round-trips (SURVEY §2.1) and streaming analogs (§1.3)."""

import os

from pyspark.sql import functions as F

from rayforce_spark import K
from rayforce_spark.sources import (
    get_parted,
    get_splayed,
    read_csv,
    set_parted,
    set_splayed,
    write_csv,
)
from rayforce_spark.streaming import (
    Journal,
    read_journal_stream,
    replay_journal,
    stream_xbar_agg,
)


def test_csv_roundtrip(spark, tables, tmp_path):
    path = str(tmp_path / "nation_csv")
    write_csv(tables["nation"], path)
    back = read_csv(
        spark, path,
        names=["n_nationkey", "n_name", "n_regionkey"],
        types=["i32", "symbol", "i32"],
    )
    assert sorted(r.n_nationkey for r in back.collect()) == list(range(25))
    assert dict(back.dtypes) == {
        "n_nationkey": "int", "n_name": "string", "n_regionkey": "int"
    }


def test_jsonl_roundtrip_and_malformed(spark, tables, tmp_path):
    # r9: JSONL (LLM-corpus interchange) — explicit type-vector read,
    # distributed write; PERMISSIVE default tolerates a broken line
    # (null row), strict=True fails fast on it
    import pytest

    from rayforce_spark.sources import read_jsonl, write_jsonl

    path = str(tmp_path / "docs_jsonl")
    write_jsonl(tables["documents"].select("doc_id", "lang", "text"), path)
    back = read_jsonl(spark, path, ["doc_id", "lang", "text"],
                      ["i64", "symbol", "string"])
    assert back.count() == tables["documents"].count()
    assert dict(back.dtypes) == {
        "doc_id": "bigint", "lang": "string", "text": "string"}
    a = {r.doc_id: r.lang for r in back.collect()}
    b = {r.doc_id: r.lang
         for r in tables["documents"].select("doc_id", "lang").collect()}
    assert a == b

    bad = tmp_path / "bad_jsonl"
    bad.mkdir()
    (bad / "part-0.json").write_text(
        '{"doc_id": 1, "lang": "en"}\nTHIS IS NOT JSON\n'
        '{"doc_id": 2, "lang": "fr"}\n')
    perm = read_jsonl(spark, str(bad), ["doc_id", "lang"],
                      ["i64", "symbol"]).collect()
    assert len(perm) == 3  # broken line -> null row, job survives
    assert sorted(r.doc_id for r in perm if r.doc_id is not None) == [1, 2]
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_jsonl(spark, str(bad), ["doc_id", "lang"],
                   ["i64", "symbol"], strict=True).collect()


def test_splayed_roundtrip(spark, tables, tmp_path):
    path = str(tmp_path / "orders_splayed")
    set_splayed(tables["orders"], path, sort_within_partitions_by=["o_orderdate"])
    back = get_splayed(spark, path)
    assert back.count() == tables["orders"].count()
    assert set(back.columns) == set(tables["orders"].columns)


def test_parted_roundtrip_and_pruning(spark, tables, tmp_path):
    path = str(tmp_path / "events_parted")
    set_parted(
        tables["events"], path, "date",
        part_expr=F.to_date(K.ns_to_timestamp("ts")),
    )
    back = get_parted(spark, path)
    assert back.count() == tables["events"].count()
    # partition pruning: filter on the virtual partition column must reach
    # the scan as a partition filter (ref: parted dbs skip partitions,
    # core/index.c:2203-2221)
    one_day = back.filter(F.col("date") == "2024-01-15")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(date" in plan, plan
    got = one_day.count()
    want = tables["events"].filter(
        F.to_date(K.ns_to_timestamp("ts")) == "2024-01-15"
    ).count()
    assert got == want > 0


def test_bucketed_join_no_exchange(spark, tables, tmp_path):
    # the 100 TB co-location contract: both sides bucketed on the join
    # key -> the equi-join plans with ZERO Exchange operators (and, with
    # sortBy, zero Sort operators) — the scan layout satisfies the join
    from rayforce_spark.sources import get_bucketed, set_bucketed

    o = tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    li = tables["lineitem"].select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    set_bucketed(o, "b_orders", "o_orderkey", n_buckets=4,
                 path=str(tmp_path / "b_orders"))
    set_bucketed(li, "b_lineitem", "o_orderkey", n_buckets=4,
                 path=str(tmp_path / "b_lineitem"))
    bo, bl = get_bucketed(spark, "b_orders"), get_bucketed(spark, "b_lineitem")
    # disable auto-broadcast so the small test tables take the
    # large-table code path (SMJ) the bucketing is designed for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bo.join(bl, "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == tables["lineitem"].count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_journal_replay_and_stream(spark, tmp_path):
    jpath = str(tmp_path / "journal")
    schema = "k long, v string"
    j = Journal(jpath, schema)
    j.append([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    j.append([{"k": 3, "v": "c"}])

    replayed = replay_journal(spark, jpath, schema)
    assert sorted((r.k, r.v) for r in replayed.collect()) == [
        (1, "a"), (2, "b"), (3, "c")
    ]

    stream = read_journal_stream(spark, jpath, schema)
    assert stream.isStreaming
    q = (
        stream.groupBy().agg(F.sum("k").alias("total"))
        .writeStream.outputMode("complete")
        .format("memory").queryName("jrn_out").start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT total FROM jrn_out").collect()[0].total
        assert got == 6
        # append more -> incremental batch picks it up
        j.append([{"k": 10, "v": "d"}])
        q.processAllAvailable()
        got = spark.sql("SELECT total FROM jrn_out").collect()[0].total
        assert got == 16
    finally:
        q.stop()


def test_stream_xbar_agg(spark, tmp_path):
    jpath = str(tmp_path / "tsjournal")
    schema = "ts timestamp, sym string, px double"
    j = Journal(jpath, schema)
    j.append([
        {"ts": "2024-01-01T00:00:10", "sym": "A", "px": 1.0},
        {"ts": "2024-01-01T00:00:20", "sym": "A", "px": 3.0},
        {"ts": "2024-01-01T00:07:00", "sym": "A", "px": 5.0},
    ])
    stream = read_journal_stream(spark, jpath, schema)
    agg = stream_xbar_agg(
        stream, "ts", "5 minutes",
        {"avg_px": F.avg("px"), "n": F.count(F.lit(1))},
        by=["sym"],
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("xbar_out").start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT bar.start AS s, avg_px, n FROM xbar_out ORDER BY s"
        ).collect()
        assert len(rows) == 2
        assert rows[0].avg_px == 2.0 and rows[0].n == 2
        assert rows[1].avg_px == 5.0 and rows[1].n == 1
    finally:
        q.stop()


def test_stream_xbar_agg_ns_long(spark, tmp_path):
    # the engine's canonical i64-ns shadow dtype must stream too:
    # watermarks need a timestamp, so the operator projects ns->timestamp
    jpath = str(tmp_path / "nsjournal")
    schema = "ts long, px double"
    j = Journal(jpath, schema)
    base = 1_704_067_200 * 1_000_000_000  # 2024-01-01T00:00:00Z ns
    j.append([
        {"ts": base + 10 * 10**9, "px": 1.0},
        {"ts": base + 20 * 10**9, "px": 3.0},
        {"ts": base + 420 * 10**9, "px": 5.0},
    ])
    stream = read_journal_stream(spark, jpath, schema)
    agg = stream_xbar_agg(
        stream, "ts", "5 minutes", {"avg_px": F.avg("px")}
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("xbar_ns_out").start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT bar.start AS s, avg_px FROM xbar_ns_out ORDER BY s"
        ).collect()
        assert [r.avg_px for r in rows] == [2.0, 5.0]
        assert rows[0].s.minute == 0 and rows[1].s.minute == 5
    finally:
        q.stop()


def test_stream_window_join(spark, tmp_path):
    # streaming twin of window_join: purchases enriched with clicks in
    # [t-60s, t+60s]; ns-long time columns take the timestamp projection
    from rayforce_spark.streaming import stream_window_join

    base = 1_704_067_200 * 1_000_000_000  # 2024-01-01T00:00:00Z ns
    lpath, rpath = str(tmp_path / "l"), str(tmp_path / "r")
    lschema = "user LONG, ts LONG, amount DOUBLE"
    rschema = "user LONG, ts LONG, click DOUBLE"
    jl, jr = Journal(lpath, lschema), Journal(rpath, rschema)
    jl.append([
        {"user": 1, "ts": base + 100 * 10**9, "amount": 5.0},
        {"user": 2, "ts": base + 200 * 10**9, "amount": 7.0},
    ])
    jr.append([
        {"user": 1, "ts": base + 80 * 10**9, "click": 0.5},   # in window
        {"user": 1, "ts": base + 90 * 10**9, "click": 0.7},   # in window
        {"user": 1, "ts": base + 300 * 10**9, "click": 0.9},  # out
        {"user": 2, "ts": base + 199 * 10**9, "click": 0.2},  # in window
    ])
    ls = read_journal_stream(spark, lpath, lschema)
    rs = read_journal_stream(spark, rpath, rschema)
    j = stream_window_join(ls, rs, "user", "ts", -60, 60)
    q = (
        j.writeStream.outputMode("append")
        .format("memory").queryName("swj_out").start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user, amount, r_click FROM swj_out ORDER BY user, r_click"
        ).collect()
        assert [(r.user, r.amount, r.r_click) for r in rows] == [
            (1, 5.0, 0.5), (1, 5.0, 0.7), (2, 7.0, 0.2),
        ]
    finally:
        q.stop()


def test_stream_xbar_agg_sliding(spark, tmp_path):
    jpath = str(tmp_path / "slidejournal")
    schema = "ts timestamp, px double"
    j = Journal(jpath, schema)
    j.append([
        {"ts": "2024-01-01T00:06:00", "px": 4.0},
    ])
    stream = read_journal_stream(spark, jpath, schema)
    agg = stream_xbar_agg(
        stream, "ts", "10 minutes", {"n": F.count(F.lit(1))},
        slide="5 minutes",
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("slide_out").start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT bar.start AS s FROM slide_out ORDER BY s"
        ).collect()
        # one event, 10-min window sliding every 5 -> lands in 2 bars
        assert [r.s.minute for r in rows] == [0, 5]
    finally:
        q.stop()


def test_stream_dedup_within_watermark(spark, tmp_path):
    from rayforce_spark.streaming import stream_dedup

    jpath = str(tmp_path / "dedupjournal")
    schema = "ts timestamp, doc_id long, text string"
    j = Journal(jpath, schema)
    j.append([
        {"ts": "2024-01-01T00:00:10", "doc_id": 1, "text": "a"},
        {"ts": "2024-01-01T00:00:20", "doc_id": 1, "text": "a"},  # dup
        {"ts": "2024-01-01T00:00:30", "doc_id": 2, "text": "b"},
        {"ts": "2024-01-01T00:01:00", "doc_id": 2, "text": "b"},  # dup
        {"ts": "2024-01-01T00:01:30", "doc_id": 3, "text": "c"},
    ])
    stream = read_journal_stream(spark, jpath, schema)
    out = stream_dedup(stream, ["doc_id"], ts_col="ts",
                       watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory").queryName("dedup_out").start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT doc_id FROM dedup_out ORDER BY doc_id").collect()
        assert [r.doc_id for r in rows] == [1, 2, 3]
    finally:
        q.stop()


def test_empty_parted_and_splayed_read_back(spark, tmp_path):
    """A zero-row write is legal (aggressive filter, fresh ingest dir);
    partitionBy writes no files at all for it, so the readers fall back
    to the schema sidecar (the reference's .d analog) — r7 EDGECHECK."""
    from pyspark.sql import functions as F

    from rayforce_spark.sources import (
        get_parted, get_splayed, set_parted, set_splayed)

    empty = spark.createDataFrame([], "k long, v double, ts timestamp")
    p1 = str(tmp_path / "splay")
    set_splayed(empty, p1)
    back = get_splayed(spark, p1)
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == ["k", "v", "ts"]

    p2 = str(tmp_path / "part")
    set_parted(empty, p2, "date", part_expr=F.to_date("ts"))
    back2 = get_parted(spark, p2)
    assert back2.count() == 0
    assert "date" in back2.columns


def test_ivf_on_empty_corpus_returns_no_neighbors(spark):
    from rayforce_spark.datapipe.similarity import ivf_train, knn_ivf

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert ivf_train(empty, "embedding", "vec_id", nlist=4, iters=2) == []
    out = knn_ivf(empty, empty, "embedding", "vec_id", k=3,
                  nlist=4, nprobe=2)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cos", "rank"]


def test_stream_decontaminate_both_impls(spark, tmp_path):
    # streaming twin of datapipe.decontam: docs sharing a 3-gram with
    # the static eval set never reach the sink; both membership impls
    # (plan-literal expr / broadcast+searchsorted pandas) agree with the
    # batch op on the same rows
    from rayforce_spark.datapipe import decontaminate
    from rayforce_spark.streaming import stream_decontaminate

    rows = [
        {"doc_id": 1, "text": "the capital of france is paris indeed"},
        {"doc_id": 2, "text": "completely unrelated text about spark"},
        {"doc_id": 3, "text": "what is the capital of france please"},
    ]
    ev = spark.createDataFrame(
        [(100, "q: capital of france a: paris")], "doc_id long, text string")
    batch_df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string")
    expect = sorted(r.doc_id for r in decontaminate(
        batch_df, ev, "text", "doc_id", n=3).collect())
    assert expect == [2]

    schema = "doc_id long, text string"
    for impl in ("expr", "pandas"):
        jpath = str(tmp_path / f"docs_{impl}")
        j = Journal(jpath, schema)
        j.append(rows[:2])
        j.append(rows[2:])
        out = stream_decontaminate(
            read_journal_stream(spark, jpath, schema), ev, "text",
            n=3, impl=impl)
        q = (out.writeStream.outputMode("append")
             .format("memory").queryName(f"decon_{impl}").start())
        try:
            q.processAllAvailable()
            got = sorted(r.doc_id for r in
                         spark.sql(f"SELECT doc_id FROM decon_{impl}")
                         .collect())
        finally:
            q.stop()
        assert got == expect, impl


def test_stream_decontaminate_empty_eval_passthrough(spark, tmp_path):
    from rayforce_spark.streaming import stream_decontaminate

    ev = spark.createDataFrame([], "doc_id long, text string")
    schema = "doc_id long, text string"
    jpath = str(tmp_path / "docs_empty_ev")
    j = Journal(jpath, schema)
    j.append([{"doc_id": 7, "text": "anything at all goes through"}])
    out = stream_decontaminate(
        read_journal_stream(spark, jpath, schema), ev, "text", n=3)
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("decon_empty").start())
    try:
        q.processAllAvailable()
        got = [r.doc_id for r in
               spark.sql("SELECT doc_id FROM decon_empty").collect()]
    finally:
        q.stop()
    assert got == [7]


def test_stream_decontaminate_eval_size_guard(spark, tmp_path):
    import pytest

    from rayforce_spark.streaming import stream_decontaminate

    ev = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string")
    schema = "doc_id long, text string"
    jpath = str(tmp_path / "guard")
    Journal(jpath, schema).append([{"doc_id": 1, "text": "x y z"}])
    st = read_journal_stream(spark, jpath, schema)
    with pytest.raises(ValueError, match="max_eval_grams"):
        stream_decontaminate(st, ev, "text", n=3, max_eval_grams=2)


def test_quality_and_repetition_exprs_stream(spark, tmp_path):
    # the scan-stage curation expressions (quality score, repetition
    # gate) are stateless and must run unchanged at streaming ingest
    from pyspark.sql import functions as F

    from rayforce_spark.datapipe import quality_score, repetition_ok

    schema = "doc_id long, text string"
    jpath = str(tmp_path / "qstream")
    Journal(jpath, schema).append([
        {"doc_id": 1, "text": "spam spam spam spam spam spam"},
        {"doc_id": 2, "text": "a quick brown fox jumps over the dog"},
    ])
    out = read_journal_stream(spark, jpath, schema).select(
        "doc_id",
        quality_score(F.col("text")).alias("q"),
        repetition_ok(F.col("text")).alias("ok"),
    )
    qq = (out.writeStream.outputMode("append")
          .format("memory").queryName("qrep").start())
    try:
        qq.processAllAvailable()
        rows = {r.doc_id: (r.q, r.ok) for r in
                spark.sql("SELECT * FROM qrep").collect()}
    finally:
        qq.stop()
    assert rows[1][1] is False and rows[2][1] is True
    assert 0.0 <= rows[1][0] <= 1.0 and 0.0 <= rows[2][0] <= 1.0
