"""Plan-quality audit: assert the physical plans we'd want at 100 TB.

Checks, per headline query:
  * parquet pushdown — filters reach the scan (PushedFilters), projection
    is pruned (ReadSchema contains only needed columns)
  * broadcast — small dimension joins use BroadcastHashJoin
  * partial aggregation — hash aggregates run partial+final
  * whole-stage codegen — hot expressions are fused

Usage: python scripts/explain_audit.py  (exits nonzero on violations)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def main():
    from rayforce_spark import A, select, inner_join
    from rayforce_spark.session import get_spark, load_tables

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("explain_audit")
    t = load_tables(spark, sf)
    failures = []

    def check(name, plan, needle, want=True):
        ok = (needle in plan) == want
        print(f"[{'ok' if ok else 'VIOLATION'}] {name}: "
              f"{'has' if want else 'lacks'} {needle!r}")
        if not ok:
            failures.append(name)
            print(plan[:4000])

    # 1. filter + projection pushdown to parquet
    q = select(
        t["lineitem"],
        {"sum_qty": A.sum_("l_quantity")},
        where=F.col("l_shipdate") <= "1998-09-02",
        by="l_returnflag",
    )
    p = plan_of(q)
    check("pushdown.filter", p, "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate")
    check("pushdown.prune", p, "ReadSchema: struct<l_quantity:double,l_returnflag:string,l_shipdate:timestamp_ntz>")

    # 2. partial+final hash aggregation (the reference's partial/final pool
    # model, ref core/aggr.c:262-294, is Spark's default — verify it stays)
    check("agg.partial", p, "HashAggregate")
    assert p.count("HashAggregate") >= 2, "expected partial+final agg"

    # 3. small dimension join broadcasts (no shuffle of the big side)
    j = inner_join(
        t["orders"],
        t["customer"].withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey",
    ).select("o_orderkey", "c_name")
    pj = plan_of(j)
    check("join.broadcast", pj, "BroadcastHashJoin")
    check("join.no_sortmerge", pj, "SortMergeJoin", want=False)

    # 4. whole-stage codegen covers the scan->project->agg pipeline
    # (markers only appear in codegen-mode explain under AQE)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("codegen")
    check("codegen", buf.getvalue(), "WholeStageCodegen subtrees")

    # 5. asof join: exactly one shuffle (on keys) feeding the window
    from rayforce_spark import asof_join

    ev = t["events"]
    l = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value")
    r = ev.filter(F.col("event_type") == "click").select("user_id", "ts", F.col("value").alias("cv"))
    pa = plan_of(asof_join(l, r, on="user_id", asof="ts"))
    n_exchanges = pa.count("Exchange hashpartitioning")
    print(f"[{'ok' if n_exchanges == 1 else 'VIOLATION'}] asof.one_shuffle: "
          f"{n_exchanges} hash exchange(s)")
    if n_exchanges != 1:
        failures.append("asof.one_shuffle")

    # 6. median-split: the mixed-stats agg keeps its non-median aggregates
    # in codegen'd HashAggregate (no Expand dragging them onto the
    # object-hash path)
    stats = select(
        t["lineitem"],
        {
            "avg_price": A.avg("l_extendedprice"),
            "med_qty": A.med("l_quantity"),
            "n_parts": A.count_distinct("l_partkey"),
        },
        by="l_returnflag",
    )
    ps = plan_of(stats)
    # the median side may use object/sort agg — but avg/count_distinct must
    # appear under a plain HashAggregate, which the split guarantees
    check("medsplit.fast_path", ps.split("median")[0], "HashAggregate")

    # 7. batch sessionization: one shuffle on the key feeds both windows
    # and the final aggregation
    from rayforce_spark.datapipe import sessionize_batch

    sess = sessionize_batch(
        t["events"], key_col="user_id", ts_col="ts",
        gap=1800 * 1_000_000_000, tiebreak=["event_id"],
    )
    psess = plan_of(sess)
    n_ex = psess.count("Exchange hashpartitioning")
    print(f"[{'ok' if n_ex == 1 else 'VIOLATION'}] sessionize.one_shuffle: "
          f"{n_ex} hash exchange(s)")
    if n_ex != 1:
        failures.append("sessionize.one_shuffle")

    # 7b. fixed-offset window join: the block-decomposed plan is exactly
    # two hash exchanges (right+probes into the running-agg window,
    # probes into the per-row fold) — a third would mean the join-back
    # crept back in
    from rayforce_spark.operators.joins import window_join

    import rayforce_spark.functions.aggregates as AGG

    wj = window_join(
        l, r, on="user_id", time_col="ts",
        lo=-300_000_000_000, hi=300_000_000_000,
        aggs={"n_cv": AGG.count("cv"), "max_cv": AGG.max_("cv")},
        row_id_col="event_id",
    )
    pwj = plan_of(wj)
    n_wx = pwj.count("Exchange hashpartitioning")
    print(f"[{'ok' if n_wx == 2 else 'VIOLATION'}] window_join_fixed.two_shuffles: "
          f"{n_wx} hash exchange(s)")
    if n_wx != 2:
        failures.append("window_join_fixed.two_shuffles")

    # 7c. kdb-convention window join (wj: prevailing row + (lo,hi]):
    # the composed plan must never enumerate pairs via a cartesian, and
    # its exchange budget is the sum of its parts (in-window generic
    # join + asof + merge join-back), not a blow-up
    from rayforce_spark.operators.joins import window_join_wj

    wjw = window_join_wj(
        l, r, on="user_id", time_col="ts",
        lo=-300_000_000_000, hi=300_000_000_000,
        aggs={"n_cv": AGG.count("cv"), "max_cv": AGG.max_("cv")},
        row_id_col="event_id",
    )
    pwjw = plan_of(wjw)
    check("window_join_wj.no_cartesian", pwjw, "CartesianProduct", want=False)
    n_wjx = pwjw.count("Exchange hashpartitioning")
    ok_wjx = n_wjx <= 6
    print(f"[{'ok' if ok_wjx else 'VIOLATION'}] window_join_wj.bounded_shuffles: "
          f"{n_wjx} hash exchange(s) (budget 6)")
    if not ok_wjx:
        failures.append("window_join_wj.bounded_shuffles")

    # 7d. text-curation ops: scrub_pii is pure scan-stage (ZERO
    # exchanges); ngram_counts is explode + ONE hash shuffle + a
    # TakeOrdered (never a global sort of the full ngram table)
    from rayforce_spark.datapipe import ngram_counts, scrub_pii

    docs = t["documents"]
    pscrub = plan_of(docs.select(scrub_pii(F.col("text")).alias("s")))
    n_sx = pscrub.count("Exchange")
    print(f"[{'ok' if n_sx == 0 else 'VIOLATION'}] pii_scrub.no_shuffle: "
          f"{n_sx} exchange(s)")
    if n_sx:
        failures.append("pii_scrub.no_shuffle")
    png = plan_of(ngram_counts(docs, "text", n=2, top_k=50))
    n_gx = png.count("Exchange hashpartitioning")
    ok_g = n_gx == 1 and "TakeOrderedAndProject" in png
    print(f"[{'ok' if ok_g else 'VIOLATION'}] ngram.one_shuffle_topk: "
          f"{n_gx} hash exchange(s), TakeOrdered="
          f"{'TakeOrderedAndProject' in png}")
    if not ok_g:
        failures.append("ngram.one_shuffle_topk")

    # 7d-bis (r7). repetition metrics are a per-row sorted-array fold —
    # ZERO exchanges, no explode of the gram table; decontamination
    # probes the eval gram set via BROADCAST semi join (the training
    # corpus must never shuffle) and the final anti join is likewise
    # broadcast — no cartesian anywhere
    from rayforce_spark.datapipe import (
        decontaminate,
        dup_ngram_frac,
        top_ngram_frac,
    )

    prep = plan_of(docs.select(
        top_ngram_frac(F.col("text"), 2).alias("t2"),
        dup_ngram_frac(F.col("text"), 3).alias("d3")))
    n_rx = prep.count("Exchange")
    print(f"[{'ok' if n_rx == 0 else 'VIOLATION'}] repetition.no_shuffle: "
          f"{n_rx} exchange(s)")
    if n_rx:
        failures.append("repetition.no_shuffle")
    pdec = plan_of(decontaminate(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0), "text", "doc_id", n=3))
    n_dx = pdec.count("Exchange hashpartitioning")
    # exactly 2 hash exchanges, BOTH eval-sized: the eval-gram distinct
    # (pre-broadcast) and the contaminated-id distinct. The train corpus
    # itself must never hash-shuffle.
    ok_d = ("CartesianProduct" not in pdec
            and "BroadcastHashJoin" in pdec and "LeftSemi" in pdec
            and "Exchange SinglePartition" not in pdec
            and n_dx == 2)
    print(f"[{'ok' if ok_d else 'VIOLATION'}] decontaminate.broadcast_probe: "
          f"bcast_semi={'LeftSemi' in pdec and 'BroadcastHashJoin' in pdec}, "
          f"cartesian={'CartesianProduct' in pdec}, hash_exchanges={n_dx}")
    if not ok_d:
        failures.append("decontaminate.broadcast_probe")

    # 7d-ter (r7). segment-level dedup (C4 span-dedup rule): the
    # first-occurrence pass must be the skew-immune agg+join shape —
    # bounded hash exchanges, no per-segment sort window, no cartesian,
    # no single-partition exchange
    from rayforce_spark.datapipe import dedup_segments

    pseg = plan_of(dedup_segments(docs, "text", "doc_id",
                                  words_per_segment=3))
    n_sgx = pseg.count("Exchange hashpartitioning")
    ok_sg = ("CartesianProduct" not in pseg
             and "Exchange SinglePartition" not in pseg
             and "Window" not in pseg
             and n_sgx <= 3)
    print(f"[{'ok' if ok_sg else 'VIOLATION'}] dedup_segments.agg_join: "
          f"hash_exchanges={n_sgx}, window={'Window' in pseg}, "
          f"cartesian={'CartesianProduct' in pseg}")
    if not ok_sg:
        failures.append("dedup_segments.agg_join")

    # 7d-quater (r8). DSIR importance resampling: the top-k selection
    # must be a TakeOrdered (no global Sort -> single-partition
    # exchange), and the two LM scorings stay joins, never a cartesian
    from rayforce_spark.datapipe import dsir_select as _dsir

    pds = plan_of(_dsir(docs.filter(F.col("doc_id") % 23 != 0),
                        docs.filter(F.col("doc_id") % 23 == 0),
                        "text", "doc_id", k=50, salt=3))
    # single-partition exchanges are forbidden EXCEPT the keyless
    # partial_count merge (the vocabulary-size 1-row-per-partition
    # aggregate — r9 moved it from an eager driver count INTO the plan,
    # strictly less work; what the pin must keep out is a global SORT
    # or any data-bearing collapse to one partition)
    def _bad_single_partition(plan: str) -> bool:
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            child = lines[i + 1] if i + 1 < len(lines) else ""
            if not ("partial_count" in child and "keys=[]" in child):
                return True
        return False

    ok_ds = ("TakeOrderedAndProject" in pds
             and "CartesianProduct" not in pds
             and not _bad_single_partition(pds))
    print(f"[{'ok' if ok_ds else 'VIOLATION'}] dsir.take_ordered: "
          f"take_ordered={'TakeOrderedAndProject' in pds}, "
          f"cartesian={'CartesianProduct' in pds}, "
          f"global={_bad_single_partition(pds)}")
    if not ok_ds:
        failures.append("dsir.take_ordered")

    # 7d-quinquies (r9). sequence packing: pack_offsets is one hash
    # exchange feeding a per-shard window (never a global sort);
    # pack_greedy's Arrow batch must carry ONLY the slim
    # (id, shard, n_tok) projection — the text column entering
    # FlatMapGroupsInPandas is the r8 whole-shard-of-text shape
    # (~3 TB/task at 100 TB with the default 32 shards)
    from rayforce_spark.datapipe import pack_greedy, pack_offsets

    ppo = plan_of(pack_offsets(docs, "text", "doc_id",
                               budget=2048, shards=8))
    n_pox = ppo.count("Exchange hashpartitioning")
    ok_po = n_pox == 1 and "Exchange SinglePartition" not in ppo
    print(f"[{'ok' if ok_po else 'VIOLATION'}] pack_offsets.one_shuffle: "
          f"{n_pox} hash exchange(s), "
          f"global={'Exchange SinglePartition' in ppo}")
    if not ok_po:
        failures.append("pack_offsets.one_shuffle")

    ppg = plan_of(pack_greedy(docs, "text", "doc_id",
                              budget=2048, shards=8))
    fmg_lines = [ln for ln in ppg.splitlines()
                 if "FlatMapGroupsInPandas" in ln]
    ok_pg = (bool(fmg_lines)
             and all("text" not in ln for ln in fmg_lines)
             and "Exchange SinglePartition" not in ppg
             and "CartesianProduct" not in ppg)
    print(f"[{'ok' if ok_pg else 'VIOLATION'}] pack_greedy.slim_arrow: "
          f"arrow_batch={bool(fmg_lines)}, "
          f"text_in_batch={any('text' in ln for ln in fmg_lines)}, "
          f"global={'Exchange SinglePartition' in ppg}")
    if not ok_pg:
        failures.append("pack_greedy.slim_arrow")

    # 7e. prefix-filtered exact jaccard (r6): candidate generation must
    # be a hash join on the prefix token — never a cartesian/BNLJ — and
    # no global (single-partition) exchange anywhere in the plan
    from rayforce_spark.datapipe import jaccard_dup_pairs

    pjac = plan_of(jaccard_dup_pairs(docs, "text", "doc_id",
                                     threshold=0.8))
    ok_j = ("CartesianProduct" not in pjac
            and "BroadcastNestedLoopJoin" not in pjac
            and "Exchange SinglePartition" not in pjac)
    print(f"[{'ok' if ok_j else 'VIOLATION'}] jaccard_prefix.hash_join: "
          f"cartesian={'CartesianProduct' in pjac}, "
          f"bnlj={'BroadcastNestedLoopJoin' in pjac}, "
          f"global={'Exchange SinglePartition' in pjac}")
    if not ok_j:
        failures.append("jaccard_prefix.hash_join")

    # sampling: hash_bucket/sample_hash/assign_folds are scan-stage
    # expressions (0 exchanges); cap_per_key is exactly one keyed shuffle
    from rayforce_spark.datapipe import cap_per_key, train_val_test_split
    from rayforce_spark.datapipe.sampling import sample_hash

    psm = plan_of(train_val_test_split(
        sample_hash(docs, "doc_id", 0.3), "doc_id"))
    n_smx = psm.count("Exchange")
    print(f"[{'ok' if n_smx == 0 else 'VIOLATION'}] sample.no_shuffle: "
          f"{n_smx} exchange(s)")
    if n_smx:
        failures.append("sample.no_shuffle")
    pcap = plan_of(cap_per_key(docs, "source", 5, "doc_id"))
    n_cx = pcap.count("Exchange hashpartitioning")
    ok_c = n_cx == 1 and "Exchange SinglePartition" not in pcap
    print(f"[{'ok' if ok_c else 'VIOLATION'}] cap_per_key.one_shuffle: "
          f"{n_cx} hash exchange(s)")
    if not ok_c:
        failures.append("cap_per_key.one_shuffle")

    # LSH embedding dedup must candidate-join on (table, key) buckets —
    # never a cartesian/broadcast-nested-loop over the corpus
    from rayforce_spark.datapipe import embedding_dup_pairs_lsh

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    plsh = plan_of(embedding_dup_pairs_lsh(
        emb, "embedding", "vec_id", threshold=0.9, dim=64))
    # slim-pair candidates (r7): the multi-table dropDuplicates must NOT
    # carry vectors/norms through its aggregate (the pre-fix plan's
    # first(__va)/first(__nu) signature — 550 MB shuffle at sf0.1);
    # vectors re-attach via hash joins after the dedup
    ok_l = ("CartesianProduct" not in plsh
            and "BroadcastNestedLoopJoin" not in plsh
            and "first(__v" not in plsh
            and "first(__n" not in plsh)
    print(f"[{'ok' if ok_l else 'VIOLATION'}] dedup_lsh.bucket_join: "
          f"cartesian={'CartesianProduct' in plsh}, "
          f"bnlj={'BroadcastNestedLoopJoin' in plsh}, "
          f"fat_dedup={'first(__v' in plsh or 'first(__n' in plsh}")
    if not ok_l:
        failures.append("dedup_lsh.bucket_join")

    # minhash verify stage (r7 restructure): candidates dedup BEFORE the
    # verify joins, both joins hash joins (no cartesian/BNLJ), and NO
    # post-join aggregate carrying shingle arrays (the pre-r7 plan's
    # 781 MB shuffle)
    from rayforce_spark.datapipe import minhash_lsh_pairs

    pmh = plan_of(minhash_lsh_pairs(
        docs, "text", "doc_id", num_perm=64, bands=16, shingle_k=3,
        threshold=0.5))
    # the pre-r7 plan re-paired legs with max(CASE WHEN ...) over the
    # shingle arrays — a whole extra array-carrying exchange (781 MB at
    # sf0.1); its signature must never reappear
    ok_m = ("CartesianProduct" not in pmh
            and "BroadcastNestedLoopJoin" not in pmh
            and "max(CASE WHEN" not in pmh
            and "array_intersect" in pmh)
    print(f"[{'ok' if ok_m else 'VIOLATION'}] minhash.verify_no_array_agg: "
          f"cartesian={'CartesianProduct' in pmh}, "
          f"legacy_max_case={'max(CASE WHEN' in pmh}")
    if not ok_m:
        failures.append("minhash.verify_no_array_agg")

    # persisted-index probes (r10): the day-2 ingestion path must join
    # the on-disk bucket/prefix tables with HASH joins (no cartesian /
    # BNLJ — a probe that degenerates to all-pairs defeats the index),
    # and the Jaccard probe's verify must stay exact array_intersect
    import shutil as _sh
    import tempfile as _tf

    from rayforce_spark.datapipe import (
        jaccard_index_pairs, minhash_index_pairs, set_jaccard_index,
        set_minhash_index, set_simhash_index, simhash_index_pairs)

    idx_base = _tf.mkdtemp(prefix="rf_audit_idx_")
    try:
        d300 = docs.limit(300)
        probe = docs.limit(60)
        mh_p = f"{idx_base}/mh"
        set_minhash_index(d300, mh_p, "text", "doc_id",
                          num_perm=32, bands=16, shingle_k=1)
        pmi = plan_of(minhash_index_pairs(mh_p, probe, "text", "doc_id",
                                          threshold=0.5))
        sh_p = f"{idx_base}/sh"
        set_simhash_index(d300, sh_p, "text", "doc_id", max_hamming=3)
        psi = plan_of(simhash_index_pairs(sh_p, probe, "text", "doc_id"))
        ja_p = f"{idx_base}/ja"
        set_jaccard_index(d300, ja_p, "text", "doc_id", shingle_k=1,
                          threshold=0.5)
        pji = plan_of(jaccard_index_pairs(ja_p, probe, "text", "doc_id"))
        for nm, pp in (("minhash_index.probe", pmi),
                       ("simhash_index.probe", psi),
                       ("jaccard_index.probe", pji)):
            ok_i = ("CartesianProduct" not in pp
                    and "BroadcastNestedLoopJoin" not in pp
                    and (nm != "jaccard_index.probe"
                         or "array_intersect" in pp))
            print(f"[{'ok' if ok_i else 'VIOLATION'}] {nm}: "
                  f"cartesian={'CartesianProduct' in pp}, "
                  f"bnlj={'BroadcastNestedLoopJoin' in pp}")
            if not ok_i:
                failures.append(nm)
    finally:
        _sh.rmtree(idx_base, ignore_errors=True)

    # 8. no driver-gated query plans a GLOBAL window (empty partition
    # spec = Exchange SinglePartition + full sort — a scale-killer).
    # Walk the optimized logical plan and check Window.partitionSpec
    # directly; plan-string parsing is ambiguous (a partitioned window
    # with no ORDER clause prints the same bracket count as a global one).
    import __spark_entry__ as E

    def walk(node):
        yield node
        it = node.children().iterator()
        while it.hasNext():
            yield from walk(it.next())

    global_windows = []
    for name, fn in E.queries().items():
        try:
            lp = fn(spark, sf)._jdf.queryExecution().optimizedPlan()
            if any(
                n.getClass().getSimpleName() in ("Window", "WindowGroupLimit")
                and n.partitionSpec().isEmpty()
                for n in walk(lp)
            ):
                global_windows.append(name)
        except Exception as e:  # noqa: BLE001 — audit shouldn't die mid-sweep
            print(f"[VIOLATION] window_sweep.{name}: plan failed: {e}")
            failures.append(f"window_sweep.{name}")
    print(f"[{'ok' if not global_windows else 'VIOLATION'}] "
          f"window_sweep: global windows in {global_windows or 'none'}")
    failures.extend(f"window_sweep.{n}" for n in global_windows)

    if failures:
        print(f"\nplan violations: {failures}")
        sys.exit(1)
    print("\nall plan checks pass")


if __name__ == "__main__":
    main()
