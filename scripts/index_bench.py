"""Day-2 ingestion cost evidence for the persisted dedup indexes (r10).

Builds each index (minhash / simhash / jaccard) over 90% of the sf0.1
documents, probes the held-out 10% batch against it, and extends —
recording per-step wall seconds plus the probe result size. The point
on record: a probe's cost is O(batch) joins against on-disk tables, not
O(corpus) recompute — day-2 ingestion never re-shingles, re-fingerprints
or re-sorts the indexed corpus.

Usage: python scripts/index_bench.py [sf_dir]   (appends nothing; prints
one JSON line — paste/record into SCALE.md manually)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main():
    from pyspark.sql import functions as F

    from rayforce_spark.datapipe import (
        extend_jaccard_index, extend_minhash_index, extend_simhash_index,
        jaccard_index_pairs, minhash_index_pairs, set_jaccard_index,
        set_minhash_index, set_simhash_index, simhash_index_pairs)
    from rayforce_spark.session import get_spark

    spark = get_spark("index_bench")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text")
    old = docs.filter(F.col("doc_id") % 10 != 0).localCheckpoint()
    new = docs.filter(F.col("doc_id") % 10 == 0).localCheckpoint()
    base = tempfile.mkdtemp(prefix="rf_idx_bench_")
    out: dict[str, dict] = {}

    def leg(name, set_fn, probe_fn, extend_fn):
        p = f"{base}/{name}"
        t0 = time.time()
        set_fn(p)
        t1 = time.time()
        n = probe_fn(p).count()
        t2 = time.time()
        extend_fn(p)
        t3 = time.time()
        out[name] = {"build_s": round(t1 - t0, 1),
                     "probe_s": round(t2 - t1, 1),
                     "extend_s": round(t3 - t2, 1),
                     "probe_pairs": n}

    leg("minhash",
        lambda p: set_minhash_index(old, p, "text", "doc_id",
                                    num_perm=64, bands=16, shingle_k=3),
        lambda p: minhash_index_pairs(p, new, "text", "doc_id",
                                      threshold=0.5),
        lambda p: extend_minhash_index(new, p, "text", "doc_id"))
    leg("simhash",
        lambda p: set_simhash_index(old, p, "text", "doc_id",
                                    max_hamming=3),
        lambda p: simhash_index_pairs(p, new, "text", "doc_id"),
        lambda p: extend_simhash_index(new, p, "text", "doc_id"))
    leg("jaccard",
        lambda p: set_jaccard_index(old, p, "text", "doc_id",
                                    shingle_k=1, threshold=0.8),
        lambda p: jaccard_index_pairs(p, new, "text", "doc_id"),
        lambda p: extend_jaccard_index(new, p, "text", "doc_id"))

    # pair-free probe (r11): same jaccard index (post-extend),
    # mode="reps" — one row per matched new doc instead of the
    # O(dups²) pair set
    t0 = time.time()
    nreps = jaccard_index_pairs(f"{base}/jaccard", new, "text", "doc_id",
                                mode="reps").count()
    out["jaccard"]["probe_reps_s"] = round(time.time() - t0, 1)
    out["jaccard"]["probe_reps_rows"] = nreps

    # fragmentation leg (r11): a long-running streaming ingest appends
    # fragments per micro-batch; measure a 12-extend index's probe,
    # compact it, and show the probe unchanged-or-restored with the
    # file count collapsed
    from rayforce_spark.datapipe import compact_minhash_index

    p = f"{base}/frag"
    set_minhash_index(old, p, "text", "doc_id",
                      num_perm=64, bands=16, shingle_k=3)
    for k in range(12):
        extend_minhash_index(
            new.filter(F.expr(f"(doc_id div 10) % 12 = {k}")),
            p, "text", "doc_id")
    t0 = time.time()
    n1 = minhash_index_pairs(p, new, "text", "doc_id", threshold=0.5).count()
    t1 = time.time()
    files = compact_minhash_index(spark, p)
    t2 = time.time()
    n2 = minhash_index_pairs(p, new, "text", "doc_id", threshold=0.5).count()
    t3 = time.time()
    out["compaction"] = {
        "probe_frag_s": round(t1 - t0, 1),
        "compact_s": round(t2 - t1, 1),
        "probe_compacted_s": round(t3 - t2, 1),
        "files": files, "pairs_equal": n1 == n2}

    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"sf_dir": SF, "old_docs": old.count(),
                      "new_docs": new.count(), "legs": out}))


if __name__ == "__main__":
    main()
