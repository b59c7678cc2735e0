"""End-to-end training-batch preparation: curated corpus -> packed,
epoch-shuffled training shards, plus a persisted ANN index.

Chains the r9 additions on top of curate():
  1. curate the corpus (dedup + quality + decontamination),
  2. shuffle_epoch — deterministic per-epoch permutation, no global
     sort, no RNG state,
  3. pack_greedy — doc-boundary first-fit packs at a token budget
     (text never enters Python; slim (id, n_tok) Arrow scan),
  4. write the packed epoch as JSONL shards in (shard, pos) order —
     the files a training loader streams,
  5. set_ivf — persist a probe-ready ANN index over the embeddings
     (train once, probe many),
  6. day-2 ingest — dedup a new batch against the curated corpus's
     persisted MinHash index (old corpus never re-scanned), keep the
     fresh docs, extend the index,
  7. same loop against the persisted SimHash index (r10) — the
     hamming-distance near-dup family gets the identical
     set/probe/extend shape, so a pipeline can run either (or both)
     incrementally.

Run: python examples/train_prep.py [sf_dir]  (default /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rayforce_spark.datapipe import (
    curate,
    extend_minhash_index,
    extend_simhash_index,
    minhash_index_pairs,
    pack_greedy,
    set_minhash_index,
    set_simhash_index,
    shuffle_epoch,
    simhash_index_pairs,
)
from rayforce_spark.datapipe.similarity import knn_ivf_indexed, set_ivf
from rayforce_spark.session import get_spark, load_tables
from rayforce_spark.sources import read_jsonl, write_jsonl


def main():
    sf = (sys.argv[1] if len(sys.argv) > 1
          and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.001")
    spark = get_spark("example_train_prep")
    t = load_tables(spark, sf)
    out = tempfile.mkdtemp(prefix="train_prep_")

    docs = t["documents"]
    holdout = docs.filter(F.col("doc_id") % 97 == 0)
    kept = curate(
        docs.filter(F.col("doc_id") % 97 != 0),
        segment_dedup=3,
        neardup_threshold=0.8,
        decontam_against=holdout, decontam_n=3,
    )
    print(f"curated: {docs.count()} -> {kept.count()} docs")

    for epoch in range(2):
        ep = shuffle_epoch(kept.select("doc_id", "text"), "doc_id",
                           epoch=epoch, shards=4)
        # pack ALONG the epoch's layout: shard_col/order_col make the
        # packer follow shuffle_epoch's (shard, pos) permutation instead
        # of re-hashing by doc_id (r9 review: without these the packer
        # silently clobbered the epoch shard — now that raises)
        packed = pack_greedy(ep, "text", "doc_id", budget=512,
                             shard_col="shard", order_col="pos")
        path = f"{out}/epoch={epoch}"
        write_jsonl(
            packed.repartition(4, "shard")
            .sortWithinPartitions("shard", "pos")
            .select("doc_id", "shard", "pos", "pack", "n_tok", "text"),
            path,
        )
        back = read_jsonl(spark, path,
                          ["doc_id", "shard", "pos", "pack", "n_tok"],
                          ["i64", "i64", "i64", "i64", "i64"])
        n_packs = back.select("shard", "pack").distinct().count()
        print(f"epoch {epoch}: {back.count()} docs -> {n_packs} packs "
              f"at budget 512 ({path})")

    idx = f"{out}/ivf"
    set_ivf(t["embeddings"], idx, "embedding", "vec_id", nlist=8, iters=3)
    probes = t["embeddings"].filter(F.col("vec_id") < 3)
    nn = knn_ivf_indexed(spark, idx, probes, "embedding", k=3, nprobe=3)
    print("ANN probes against the persisted index:")
    nn.orderBy("query_id", "rank").show(9, truncate=False)

    # day-2 ingest: dedup a NEW batch against the curated corpus's
    # persisted MinHash index (the old corpus is never re-scanned),
    # then extend the index with what survived
    mh = f"{out}/minhash"
    set_minhash_index(kept.select("doc_id", "text"), mh, "text", "doc_id",
                      shingle_k=1)
    day2 = docs.filter(F.col("doc_id") % 97 == 1).select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"), "text")
    # the probe feeds three consumers (dup count, the anti join, and
    # the extend of what survived) — materialize it once
    dups = minhash_index_pairs(mh, day2, "text", "doc_id",
                               threshold=0.8).localCheckpoint(eager=False)
    fresh = day2.join(dups.select(F.col("new_id").alias("doc_id")),
                      "doc_id", "left_anti").localCheckpoint(eager=False)
    print(f"day-2 ingest: {day2.count()} new docs, "
          f"{dups.select('new_id').distinct().count()} near-dups of the "
          f"indexed corpus dropped, {fresh.count()} kept")
    extend_minhash_index(fresh, mh, "text", "doc_id")

    # same day-2 loop on the SimHash family (r10): hamming-distance
    # near-dups against a persisted banded-fingerprint index
    sh = f"{out}/simhash"
    set_simhash_index(kept.select("doc_id", "text"), sh, "text", "doc_id",
                      max_hamming=3)
    sdups = simhash_index_pairs(sh, day2, "text", "doc_id") \
        .localCheckpoint(eager=False)
    sfresh = day2.join(sdups.select(F.col("new_id").alias("doc_id")),
                       "doc_id", "left_anti").localCheckpoint(eager=False)
    print(f"day-2 simhash: {sdups.select('new_id').distinct().count()} "
          f"hamming<=3 near-dups of the indexed corpus, "
          f"{sfresh.count()} kept")
    extend_simhash_index(sfresh, sh, "text", "doc_id")


if __name__ == "__main__":
    main()
