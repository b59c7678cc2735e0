"""The beyond-reference story: curate a document corpus for training.

One deterministic plan chains the datapipe stages (repetition gate ->
C4-style segment dedup -> exact dedup -> MinHash near-dup removal ->
per-language quality floor -> decontamination vs a held-out eval split
-> 50% subsample + folds -> per-language cap), then an ANN query finds
the nearest neighbors of a few embeddings — the two workloads a
training-data pipeline runs daily.

Run: python examples/curate.py [sf_dir]   (default /root/testdata/sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rayforce_spark.datapipe import curate, knn_cosine
from rayforce_spark.session import get_spark, load_tables


def main():
    sf = (sys.argv[1] if len(sys.argv) > 1
          and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.001")
    spark = get_spark("example_curate")
    t = load_tables(spark, sf)

    docs = t["documents"]
    n0 = docs.count()
    holdout = docs.filter(F.col("doc_id") % 97 == 0)  # stand-in eval set
    kept = curate(
        docs.filter(F.col("doc_id") % 97 != 0),
        repetition_gate=True,
        segment_dedup=3,
        neardup_threshold=0.8,
        min_quality_quantile=0.2, quality_by="lang",
        decontam_against=holdout, decontam_n=3,
        sample_fraction=0.5, sample_salt=7, fold_salt=11,
        cap_key="lang", cap_n=100,
    )
    print(f"curated {n0} -> {kept.count()} docs")
    kept.groupBy("lang", "fold").count().orderBy("lang", "fold").show()

    # DSIR leg (Xie et al. 2023): re-rank the curated pool toward a
    # target domain (here: the longest docs stand in for the domain
    # sample) and keep the 20 highest-importance docs, reproducibly
    from rayforce_spark.datapipe import dsir_select

    domain = docs.orderBy(F.length("text").desc(), "doc_id").limit(25)
    dsir = dsir_select(kept, domain, "text", "doc_id", k=20, salt=1)
    print(f"DSIR-selected {dsir.count()} docs toward the long-doc domain")

    # pack the curated pool into training sequences: doc-boundary
    # first-fit packs (never split a doc) at a 2048-token budget
    from rayforce_spark.datapipe import pack_greedy

    packed = pack_greedy(kept, "text", "doc_id", budget=2048, shards=4)
    n_packs = packed.select("shard", "pack").distinct().count()
    print(f"packed {packed.count()} curated docs into {n_packs} "
          "training sequences (budget 2048 tokens)")

    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 3)
    print("top-3 cosine neighbors per query vector:")
    knn_cosine(emb, queries, "embedding", "vec_id", k=3).show()

    # multimodal leg: REAL decode through the stdlib codecs — each kept
    # doc gets a synthesized BMP (a real 24-bit file, parsed back by the
    # hand-rolled parser) whose decoded stats become feature columns
    from rayforce_spark.datapipe.multimodal import (
        extract_features, synthesize_media)

    media = synthesize_media(kept.select("doc_id"), "doc_id", kind="image")
    feats = extract_features(media, id_col="doc_id", dim=4,
                             decoder="stdlib")
    print("decoded image features (w, h, mean, std) for 5 curated docs:")
    feats.select(
        "doc_id",
        *[F.element_at("features", i + 1).alias(n)
          for i, n in enumerate(("w", "h", "mean", "std"))],
    ).orderBy("doc_id").show(5)


if __name__ == "__main__":
    main()
