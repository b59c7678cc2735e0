"""Large-scale training-data pipeline operators (beyond the reference).

These are first-class engine components designed for the 100 TB case:
every algorithm is expressed as keyed shuffles over built-in expressions
(no driver-side loops, no per-row Python except where Arrow-batched and
noted), so Catalyst/AQE handle skew, pushdown and partial aggregation.

dedup       — exact, minhash-LSH, simhash, n-gram Jaccard, embedding-cosine
similarity  — brute-force cosine top-k; LSH-bucketed ANN scale path
text        — language id, quality scoring, token counting, fingerprinting,
              Gopher-style repetition metrics (top/dup n-gram fractions)
decontam    — benchmark decontamination (n-gram overlap vs a held-out
              eval set; broadcast semi join — the corpus never shuffles)
dsir        — Data Selection via Importance Resampling (target-vs-pool
              bigram-LM weights, hash-seeded Gumbel-top-k)
sampling    — deterministic hash sampling, train/val/test folds, per-key
              caps, corpus mixing (reproducible across runs and engines)
multimodal  — opaque binary columns + typed metadata; decode/feature UDF
              plumbing (decoders stubbed: image/audio libs not installed)
"""

from rayforce_spark.datapipe.dedup import (
    compact_jaccard_index,
    compact_minhash_index,
    stamp_index_format,
    compact_simhash_index,
    dedup_clusters,
    dedup_exact,
    dedup_keep_canonical,
    dedup_segments,
    embedding_dup_pairs,
    jaccard_dup_pairs,
    extend_jaccard_index,
    jaccard_index_pairs,
    set_jaccard_index,
    extend_minhash_index,
    minhash_index_pairs,
    minhash_lsh_pairs,
    set_minhash_index,
    extend_simhash_index,
    set_simhash_index,
    simhash,
    simhash_dup_pairs,
    simhash_index_pairs,
)
from rayforce_spark.datapipe.multimodal import (
    attach_binary,
    extract_features,
    resize_media,
    sample_frames,
)
from rayforce_spark.datapipe.sampling import (
    assign_folds,
    cap_per_key,
    hash_bucket,
    mix_corpora,
    sample_hash,
    shuffle_epoch,
    train_val_test_split,
)
from rayforce_spark.datapipe.similarity import (
    embedding_dup_pairs_lsh,
    ivf_train,
    knn_cosine,
    knn_ivf,
    knn_lsh,
)
from rayforce_spark.datapipe.pipeline import curate
from rayforce_spark.datapipe.sessions import sessionize_batch
from rayforce_spark.datapipe.dsir import dsir_select, dsir_weights
from rayforce_spark.datapipe.packing import pack_greedy, pack_offsets
from rayforce_spark.datapipe.decontam import (
    contaminated_ids,
    decontaminate,
    flag_contaminated,
)
from rayforce_spark.datapipe.text import (
    bigram_lm_score,
    doc_fingerprint,
    dup_ngram_frac,
    filter_by_lm_quantile,
    filter_by_quality_quantile,
    language_id,
    ngram_counts,
    quality_score,
    repetition_metrics,
    repetition_ok,
    repetition_stats,
    scrub_pii,
    token_count,
    top_ngram_frac,
)

__all__ = [
    "assign_folds",
    "attach_binary",
    "cap_per_key",
    "hash_bucket",
    "mix_corpora",
    "sample_hash",
    "shuffle_epoch",
    "train_val_test_split",
    "dedup_clusters",
    "curate",
    "dedup_exact",
    "dedup_keep_canonical",
    "dedup_segments",
    "extract_features",
    "resize_media",
    "sample_frames",
    "sessionize_batch",
    "embedding_dup_pairs",
    "embedding_dup_pairs_lsh",
    "jaccard_dup_pairs",
    "compact_jaccard_index",
    "compact_minhash_index",
    "stamp_index_format",
    "compact_simhash_index",
    "extend_jaccard_index",
    "jaccard_index_pairs",
    "set_jaccard_index",
    "extend_minhash_index",
    "minhash_index_pairs",
    "minhash_lsh_pairs",
    "set_minhash_index",
    "extend_simhash_index",
    "set_simhash_index",
    "simhash",
    "simhash_dup_pairs",
    "simhash_index_pairs",
    "ivf_train",
    "knn_cosine",
    "knn_ivf",
    "knn_lsh",
    "contaminated_ids",
    "decontaminate",
    "dsir_select",
    "pack_greedy",
    "pack_offsets",
    "dsir_weights",
    "flag_contaminated",
    "bigram_lm_score",
    "doc_fingerprint",
    "dup_ngram_frac",
    "repetition_metrics",
    "repetition_ok",
    "repetition_stats",
    "top_ngram_frac",
    "filter_by_lm_quantile",
    "filter_by_quality_quantile",
    "language_id",
    "ngram_counts",
    "scrub_pii",
    "quality_score",
    "token_count",
]
