"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169), Spark-first.

The published recipe: estimate a feature distribution for the TARGET
domain and for the RAW pool (the paper uses hashed n-gram bag models),
weight each raw example by log p_target(x) - log p_raw(x), and resample
with Gumbel-top-k. Here both distributions are the same add-alpha
bigram LM ``datapipe.text.bigram_lm_score`` fits (length-normalized,
i.e. mean per-bigram log-prob — the paper's normalization choice), and
the Gumbel noise is DETERMINISTIC and ENGINE-PORTABLE: u =
(knuth_bucket(id, salt) + 0.5) / grain mapped to (0,1), g = -ln(-ln u)
— the same Knuth-multiplicative reproducible-randomness idiom as
``sampling.hash_bucket`` (plain bigint arithmetic, so a DuckDB/Trino
oracle replays the exact subset), identical across runs,
partitionings, and engines.

Scale shape: the raw pool is tokenized/exploded ONCE into per-doc
bigram counts, both models' count tables join against that single
stream, one keyed re-aggregate emits both NLLs, then ONE
TakeOrdered(k) — no global sort, no driver-side loop, no second pass
over the corpus. The target corpus is small by definition (a
benchmark/domain sample), so its model is cheap; the raw pool streams
through joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rayforce_spark.datapipe.sampling import _GRAIN, hash_bucket
from rayforce_spark.datapipe.text import (
    _doc_bigram_counts,
    _lm_counts,
    _lm_nll,
)


def dsir_weights(raw: DataFrame, target: DataFrame, text_col: str,
                 id_col: str, *, alpha: float = 0.1) -> DataFrame:
    """``raw`` plus ``log_w`` = mean-per-bigram [log p_target - log
    p_raw] (positive = looks more like the target domain than the pool;
    null for docs with no bigrams).

    Single corpus pass (r8): the raw pool is tokenized/exploded ONCE
    and both models join against the same per-doc bigram-count stream —
    the two-scoring formulation re-exploded and re-joined the whole
    corpus per model (~2x the heavy side for identical numbers)."""
    uni_r, big_r, v_r = _lm_counts(raw, text_col, vname="__Vr")
    uni_t, big_t, v_t = _lm_counts(target, text_col, vname="__Vt")
    doc_g = _doc_bigram_counts(raw, text_col, id_col)
    j = (doc_g
         .join(big_r.withColumnRenamed("c2", "c2r"), "g", "left")
         .join(big_t.withColumnRenamed("c2", "c2t"), "g", "left")
         .withColumn("w1", F.split("g", " ").getItem(0))
         .join(uni_r.withColumnRenamed("w", "w1")
               .withColumnRenamed("c1", "c1r"), "w1", "left")
         .join(uni_t.withColumnRenamed("w", "w1")
               .withColumnRenamed("c1", "c1t"), "w1", "left")
         # both vocabulary sizes ride in as ONE-ROW broadcast hash
         # joins on a constant key (see _lm_counts) — no eager count
         # pass over either corpus
         .withColumn("__one", F.lit(1))
         .join(F.broadcast(v_r.withColumn("__one", F.lit(1))), "__one")
         .join(F.broadcast(v_t.withColumn("__one", F.lit(1))), "__one"))
    per = j.groupBy("__did").agg(
        F.round(F.sum(F.col("__n") * _lm_nll("c2r", "c1r", "__Vr", alpha))
                / F.sum("__n"), 6).alias("__nll_raw"),
        F.round(F.sum(F.col("__n") * _lm_nll("c2t", "c1t", "__Vt", alpha))
                / F.sum("__n"), 6).alias("__nll_tgt"))
    return (
        raw.join(per, raw[id_col] == per["__did"], "left")
        .withColumn(
            "log_w",
            F.round(F.col("__nll_raw") - F.col("__nll_tgt"), 6))
        .drop("__did", "__nll_raw", "__nll_tgt"))


def dsir_select(raw: DataFrame, target: DataFrame, text_col: str,
                id_col: str, *, k: int, alpha: float = 0.1,
                salt: int = 0, noise: bool = True) -> DataFrame:
    """Gumbel-top-k importance resampling: keep the ``k`` raw docs with
    the largest log_w + Gumbel(hash(id, salt)) — the paper's sampler
    with reproducible noise (same subset across runs/partitionings for
    a fixed salt; vary the salt for fresh draws). ``noise=False`` is
    the deterministic-top-k variant (pure highest-weight selection, no
    resampling diversity). Docs with no bigrams (null log_w) are never
    selected. Ties break by id for a total order."""
    w = dsir_weights(raw, target, text_col, id_col, alpha=alpha)
    pri = F.col("log_w")
    if noise:
        # strictly inside (0,1) — the +0.5 keeps both logs finite
        u = ((hash_bucket(id_col, _GRAIN, salt).cast("double")
              + F.lit(0.5)) / F.lit(float(_GRAIN)))
        pri = F.round(pri - F.log(-F.log(u)), 6)
    return (
        w.filter(F.col("log_w").isNotNull())
        .withColumn("__pri", pri)
        .orderBy(F.col("__pri").desc(), F.col(id_col))
        .limit(k)
        .drop("__pri")
    )
