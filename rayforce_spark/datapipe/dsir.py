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

Scale shape: two LM scorings (each: two count aggregations + a model
join + a keyed re-aggregate — see bigram_lm_score) followed by ONE
TakeOrdered(k) — no global sort, no driver-side loop. The target corpus
is small by definition (a benchmark/domain sample), so its model is
cheap; the raw pool streams through joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rayforce_spark.datapipe.sampling import _GRAIN, hash_bucket
from rayforce_spark.datapipe.text import bigram_lm_score


def dsir_weights(raw: DataFrame, target: DataFrame, text_col: str,
                 id_col: str, *, alpha: float = 0.1) -> DataFrame:
    """``raw`` plus ``log_w`` = mean-per-bigram [log p_target - log
    p_raw] (positive = looks more like the target domain than the pool;
    null for docs with no bigrams)."""
    scored = bigram_lm_score(
        raw, text_col, id_col, alpha=alpha, out_col="__nll_raw")
    scored = bigram_lm_score(
        scored, text_col, id_col, alpha=alpha, out_col="__nll_tgt",
        model_df=target)
    return scored.withColumn(
        "log_w",
        F.round(F.col("__nll_raw") - F.col("__nll_tgt"), 6),
    ).drop("__nll_raw", "__nll_tgt")


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
