"""Benchmark decontamination: drop training documents that share any
word n-gram with a held-out evaluation set.

This is the standard public recipe (GPT-3 paper appendix C 13-gram
overlap, Brown et al. 2020 arXiv:2005.14165; Gopher §A2, Rae et al.
2021) re-expressed Spark-first:

* both sides shingle into k-word n-grams as 8-byte xxhash64 longs
  (``dedup.with_shingle_hashes`` — no per-gram strings materialize, and
  the downstream join moves longs, not text),
* the eval side's distinct gram set is small by construction (benchmark
  suites are MBs against a 100 TB corpus), so the probe is a BROADCAST
  semi join — the training corpus is never shuffled,
* the contaminated-id set that falls out is again small, so the final
  anti join broadcasts too (AQE picks this up from the distinct's
  runtime stats).

Net data movement at 100 TB: one broadcast of the eval grams + one
shuffle of the (tiny) contaminated id list. The train table itself
stays put. Hash equality stands in for string equality modulo xxhash64
collisions (~N^2/2^64 — negligible and deterministic for a fixed
corpus); pass ``hashed=False`` to compare raw gram strings instead
(exact, heavier rows, same plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rayforce_spark.datapipe.dedup import with_shingle_hashes
from rayforce_spark.datapipe.text import ngrams


def _doc_grams(df: DataFrame, text_col: str, n: int,
               hashed: bool) -> DataFrame:
    """(__rf_g) per-doc distinct gram rows, keeping all other columns."""
    if hashed:
        g = with_shingle_hashes(df, text_col, n, "__rf_gs")
    else:
        g = df.withColumn(
            "__rf_gs", F.array_distinct(ngrams(F.col(text_col), n)))
    return g.withColumn("__rf_g", F.explode("__rf_gs")).drop("__rf_gs")


def contaminated_ids(train: DataFrame, eval_df: DataFrame, text_col: str,
                     id_col: str, *, n: int = 8,
                     hashed: bool = True) -> DataFrame:
    """Distinct ``id_col`` values of training docs sharing at least one
    word ``n``-gram with any eval doc. The eval gram set is broadcast —
    the train side is scanned once and never shuffled; only the matched
    ids (a tiny set) shuffle for the distinct."""
    ev = (
        _doc_grams(eval_df.select(text_col), text_col, n, hashed)
        .select("__rf_g").distinct()
    )
    tr = _doc_grams(train.select(id_col, text_col), text_col, n, hashed)
    return (
        tr.join(F.broadcast(ev), "__rf_g", "left_semi")
        .select(id_col).distinct()
    )


def decontaminate(train: DataFrame, eval_df: DataFrame, text_col: str,
                  id_col: str, *, n: int = 8,
                  hashed: bool = True) -> DataFrame:
    """Return ``train`` minus documents contaminated by ``eval_df``
    (any shared word n-gram). Default n=8 approximates the published
    13-gram/8-gram overlap rules at whole-word granularity; lower n is
    stricter. The anti join's right side is the contaminated id set —
    bounded by the docs that actually overlap a benchmark, so it is
    broadcast explicitly and the corpus never shuffles (the only
    exchange in the whole plan is the distinct over that tiny id set).
    If the contaminated set could plausibly exceed broadcast size,
    something is wrong upstream (a "benchmark" the size of the corpus);
    drop the explicit broadcast hint and let AQE size the join, or run
    :func:`flag_contaminated` and filter downstream."""
    bad = contaminated_ids(train, eval_df, text_col, id_col,
                           n=n, hashed=hashed)
    return train.join(F.broadcast(bad), id_col, "left_anti")


def flag_contaminated(train: DataFrame, eval_df: DataFrame, text_col: str,
                      id_col: str, *, n: int = 8,
                      hashed: bool = True,
                      flag_col: str = "contaminated") -> DataFrame:
    """Non-destructive variant: ``train`` plus a boolean ``flag_col``
    (audit/reporting mode — count what WOULD be dropped per source
    before committing to the cut)."""
    bad = contaminated_ids(train, eval_df, text_col, id_col,
                           n=n, hashed=hashed)
    bad = bad.withColumn(flag_col, F.lit(True))
    return train.join(F.broadcast(bad), id_col, "left").withColumn(
        flag_col, F.coalesce(F.col(flag_col), F.lit(False)))
