"""A/B q_quality_filter variants at a given SF (VERDICT r12 item 6):
  A (current): quantile window -> lazy localCheckpoint -> LM pipeline
     (4 plan sites) -> second lang window (fresh exchange).
  B (no checkpoint): the LM pipeline's sites hang off the SAME window
     subtree -> Spark may plan ReusedExchange for the lang exchange and
     window 2 can reuse hashpartitioning(lang).
Interleaved reps, noop sink, result-hash equality check.
Usage: python scripts/qf_ab.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from rayforce_spark.session import get_spark, load_tables

    spark = get_spark("qf_ab")
    tables = load_tables(spark, sf_dir)
    from rayforce_spark.datapipe import decontaminate, filter_by_quality_quantile
    from rayforce_spark.datapipe.text import filter_by_lm_quantile

    d = tables["documents"]
    train = d.filter(F.col("doc_id") % 97 != 0)
    ev = d.filter(F.col("doc_id") % 97 == 0)

    def build(checkpoint: bool):
        kept = filter_by_quality_quantile(train, "text", q=0.5, by="lang")
        if checkpoint:
            kept = kept.localCheckpoint(eager=False)
        lm_kept = filter_by_lm_quantile(kept, "text", "doc_id", q=0.9,
                                        by="lang", keep_score=True)
        return decontaminate(lm_kept, ev, "text", "doc_id", n=3).select(
            "doc_id", "lang", "lm_nll")

    # result equality first (cheap at any SF): order-insensitive digest
    def digest(df):
        return df.select(F.xxhash64(
            "doc_id", "lang", F.format_string("%.17g", "lm_nll"))
            .alias("h")).select(F.expr("bit_xor(h)").alias("x")) \
            .collect()[0]["x"]

    da, db = digest(build(True)), digest(build(False))
    print(f"digest A(checkpoint)={da} B(fused)={db} equal={da == db}")

    times: dict[str, list[float]] = {"A_checkpoint": [], "B_fused": []}
    for i in range(reps):
        for name, cp in (("A_checkpoint", True), ("B_fused", False)):
            spark.sparkContext.setJobDescription(f"qf {name} rep {i}")
            t0 = time.time()
            build(cp).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
    for name, ts in times.items():
        print(f"{name}: {ts} min={min(ts)}")


if __name__ == "__main__":
    main()
