"""Scale smoke: run the heavy operators on 10x-inflated data.

The correctness gate runs at sf0.01; this script is the "would the plan
survive a scale-up?" check — it inflates lineitem/events/documents 10x
(key-shifted copies, so group/join cardinalities grow too, not just row
counts) and runs the shuffle-heavy operators end-to-end. It asserts
completion and prints per-op wall time; a super-linear blowup or OOM
here is a plan bug, not a data-size problem.

Usage: python scripts/scale_smoke.py [sf_dir] [factor]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def inflate(df, factor, key_cols):
    """Union `factor` key-shifted copies: row count AND key cardinality
    scale by `factor` (pure duplication would understate shuffle width)."""
    copies = []
    for i in range(factor):
        c = df
        for k in key_cols:
            c = c.withColumn(k, F.col(k) + F.lit(i * 1_000_000_000))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main():
    from rayforce_spark import A, asof_join, select, window_join
    from rayforce_spark.session import get_spark, load_tables

    spark = get_spark("scale_smoke")
    t = load_tables(spark, SF_DIR)

    li = inflate(t["lineitem"], FACTOR, ["l_orderkey", "l_partkey"])
    ev = inflate(t["events"], FACTOR, ["user_id"])
    results = []

    def run(name, df):
        t0 = time.time()
        n = df.count()
        dt = time.time() - t0
        results.append((name, dt, n))
        print(f"[{dt:7.2f}s] {name}: {n} rows", flush=True)

    run("groupby_highcard_10x", select(
        li, {"s": A.sum_("l_quantity"), "a": A.avg("l_discount")},
        by="l_partkey",
    ))
    run("groupby_stats_10x", select(
        li,
        {"avg": A.avg("l_extendedprice"), "md": A.med("l_quantity"),
         "nd": A.count_distinct("l_partkey")},
        by="l_returnflag",
    ))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("cv"))
    run("asof_join_10x", asof_join(purchases, clicks, on="user_id", asof="ts"))
    run("window_join_10x", window_join(
        purchases, clicks, "user_id", "ts",
        F.col("ts") - 300_000_000_000, F.col("ts"),
        {"n_clicks": A.count("cv"), "sum_cv": A.sum_("cv")},
    ))
    from rayforce_spark import window_join_wj

    run("window_join_wj_10x", window_join_wj(
        purchases, clicks, "user_id", "ts",
        -300_000_000_000, 300_000_000_000,
        {"n_clicks": A.count("cv"), "mx_cv": A.max_("cv")},
    ))

    docs = inflate(t["documents"], max(2, FACTOR // 2), ["doc_id"])
    from rayforce_spark.datapipe import minhash_lsh_pairs

    run(f"minhash_{max(2, FACTOR // 2)}x", minhash_lsh_pairs(
        docs, "text", "doc_id"))

    total = sum(dt for _, dt, _ in results)
    print(f"\ntotal {total:.1f}s at factor {FACTOR} — "
          "all heavy operators completed")
    spark.stop()


if __name__ == "__main__":
    main()
