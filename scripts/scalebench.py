"""Measured scaling check: the same queries at sf0.1 and at the 10x
written-parquet scale-up (/tmp/sf1 from scripts/make_scale_data.py).

For each query this records wall time at both scales (min of REPS
in-process runs, full materialization through the noop sink) and the
time ratio. A plan that survives scale shows a ratio near the data
ratio (~10x) or below (fixed overheads amortize, selectivity caps
output); a super-linear ratio is a plan bug — exactly the signal the
100 TB design story needs measured, not argued.

Writes SCALE_SF1.json. Usage:
  python scripts/scalebench.py [sf_small] [sf_big] [--queries a,b,c]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.1"
BIG = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
    else "/tmp/sf1"
REPS = 2

# shuffle/join/window-heavy gate queries + the datapipe scale paths.
# Exact all-pairs verifiers (dedup_jaccard/simhash/embedding oracle
# configs) are EXCLUDED by design: their production twins are the
# recall-gated LSH paths below; the oracle configs are O(pairs) on
# purpose and already measured once at sf0.1 in shuffle_audit.
QUERIES = [
    "groupby_sum", "groupby_highcard", "groupby_manykeys", "groupby_stats",
    "tpch_q1", "tpch_q3ish", "inner_join", "left_join_dedup",
    "asof_join", "window_join", "top_k_per_group", "moving_window",
    "scan_cumsum", "sessionize", "quality_filter", "text_quality",
    "pii_scrub", "dedup_exact", "dedup_minhash", "knn_cosine",
    "sample_pipeline", "ngram_bigrams", "dsir_select",
    "sequence_packing",
]


def main():
    if not os.path.exists(os.path.join(BIG, "lineitem.parquet")):
        print(f"{BIG} not built — run scripts/make_scale_data.py first",
              file=sys.stderr)
        return 2
    only = None
    if "--queries" in sys.argv:
        only = sys.argv[sys.argv.index("--queries") + 1].split(",")

    import __spark_entry__ as E
    from rayforce_spark.session import get_spark

    spark = get_spark("scalebench")
    qs = E.queries()

    def run(fn, sf_dir):
        def once():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        once()  # warm (plan + code cache; inputs stay on-disk parquet)
        return round(min(once() for _ in range(REPS)), 3)

    rows = {}
    names = [q for q in (only or QUERIES)]
    for name in names:
        fn = (getattr(E, f"q_{name}_bench", None) or qs.get(name)
              or getattr(E, f"q_{name}", None))
        if fn is None:
            rows[name] = {"err": "unknown query"}
            continue
        try:
            small_s = run(fn, SMALL)
            big_s = run(fn, BIG)
            rows[name] = {
                "small_s": small_s, "big_s": big_s,
                "ratio": round(big_s / small_s, 2) if small_s else None,
            }
            print(f"{name:22s} {small_s:8.3f}s -> {big_s:8.3f}s "
                  f"({rows[name]['ratio']}x)", flush=True)
        except Exception as e:  # noqa: BLE001 - record, keep sweeping
            rows[name] = {"err": f"{type(e).__name__}: {e}"}
            print(f"{name:22s} FAILED: {e}", flush=True)

    ok = [r for r in rows.values() if "ratio" in r and r["ratio"]]
    med = sorted(r["ratio"] for r in ok)[len(ok) // 2] if ok else None
    out = {
        "metric": "scale_ratio_sf0.1_to_10x",
        "small": SMALL, "big": BIG, "reps": REPS,
        "median_ratio": med,
        "queries": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_SF1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": out["metric"], "median_ratio": med,
                      "n": len(ok)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
