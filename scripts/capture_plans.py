"""Capture .explain("formatted") for bench/gate queries into
plans/r{N}/ (N = current round, derived like scalecheck.py: newest
CORRECTNESS_r*.json + 1; override with $PLANS_ROUND).

Usage: python scripts/capture_plans.py <suffix> [name ...]
  suffix: "before" or "after" (file name suffix)
  names:  query names (default: the bench.py headline list)

Writes plans/r{N}/<name>_<suffix>.txt. Explain is driver-side planning
only (initial AQE plan) — cheap, no executor work beyond any eager
stats jobs a query builder runs itself.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_NAMES = [
    "groupby_sum", "groupby_multikey", "groupby_highcard", "groupby_avg3",
    "groupby_sum3_highcard", "agg_arith", "groupby_manykeys",
    "groupby_stats", "tpch_q1", "tpch_q3ish", "inner_join",
    "left_join_dedup", "asof_join", "window_join", "top_k_per_group",
    "scan_cumsum", "dedup_exact", "dedup_minhash", "knn_cosine",
    "text_quality",
]


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_NAMES

    from rayforce_spark.session import get_spark, load_tables

    spark = get_spark("rayforce_spark_plans")
    load_tables(spark, SF_DIR)

    import __spark_entry__ as E

    qs = E.queries()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rnd = os.environ.get("PLANS_ROUND")
    if not rnd:
        import re

        ns = [int(m.group(1)) for f in os.listdir(repo)
              if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))]
        rnd = str(max(ns) + 1) if ns else "0"
    outdir = os.path.join(repo, "plans", f"r{int(rnd):02d}")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = (getattr(E, f"q_{name}_bench", None) or qs.get(name)
              or getattr(E, f"q_{name}", None))
        if fn is None:
            print(f"[skip] {name}: no query fn")
            continue
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"[ok] {path} ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
