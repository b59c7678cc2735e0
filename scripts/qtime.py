"""Time individual gate/bench queries engine-only via the noop sink.

Usage: python scripts/qtime.py <name> [...names] [--reps N] [--cold]

Per query: one warmup noop write (plan + JIT), then N timed noop
writes, min and all reps printed. --cold skips the warmup (first rep
includes planning/JIT). Tables are loaded uncached (like the gate) —
pass --cache to replicate bench.py's cached-input methodology.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    # argparse, not hand-rolled sys.argv filtering (r12 ADVICE): the old
    # form removed the --reps VALUE from the positional list by value,
    # so a query name equal to the number was dropped instead, and a
    # trailing --reps raised IndexError
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+", help="query names")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cold", action="store_true")
    ap.add_argument("--cache", action="store_true")
    ns = ap.parse_args()
    args, reps, cold, cache = ns.names, ns.reps, ns.cold, ns.cache

    from rayforce_spark.session import get_spark, load_tables

    spark = get_spark("rayforce_spark_qtime")
    t = load_tables(spark, SF_DIR)
    if cache:
        for name in ("lineitem", "orders", "customer", "events",
                     "documents", "embeddings"):
            t[name] = t[name].cache()
            t[name].count()

    import __spark_entry__ as E

    qs = E.queries()
    for name in args:
        fn = qs.get(name) or getattr(E, f"q_{name}", None)
        if fn is None:
            print(f"[skip] {name}")
            continue
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        if not cold:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name:24s} min={min(times):7.3f}  reps={times}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
