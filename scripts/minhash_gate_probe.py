"""Measure q_dedup_minhash (the GATE shape: exact bands=64 + prod
bands=16 recall gate) engine-only at sf0.1: noop-sink seconds over reps,
plus a formatted-plan capture. Usage:
    python scripts/minhash_gate_probe.py [suffix] [reps]
Writes plans/r13/dedup_minhash_gate_<suffix>.txt when suffix given.
"""
from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    suffix = sys.argv[1] if len(sys.argv) > 1 else None
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from rayforce_spark.session import get_spark, load_tables

    spark = get_spark("minhash_gate_probe")
    load_tables(spark, SF_DIR)

    import __spark_entry__ as E

    sc = spark.sparkContext
    secs = []
    for i in range(reps):
        sc.setJobDescription(f"minhash_gate rep {i}")
        t0 = time.time()
        df = E.q_dedup_minhash(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        secs.append(round(time.time() - t0, 3))
    print(f"q_dedup_minhash noop secs: {secs}")
    if suffix:
        df = E.q_dedup_minhash(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", "r13", f"dedup_minhash_gate_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"[ok] {path}")


if __name__ == "__main__":
    main()
