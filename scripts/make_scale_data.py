"""Materialize a FACTOR-x scale-up of an sf dir as REAL parquet.

scripts/scale_smoke.py inflates in memory (the scan re-executes per
copy); this writes the inflated tables to disk so the downstream
measurement exercises the honest path — parquet scans with pushdown,
file-split parallelism, realistic shuffle widths. Key columns are
shifted CONSISTENTLY across tables (copy i adds i*STRIDE to every key),
so join fan-outs, group cardinalities, session counts and near-dup
cluster structure all scale by FACTOR too — pure row duplication would
understate every shuffle.

Usage: python scripts/make_scale_data.py [src] [dst] [factor]
Defaults: /root/testdata/sf0.1 -> /tmp/sf1 at 10x (i.e. "sf1").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10
STRIDE = 1_000_000_000

# key columns shifted per copy; every other column rides unchanged.
# (c_nationkey / s_nationkey keep their tiny dims — dims that small stay
# broadcast at any scale, growing them would misrepresent the workload.)
KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
}


def main():
    from rayforce_spark.session import get_spark, load_tables

    spark = get_spark("make_scale_data")
    tables = load_tables(spark, SRC)
    os.makedirs(DST, exist_ok=True)
    for name, df in tables.items():
        keys = KEYS.get(name, [])
        out = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(out):
            print(f"[skip] {name}: exists")
            continue
        if not keys or FACTOR == 1:
            df.write.mode("overwrite").parquet(out)
            print(f"[copy] {name}")
            continue
        # one scan, FACTOR output rows per input row: explode a copy
        # index and shift the keys — no per-copy re-scan, no union tree
        ci = F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))).alias("__ci")
        wide = df.select("*", ci)
        for k in keys:
            wide = wide.withColumn(
                k, (F.col(k) + F.col("__ci").cast("long") * STRIDE)
                .cast(dict(df.dtypes)[k]))
        wide.drop("__ci").write.mode("overwrite").parquet(out)
        print(f"[x{FACTOR}] {name}")
    spark.stop()
    print(f"done: {DST}")


if __name__ == "__main__":
    main()
