"""EDGECHECK — every gated query against EMPTY input tables.

A distributed engine meets empty partitions constantly (aggressive
filters, empty date partitions, fresh ingest dirs); an operator that
works at sf0.1 but throws on zero rows (max over nothing, collect of an
empty pdf, element_at on an empty array, div-by-count-0) is a latent
production pager. This writes a zero-row copy of every table (same
schema) and runs ALL registry queries against it — success = returns a
DataFrame that collects (any row count, usually 0) with a stable schema.

Queries whose semantics legitimately require data (none expected) would
be documented here. Usage: python scripts/edgecheck.py
Writes EDGECHECK.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.001"


def main():
    from rayforce_spark.session import get_spark

    spark = get_spark("edgecheck")
    empty_dir = tempfile.mkdtemp(prefix="rf_empty_sf_")
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            (spark.read.parquet(os.path.join(SRC, f)).limit(0)
             .write.mode("overwrite")
             .parquet(os.path.join(empty_dir, f)))

    import __spark_entry__ as E

    results = {}
    for name, fn in E.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, empty_dir)
            rows = df.collect()
            results[name] = {"status": "ok", "rows": len(rows),
                             "cols": len(df.columns),
                             "secs": round(time.time() - t0, 1)}
            print(f"[ok] {name}: {len(rows)} rows on empty input")
        except Exception as e:
            results[name] = {"status": "fail",
                             "detail": f"{type(e).__name__}: {str(e)[:200]}",
                             "secs": round(time.time() - t0, 1)}
            print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:160]}")

    n_ok = sum(1 for r in results.values() if r["status"] == "ok")
    out = {"metric": "empty_input_robustness", "ok": n_ok,
           "total": len(results), "results": results}
    with open(os.path.join(REPO, "EDGECHECK.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"ok": n_ok, "total": len(results)}))
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
