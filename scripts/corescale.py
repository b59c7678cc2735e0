"""Core-scaling record at the 10x scale-up (VERDICT r12 item 2).

The driver's own scaling probe reruns bench.py at a lower
$SPARK_GRAFT_CPUS — but at sf0.1 every bench row is 0.2-0.9 s of fixed
overhead, so the 8-vs-32 ratios land ≈1 and r12's PERF flagged
`suspect_cpus_ignored` (a false positive; the harness honors the env
var). This script produces the record that makes the property
driver-verifiable: the SAME bench.py, sequentially at 32 then 8 cores,
against /tmp/sf1 (10x parquet from make_scale_data.py) where
parallelism is measurable. Writes CORESCALE_SF1.json with per-query
c8/c32 ratios and each run's stamped master line; restores
BENCH_DETAIL.json (bench.py overwrites it) afterwards.

Result (2026-08-17, idle box, py_loop 1.16/1.17): the ratios are ≈1
AT ANY SCALE on this host — c32 41.3 s vs c8 39.7 s total — because
the box throttles multi-core clocks under sustained load (r12 memory
note). The pure-CPU probe below isolates it: a 2e9-row codegen
aggregate with no shuffle and no data runs 0.43 s on local[32] vs
1.02 s on local[8] (recorded in the JSON; an earlier manual sample
read 0.39/0.66) — 4x the cores deliver only ~1.7-2.4x the throughput,
and the bench rows' shuffle/memory-bound stages erase even that. So
`suspect_cpus_ignored` cannot be cleared by ratio magnitude on this
hardware; the master stamp in the compact line is the verifiable
signal that the env var is honored.

Usage: python scripts/corescale.py [big_dir] [--probe-only]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIG = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/tmp/sf1"

_PROBE_CODE = '''
import sys, time, os
sys.path.insert(0, {repo!r})
cpus = sys.argv[1]
os.environ["SPARK_GRAFT_CPUS"] = cpus
from rayforce_spark.session import get_spark
spark = get_spark("cpu_probe")
spark.range(0, 200_000_000, 1, int(cpus)).selectExpr("sum(id % 97)").collect()
ts = []
for _ in range(3):
    t0 = time.time()
    spark.range(0, 2_000_000_000, 1, int(cpus)).selectExpr(
        "sum(id % 97)").collect()
    ts.append(round(time.time() - t0, 2))
print("PROBE " + repr(ts), flush=True)
'''


def cpu_probe(cpus: int) -> list[float]:
    """Pure compute scaling: fixed codegen aggregate over spark.range —
    no shuffle, no input data — min-of-3 per core count. Separates
    'the harness ignores CPUS' from 'the box cannot scale clocks'."""
    p = subprocess.run(
        [sys.executable, "-c", _PROBE_CODE.format(repo=REPO), str(cpus)],
        capture_output=True, text=True, check=True)
    line = [ln for ln in p.stdout.splitlines() if "PROBE " in ln][-1]
    return json.loads(line.split("PROBE ", 1)[1])


def run_bench(cpus: int) -> dict:
    env = {**os.environ,
           "SPARK_GRAFT_SF_DIR": BIG,
           "SPARK_GRAFT_CPUS": str(cpus)}
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, cwd=REPO, capture_output=True, text=True,
                       check=True)
    line = [ln for ln in p.stdout.splitlines()
            if ln.startswith('{"metric"')][-1]
    return json.loads(line)


def main():
    out_path = os.path.join(REPO, "CORESCALE_SF1.json")
    if "--probe-only" in sys.argv:
        # merge the pure-CPU scaling probe into an existing record
        with open(out_path) as f:
            out = json.load(f)
        out["cpu_probe"] = {
            "what": "2e9-row codegen sum over spark.range, no shuffle, "
                    "min of 3",
            "c32_s": min(ts32 := cpu_probe(32)),
            "c8_s": min(ts8 := cpu_probe(8)),
            "reps_c32": ts32, "reps_c8": ts8,
            "throughput_ratio_32_over_8": round(min(ts8) / min(ts32), 2),
        }
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out["cpu_probe"]))
        return 0
    if not os.path.exists(os.path.join(BIG, "lineitem.parquet")):
        print(f"{BIG} not built — run scripts/make_scale_data.py first",
              file=sys.stderr)
        return 2
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    with open(detail_path) as f:
        saved_detail = f.read()
    try:
        runs = {}
        for cpus in (32, 8):  # sequential — never two Spark jobs at once
            runs[cpus] = run_bench(cpus)
            print(f"c{cpus}: total={runs[cpus]['value']}s "
                  f"master={runs[cpus].get('master')} "
                  f"py_loop={runs[cpus].get('py_loop_s')}")
    finally:
        with open(detail_path, "w") as f:
            f.write(saved_detail)
    q32, q8 = runs[32]["queries"], runs[8]["queries"]
    per = {}
    for name, t32 in q32.items():
        t8 = q8.get(name)
        if t8 and t32 and t32 > 0 and t8 > 0:
            per[name] = {"c32_s": t32, "c8_s": t8,
                         "ratio_c8_over_c32": round(t8 / t32, 2)}
    ratios = sorted(v["ratio_c8_over_c32"] for v in per.values())
    out = {
        "metric": "core_scaling_8_vs_32_at_10x",
        "big": BIG,
        "master_c32": runs[32].get("master"),
        "master_c8": runs[8].get("master"),
        "total_c32_s": runs[32]["value"],
        "total_c8_s": runs[8]["value"],
        "total_ratio": round(runs[8]["value"] / runs[32]["value"], 2),
        "median_ratio": ratios[len(ratios) // 2] if ratios else None,
        "py_loop_c32": runs[32].get("py_loop_s"),
        "py_loop_c8": runs[8].get("py_loop_s"),
        "queries": per,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "total_ratio", "median_ratio",
                       "master_c32", "master_c8")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
