"""SCALECHECK — run the FULL oracle gate at sf0.1 (10x the driver's
correctness scale) and record per-round results.

Judge r6 item 4: only 20 of 50 gated queries were sf0.1-verified; the
rest ran only at sf0.01, so a scale regression (overflow, skew, tie
instability, quadratic blowup) in those paths would go unseen. This
drives scripts/driver_sim.run() over EVERY registry query at sf0.1 and
writes SCALECHECK_r{N}.json so the check is continuous, not a one-off.

Known-intractable oracles are skipped with the reason recorded (the
limitation is DuckDB's, not ours — each has separate evidence):
* dedup_clusters — the oracle's raw word-level inverted-index join is
  quadratic in corpus-common words and did not finish in 20+ min at
  sf0.1; the two halves are verified separately by
  scripts/scalecheck_clusters.py (pair generation: prefix-filter ==
  brute property tests; clustering: full ~3M-pair graph matches DuckDB
  exactly).

Usage: python scripts/scalecheck.py [sf_dir] [round_no]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SKIP = {
    "dedup_clusters": (
        "DuckDB oracle intractable at sf0.1 (word-level inverted-index "
        "join, 20+ min); verified split by scalecheck_clusters.py"
    ),
}


def _current_round() -> str:
    """Latest driver round + 1 (CORRECTNESS_r{N}.json is written at the
    END of round N, so during round N+1 the newest file is N)."""
    import re

    ns = [int(m.group(1)) for f in os.listdir(REPO)
          if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))]
    return f"{max(ns) + 1:02d}" if ns else "00"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rnd = sys.argv[2] if len(sys.argv) > 2 else _current_round()
    from driver_sim import run

    t0 = time.time()
    results = run(sf_dir, skip=SKIP, smoke=False)
    if "dedup_clusters" in results:
        # Replace the skip row with the split verifier's real result:
        # clustering over the full sf0.1 pair graph vs a DuckDB
        # label-propagation twin (pair generation has separate
        # prefix==brute property-test evidence; only DuckDB's raw
        # word-level oracle is intractable here). Run it in a FRESH
        # subprocess: sharing the gate's JVM after 49 queries leaves too
        # little headroom for the 3M-pair broadcast (observed OOM), and
        # a crash here must degrade to a recorded fail, not lose the
        # other 49 rows.
        # r12: STOP the gate's own Spark JVM first — leaving the idle
        # 16g driver alive while the subprocess spins its own 16g JVM
        # + 32 executor threads made the verifier contend for memory/
        # cores and read 88-93 s in-run where the same script measures
        # 30-31 s standalone (both r12 boxes; the row is a wall-clock
        # record, so the contention was pure measurement error).
        try:
            from pyspark.sql import SparkSession

            active = SparkSession.getActiveSession()
            if active is not None:
                active.stop()
        except Exception:  # noqa: BLE001 — losing the stop only costs secs
            pass
        import subprocess

        try:
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts", "scalecheck_clusters.py"),
                 sf_dir, "--json"],
                capture_output=True, text=True, timeout=1200)
            row = next(
                (json.loads(ln.split("=", 1)[1])
                 for ln in proc.stdout.splitlines()
                 if ln.startswith("SCALECHECK_CLUSTERS_ROW=")),
                None)
            results["dedup_clusters"] = row or {
                "status": "fail", "rows": None, "secs": 0.0,
                "detail": f"split verifier produced no row; rc="
                          f"{proc.returncode} tail={proc.stdout[-300:]!r}"}
        except Exception as e:  # noqa: BLE001 — record, don't lose the run
            results["dedup_clusters"] = {
                "status": "fail", "rows": None, "secs": 0.0,
                "detail": f"split verifier crashed: {type(e).__name__}: {e}"}
    by_status: dict[str, int] = {}
    for r in results.values():
        by_status[r["status"]] = by_status.get(r["status"], 0) + 1
    # box-speed stamp (r12): cross-run row comparisons need the same
    # normalization bench.py grew in r10-r12 — the oracle + collect legs
    # are Python/DuckDB-bound and drift with the instance (measured this
    # round: two r12 boxes ran the same unchanged rows 20-60% apart).
    loop = []
    for _ in range(3):
        ts = time.time()
        x = 0
        for i in range(20_000_000):
            x += i * i
        assert x
        loop.append(time.time() - ts)
    out = {
        "metric": "oracle_gate_at_sf0.1",
        "sf_dir": sf_dir,
        "total_secs": round(time.time() - t0, 1),
        "py_loop_20m_s": round(min(loop), 2),
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "counts": by_status,
        "results": results,
    }
    path = os.path.join(REPO, f"SCALECHECK_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"counts": by_status, "secs": out["total_secs"],
                      "path": path}))
    return 1 if by_status.get("fail") else 0


if __name__ == "__main__":
    raise SystemExit(main())
