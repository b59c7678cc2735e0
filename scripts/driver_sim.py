"""Simulate the driver's verify gate against __spark_entry__.py.

Runs entry(spark) as a smoke check, then each queries()[name] at sf0.01
side-by-side with oracle_sql()[name] through DuckDB, comparing row count,
schema (sorted column names) and an order-insensitive value hash — the same
contract described in __spark_entry__'s docstring. Exits nonzero on any
mismatch. Usage: python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # the real driver is representation-strict: it fetches via pandas,
        # where an integer-valued float64 hashes differently from an int64
        # (r8: sequence_packing went red on 0.0-vs-0 while this sim read
        # ok because it collapsed integral floats here). Tag the type so
        # the sim fails exactly where the driver would.
        return f"f{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def hugeint_cols(con, sql):
    """Column names a pandas-fetching driver would coerce to float64:
    DuckDB types windowed/plain SUM over integers as (U)HUGEINT, which has
    no numpy integer representation — fetchdf() silently converts it to
    float64 even when every value is integral. DESCRIBE binds the query
    without executing it."""
    try:
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:
        return set()
    return {
        r[0]
        for r in rows
        if "HUGEINT" in str(r[1]).upper() or "DECIMAL" in str(r[1]).upper()
    }


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_val(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def run(sf_dir, only=None, skip=None, smoke=True):
    """Run the gate; returns {query: {"status", "rows", "secs", "detail"}}
    where status is ok|rows_only|fail|skipped. Importable (scalecheck.py
    reuses this at sf0.1)."""
    # a plain session, as the driver would create it (no engine configs)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_sim")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    if smoke:
        t0 = time.time()
        res = E.entry(spark)
        n = res.count()
        print(f"[smoke] entry() -> {n} rows, schema={res.columns} ({time.time()-t0:.1f}s)")
        assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    out = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if skip and name in skip:
            out[name] = {"status": "skipped", "rows": None, "secs": 0.0,
                         "detail": skip[name]}
            print(f"[skip] {name}: {skip[name]}")
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            out[name] = {"status": "fail", "rows": None,
                         "secs": round(time.time() - t0, 1),
                         "detail": f"spark error: {e}"}
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        secs = round(time.time() - t0, 1)
        if name not in oracles:
            out[name] = {"status": "rows_only", "rows": len(s_rows),
                         "secs": secs, "detail": ""}
            print(f"[rows-only] {name}: {len(s_rows)} rows ({secs}s)")
            continue
        t1 = time.time()
        try:
            huge = hugeint_cols(con, oracles[name])
            r = con.execute(oracles[name])
            d_cols = [d[0] for d in r.description]
            d_rows = r.fetchall()
            if huge:
                # emulate the driver's pandas fetch: HUGEINT -> float64
                hidx = [i for i, c in enumerate(d_cols) if c in huge]
                d_rows = [
                    tuple(
                        float(v) if i in hidx and v is not None else v
                        for i, v in enumerate(row)
                    )
                    for row in d_rows
                ]
        except Exception as e:
            out[name] = {"status": "fail", "rows": len(s_rows),
                         "secs": secs, "detail": f"duckdb error: {e}"}
            print(f"[FAIL] {name}: duckdb error: {e}")
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} != {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema {sorted(s_cols)} != {sorted(d_cols)}")
        elif table_hash(s_cols, s_rows) != table_hash(d_cols, d_rows):
            problems.append("value-hash mismatch")
            # show first differing line for debugging
            so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            sl = sorted("|".join(norm_val(r[i]) for i in so) for r in s_rows)
            dl = sorted("|".join(norm_val(r[i]) for i in do) for r in d_rows)
            for a, b in zip(sl, dl):
                if a != b:
                    problems.append(f"  spark: {a}\n  duck : {b}")
                    break
        secs = round(time.time() - t0, 1)
        oracle_secs = round(time.time() - t1, 1)
        if problems:
            out[name] = {"status": "fail", "rows": len(s_rows),
                         "secs": secs, "detail": "; ".join(problems)}
            print(f"[FAIL] {name}: " + "; ".join(problems))
        else:
            out[name] = {"status": "ok", "rows": len(s_rows), "secs": secs,
                         "oracle_secs": oracle_secs, "detail": ""}
            print(f"[OK]   {name}: {len(s_rows)} rows match ({secs}s)")
    return out


def main():
    results = run(SF_DIR, only=ONLY or None)
    failures = [n for n, r in results.items() if r["status"] == "fail"]
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries match the oracle")


if __name__ == "__main__":
    main()
