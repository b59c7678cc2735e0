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


_HASH_MOD = 1 << 256
#: keep per-side sorted-diff material only while it stays this small —
#: past it the sample is dropped and a mismatch reports digests only
_DIFF_SAMPLE_CAP = 500_000


class _MultisetHash:
    """Order-insensitive multiset digest: per-line sha256 summed mod
    2^256. Equal normalized-row multisets ⇔ equal (count, digest) up to
    sha256 collisions — the same equality the old sorted-lines sha256
    tested, but the combine is order-free so rows can STREAM through a
    bounded buffer instead of being collected, tupled and sorted on the
    driver (r13, guide §5: the sf0.1 gate's two ~3M-row pair results
    held every Row/tuple/line alive at once and the 3M-string sort on
    top; the old-gen GC from that made dedup_jaccard reps swing
    5.6→35 s within one JVM — the r12 verdict's #1 variance source).
    Both engines' results flow through the SAME norm_val + digest, so
    ok/fail verdicts are preserved."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.sample: list | None = []

    def add_line(self, line: str) -> None:
        self.acc = (self.acc + int.from_bytes(
            hashlib.sha256(line.encode()).digest(), "big")) % _HASH_MOD
        self.n += 1
        if self.sample is not None:
            self.sample.append(line)
            if len(self.sample) > _DIFF_SAMPLE_CAP:
                self.sample = None

    def key(self):
        return (self.n, self.acc)


#: Spark type names whose Arrow->Python values are representation-
#: identical to Row fields (ints, floats incl. NaN, bools, strings,
#: nulls) — the streaming fast path is restricted to these; anything
#: else (timestamp/date/decimal/array/struct) keeps the classic collect
#: whose Python representations norm_val was written against. Every
#: multi-million-row gate result (the pair sets) is scalar-only.
_ARROW_SAFE = {"long", "integer", "short", "byte", "double", "float",
               "boolean", "string"}


def spark_result_hash(sdf) -> _MultisetHash:
    """Normalized multiset digest of a Spark result. Scalar-only schemas
    stream through Arrow record batches (one batch of Python objects
    alive at a time); other schemas collect as before (all small)."""
    cols = sdf.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = _MultisetHash()
    if all(f.dataType.typeName() in _ARROW_SAFE for f in sdf.schema.fields):
        for batch in sdf.toArrow().to_batches(max_chunksize=65536):
            cs = [batch.column(i).to_pylist() for i in order]
            for tup in zip(*cs):
                h.add_line("|".join(norm_val(v) for v in tup))
    else:
        for r in sdf.collect():
            h.add_line("|".join(norm_val(r[i]) for i in order))
    return h


def duck_result_hash(cur, cols, huge) -> _MultisetHash:
    """Streaming twin for the DuckDB side (fetchmany chunks), with the
    driver-emulating HUGEINT/DECIMAL -> float64 coercion applied
    per value exactly as the old materializing path did."""
    hidx = {i for i, c in enumerate(cols) if c in huge}
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = _MultisetHash()
    while True:
        chunk = cur.fetchmany(100_000)
        if not chunk:
            break
        for row in chunk:
            h.add_line("|".join(
                norm_val(float(row[i])
                         if i in hidx and row[i] is not None else row[i])
                for i in order))
    return h


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
            s_hash = spark_result_hash(sdf)
        except Exception as e:
            out[name] = {"status": "fail", "rows": None,
                         "secs": round(time.time() - t0, 1),
                         "detail": f"spark error: {e}"}
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        secs = round(time.time() - t0, 1)
        if name not in oracles:
            out[name] = {"status": "rows_only", "rows": s_hash.n,
                         "secs": secs, "detail": ""}
            print(f"[rows-only] {name}: {s_hash.n} rows ({secs}s)")
            continue
        t1 = time.time()
        try:
            huge = hugeint_cols(con, oracles[name])
            r = con.execute(oracles[name])
            d_cols = [d[0] for d in r.description]
            d_hash = duck_result_hash(r, d_cols, huge)
        except Exception as e:
            out[name] = {"status": "fail", "rows": s_hash.n,
                         "secs": secs, "detail": f"duckdb error: {e}"}
            print(f"[FAIL] {name}: duckdb error: {e}")
            continue
        problems = []
        if s_hash.n != d_hash.n:
            problems.append(f"rows {s_hash.n} != {d_hash.n}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema {sorted(s_cols)} != {sorted(d_cols)}")
        elif s_hash.key() != d_hash.key():
            problems.append("value-hash mismatch")
            # show first differing line for debugging (samples survive
            # up to _DIFF_SAMPLE_CAP rows per side)
            if s_hash.sample is not None and d_hash.sample is not None:
                for a, b in zip(sorted(s_hash.sample),
                                sorted(d_hash.sample)):
                    if a != b:
                        problems.append(f"  spark: {a}\n  duck : {b}")
                        break
            else:
                problems.append(
                    f"  (line diff suppressed past {_DIFF_SAMPLE_CAP} "
                    "rows; digests "
                    f"{s_hash.acc:#x} != {d_hash.acc:#x})")
        secs = round(time.time() - t0, 1)
        oracle_secs = round(time.time() - t1, 1)
        if problems:
            out[name] = {"status": "fail", "rows": s_hash.n,
                         "secs": secs, "detail": "; ".join(problems)}
            print(f"[FAIL] {name}: " + "; ".join(problems))
        else:
            out[name] = {"status": "ok", "rows": s_hash.n, "secs": secs,
                         "oracle_secs": oracle_secs, "detail": ""}
            print(f"[OK]   {name}: {s_hash.n} rows match ({secs}s)")
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
