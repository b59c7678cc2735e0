"""Scale check for dedup_clusters at sf0.1 (judge r5 item 4).

The full driver_sim oracle for dedup_clusters is intractable at sf0.1:
the sf0.1 corpus holds ~3M true Jaccard>=0.8 pairs (giant near-dup
groups), and the oracle's DuckDB side rebuilds them with a raw
word-level inverted-index join — sum(df²) over corpus-common words,
measured >20 min without completing. (The Spark side had the same
quadratic shape until r6's prefix filter: 29 s now.) So the
PAIR-GENERATION step stays exactly verified at sf0.01 (full gate, both
engines) and this script verifies the CLUSTERING step at sf0.1 over the
full ~3M-pair graph:

1. run the real Spark pipeline (jaccard_dup_pairs -> dedup_clusters) at
   sf0.1;
2. hand the SAME Spark-emitted pair set to DuckDB (via parquet) and
   compute connected components there by iterative min-label
   propagation (O(E) per round, diameter-bounded rounds — no
   recursive-CTE reachability blowup);
3. compare the two (doc_id, cluster_id) sets exactly.

Usage: python scripts/scalecheck_clusters.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def run(sf_dir: str, spark=None) -> dict:
    """Importable form (scalecheck.py merges this as the dedup_clusters
    row): returns {"status": "split_ok"|"fail", "rows", "secs",
    "detail"} — same shape as driver_sim rows. ``split_ok`` = the
    clustering step matched DuckDB exactly over the full sf0.1 pair
    graph; the pair-generation step is oracle-verified at sf0.01 by the
    main gate (full three-way) and prefix-filter==brute property tests."""
    import duckdb

    from rayforce_spark.datapipe import dedup_clusters, jaccard_dup_pairs
    from rayforce_spark.session import get_spark, load_tables

    if spark is None:
        spark = get_spark("scalecheck_clusters")
    t0 = time.time()
    d = load_tables(spark, sf_dir)["documents"]
    pairs = jaccard_dup_pairs(d, "text", "doc_id", shingle_k=1,
                              threshold=0.8)
    pair_dir = tempfile.mkdtemp(prefix="rf_sc_pairs_") + "/pairs"
    pairs.select("id_a", "id_b").write.parquet(pair_dir)
    n_pairs = spark.read.parquet(pair_dir).count()
    spark_clusters = {(r.doc_id, r.cluster_id)
                      for r in dedup_clusters(
                          spark.read.parquet(pair_dir)).collect()}
    t_spark = time.time() - t0

    # DuckDB twin over the SAME pair set: iterative min-label propagation
    t0 = time.time()
    con = duckdb.connect()
    con.execute(f"CREATE TABLE pairs AS "
                f"SELECT * FROM read_parquet('{pair_dir}/*.parquet')")
    con.execute("""
        CREATE TABLE lab AS
        SELECT id AS doc_id, id AS lbl FROM (
          SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs)
    """)
    con.execute("""
        CREATE TABLE edges AS
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    """)
    for _ in range(64):  # >= log2(diameter) rounds; breaks at fixpoint
        con.execute("""
            CREATE OR REPLACE TABLE nxt AS
            SELECT l.doc_id,
                   least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
            FROM lab l
            LEFT JOIN edges e ON e.s = l.doc_id
            LEFT JOIN lab n ON n.doc_id = e.d
            GROUP BY l.doc_id, l.lbl
        """)
        (changed,) = con.execute("""
            SELECT count(*) FROM nxt JOIN lab USING (doc_id)
            WHERE nxt.lbl <> lab.lbl
        """).fetchone()
        con.execute("CREATE OR REPLACE TABLE lab AS SELECT * FROM nxt")
        if changed == 0:
            break
    duck_clusters = set(con.execute(
        "SELECT doc_id, lbl FROM lab").fetchall())
    t_duck = time.time() - t0

    match = spark_clusters == duck_clusters
    print(f"pairs={n_pairs} docs_in_clusters={len(spark_clusters)} "
          f"spark={t_spark:.1f}s duckdb={t_duck:.1f}s match={match}")
    if not match:
        print("spark-only:", sorted(spark_clusters - duck_clusters)[:10])
        print("duck-only:", sorted(duck_clusters - spark_clusters)[:10])
    return {
        "status": "split_ok" if match else "fail",
        "rows": len(spark_clusters),
        "secs": round(t_spark + t_duck, 1),
        "detail": (
            f"clustering over the full {n_pairs}-pair sf graph matches a "
            "DuckDB label-propagation twin exactly; pair generation is "
            "oracle-verified at sf0.01 (full gate) + prefix==brute "
            "property tests (DuckDB's raw word-level inverted-index "
            "oracle is quadratic and intractable at sf0.1)"
        ),
    }


def main() -> int:
    import json

    row = run(SF)
    if "--json" in sys.argv:
        print("SCALECHECK_CLUSTERS_ROW=" + json.dumps(row))
    return 0 if row["status"] == "split_ok" else 1


if __name__ == "__main__":
    sys.exit(main())
