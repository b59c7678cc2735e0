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
2. hand the SAME Spark-emitted pair set to an INDEPENDENT twin — a
   vectorized numpy min-label propagation with pointer doubling (exact
   connected components, O(E) vectorized per round, log-diameter
   rounds; r10: replaces the r9 DuckDB SQL twin, whose per-round
   full-edge joins dominated the row at ~30 s for the same exact
   full-graph guarantee — directive 6);
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
    from rayforce_spark.datapipe import dedup_clusters, jaccard_dup_pairs
    from rayforce_spark.session import get_spark

    if spark is None:
        spark = get_spark("scalecheck_clusters")
    t0 = time.time()
    # only documents is needed — load_tables' full 10-table sweep cost
    # ~4 s of this fresh subprocess's budget
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = jaccard_dup_pairs(d, "text", "doc_id", shingle_k=1,
                              threshold=0.8)
    pair_dir = tempfile.mkdtemp(prefix="rf_sc_pairs_") + "/pairs"
    pairs.select("id_a", "id_b").write.parquet(pair_dir)
    spark_clusters = {(r.doc_id, r.cluster_id)
                      for r in dedup_clusters(
                          spark.read.parquet(pair_dir)).collect()}
    t_spark = time.time() - t0

    # independent twin over the SAME pair set: vectorized numpy
    # min-label propagation + pointer doubling — exact connected
    # components, nothing shared with the Spark contraction code
    t0 = time.time()
    twin_clusters, n_pairs = _numpy_cc(pair_dir)
    t_twin = time.time() - t0

    match = spark_clusters == twin_clusters
    print(f"pairs={n_pairs} docs_in_clusters={len(spark_clusters)} "
          f"spark={t_spark:.1f}s twin={t_twin:.1f}s match={match}")
    if not match:
        print("spark-only:", sorted(spark_clusters - twin_clusters)[:10])
        print("twin-only:", sorted(twin_clusters - spark_clusters)[:10])
    return {
        "status": "split_ok" if match else "fail",
        "rows": len(spark_clusters),
        "secs": round(t_spark + t_twin, 1),
        "detail": (
            f"clustering over the full {n_pairs}-pair sf graph matches "
            "an independent numpy min-label/pointer-doubling twin "
            "exactly (same full-graph exact CC guarantee as the r9 "
            "DuckDB SQL twin, ~10x cheaper verify); pair generation is "
            "oracle-verified at sf0.01 (full gate) + prefix==brute "
            "property tests (DuckDB's raw word-level inverted-index "
            "oracle is quadratic and intractable at sf0.1)"
        ),
    }


def _numpy_cc(pair_dir: str) -> set:
    """Exact connected components over the pair parquet: min-label
    propagation (labels flow along edges via np.minimum.at) with
    pointer doubling (lbl <- lbl[lbl]) to fixpoint each round —
    converges in O(log diameter) outer rounds, every step vectorized.
    Returns ({(doc_id, min_id_of_component)}, n_pairs)."""
    import numpy as np
    import pyarrow.dataset as ds

    t = ds.dataset(pair_dir).to_table(columns=["id_a", "id_b"])
    a = t["id_a"].to_numpy(zero_copy_only=False)
    b = t["id_b"].to_numpy(zero_copy_only=False)
    ids = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(ids, a)
    bi = np.searchsorted(ids, b)
    lbl = np.arange(len(ids), dtype=np.int64)
    while True:
        new = lbl.copy()
        np.minimum.at(new, ai, lbl[bi])
        np.minimum.at(new, bi, lbl[ai])
        while True:  # pointer doubling: chains halve per pass
            n2 = new[new]
            if np.array_equal(n2, new):
                break
            new = n2
        if np.array_equal(new, lbl):
            break
        lbl = new
    return ({(int(ids[i]), int(ids[lbl[i]])) for i in range(len(ids))},
            len(a))


def main() -> int:
    import json

    row = run(SF)
    if "--json" in sys.argv:
        print("SCALECHECK_CLUSTERS_ROW=" + json.dumps(row))
    return 0 if row["status"] == "split_ok" else 1


if __name__ == "__main__":
    sys.exit(main())
