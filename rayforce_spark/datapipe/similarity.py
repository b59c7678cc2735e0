"""Similarity search over embedding columns (array<float>).

knn_cosine — exact brute-force top-k: broadcast the (small) query set,
score every corpus row with JVM-side expressions, window top-k per query.
This is the baseline/verifier; cost is O(corpus × queries).

knn_lsh — the scale path: random-hyperplane LSH. Each vector gets
``tables`` bucket keys (sign-bit signatures of ``planes`` fixed
pseudo-random hyperplanes); queries probe only their buckets, exact cosine
re-ranks within. Hyperplanes are derived deterministically from a seed so
plans are reproducible and no state needs shipping. Recall is tunable via
(planes, tables); an IVF variant would swap hyperplanes for k-means
centroids — same bucket-join shape.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rayforce_spark.datapipe.dedup import cosine


def knn_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 10,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cos, rank) with rank 1..k, ties broken
    by neighbor id (deterministic). No driver collect — the query side is
    broadcast, scoring is a single pass over the corpus."""
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id", "neighbor_id",
        cosine(F.col("__qv"), F.col("__cv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, planes: int, table: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes (Box-Muller over a
    splitmix-style integer stream) — pure Python at plan time, tiny."""
    def stream(i: int) -> float:
        # splitmix64 -> uniform (0,1)
        x = (seed + 0x9E3779B97F4A7C15 * (i + 1) + table * 0x632BE59BD9B4E019) & ((1 << 64) - 1)
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & ((1 << 64) - 1)
        x ^= x >> 31
        return (x + 1) / (1 << 64)

    out = []
    for p in range(planes):
        vec = []
        for d in range(0, dim, 2):
            u1 = stream(p * dim + d)
            u2 = stream(p * dim + d + 1)
            r = math.sqrt(-2.0 * math.log(u1))
            vec.append(r * math.cos(2 * math.pi * u2))
            if d + 1 < dim:
                vec.append(r * math.sin(2 * math.pi * u2))
        out.append(vec[:dim])
    return out


def _bucket_key(vec_col, hyperplanes) -> F.Column:
    """Sign-bit signature of the vector against each hyperplane -> long."""
    key = F.lit(0).cast("long")
    for i, plane in enumerate(hyperplanes):
        arr = F.array(*[F.lit(float(w)) for w in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, y: x * y),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        key = key + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return key


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 10,
    dim: int,
    planes: int = 8,
    tables: int = 4,
    seed: int = 42,
    query_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidate retrieval +
    exact cosine re-rank. Each side computes ``tables`` bucket keys; the
    join is on (table, key) — a plain shuffle join Catalyst/AQE can
    broadcast or skew-split. Returns (query_id, neighbor_id, cos, rank)."""
    qid = query_id_col or id_col

    def with_buckets(df, idc, out_id):
        sel = df.select(F.col(idc).alias(out_id), F.col(vec_col).alias(f"__{out_id}_v"))
        buckets = F.array(*[
            F.struct(
                F.lit(t).alias("tbl"),
                _bucket_key(F.col(f"__{out_id}_v"),
                            _hyperplanes(dim, planes, t, seed)).alias("key"),
            )
            for t in range(tables)
        ])
        return sel.select(out_id, f"__{out_id}_v", F.explode(buckets).alias("bk")) \
                  .select(out_id, f"__{out_id}_v", "bk.tbl", "bk.key")

    qb = with_buckets(queries, qid, "query_id")
    cb = with_buckets(corpus, id_col, "neighbor_id")
    cand = (
        qb.join(cb, ["tbl", "key"])
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id", "neighbor_id",
            cosine(F.col("__query_id_v"), F.col("__neighbor_id_v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
