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
from pyspark.sql import types as T

from rayforce_spark.datapipe.dedup import (
    _require_arrow,
    cosine_from_units,
    dot_units,
    norm_units,
)


def _dot_double(a, b) -> F.Column:
    """Plain double dot product — one multiply-add per element, no
    round/cast. ~Last-ulp association drift between engines/partitionings
    is possible, so this is the PRODUCTION scoring path; the fixed-point
    path stays the cross-engine-exact default for oracle gating."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def knn_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 10,
    query_id_col: str | None = None,
    score: str = "fixed",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, cos, rank) with rank 1..k, ties broken
    by neighbor id (deterministic). No driver collect — the query side is
    broadcast, scoring is a single pass over the corpus.

    ``score``: "fixed" (default) uses the 1e-9 fixed-point integer fold —
    bit-identical across engines and partitionings (what the DuckDB oracle
    gate needs); "double" is the production path — a plain double fold,
    ~25-35% faster per pair (no per-element round+cast), at the cost of
    last-ulp association sensitivity that no ranking threshold resolves."""
    qid = query_id_col or id_col
    fixed = score == "fixed"
    nrm = norm_units if fixed else (
        lambda v: _dot_double(v, v)
    )
    # norms fold once per side BEFORE the cross join (HOF lambdas are
    # interpreted — per-pair refolds cost 3x the scoring stage)
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__qn", nrm(F.col("__qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn("__cn", nrm(F.col("__cv")))
    cos_expr = (
        cosine_from_units(
            dot_units(F.col("__qv"), F.col("__cv")),
            F.col("__qn"), F.col("__cn"),
        ) if fixed else F.try_divide(
            _dot_double(F.col("__qv"), F.col("__cv")),
            F.sqrt(F.col("__qn") * F.col("__cn")),
        )
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id", "neighbor_id", cos_expr.alias("cos"),
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


def _sql_arr(vec: list[float]) -> str:
    """A literal array<double> as SQL text. ``repr(float)`` is the
    shortest string that round-trips binary64 and Spark's parser is
    correctly rounded, so the planned value is bit-identical to an
    F.lit chain (verified) — but ONE F.expr hop instead of dim+1 py4j
    round trips (a 16-plane LSH key pair measured 6.4 s of plan build
    the Column way, ~0.1 s as SQL text). Non-finite values (a NaN
    centroid coordinate from a NaN embedding reaching Lloyd's mean)
    render as string-cast literals — repr would produce 'nanD'/'infD',
    which the parser reads as column identifiers."""
    def lit(w: float) -> str:
        w = float(w)
        if math.isnan(w):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(w):
            return f"CAST('{'-' if w < 0 else ''}Infinity' AS DOUBLE)"
        return f"{w!r}D"

    return "array(" + ",".join(lit(w) for w in vec) + ")"


def _qname(col_name: str) -> str:
    """Backtick-quote a TOP-LEVEL column name for SQL text. Every
    caller passes an engine-internal alias ("__v", "__qv", "__cv") —
    the public entry points resolve the user's vec_col through F.col
    (which handles dotted/nested references) into such an alias before
    any SQL-text builder runs, so a name like "meta.emb" never reaches
    here (where it would quote as one literal identifier and fail
    analysis). Guarded by test_lsh_nested_vec_col."""
    return "`" + col_name.replace("`", "``") + "`"


def _bucket_key(vec_name: str, hyperplanes) -> F.Column:
    """Sign-bit signature of the vector column (BY NAME) against each
    hyperplane -> long. Built as one SQL string — see _sql_arr."""
    v = _qname(vec_name)
    terms = []
    for i, plane in enumerate(hyperplanes):
        dot = (f"aggregate(zip_with({v}, {_sql_arr(plane)},"
               " (x, y) -> x * y), 0.0D, (acc, e) -> acc + e)")
        terms.append(f"(CASE WHEN {dot} >= 0.0D THEN {1 << i}L ELSE 0L END)")
    return F.expr("(" + " + ".join(terms) + ")")


def _bucket_keys_pandas(dim: int, planes: int, tables: int, seed: int):
    """Arrow twin of _bucket_key for ALL tables at once: embedding ->
    array<long> of ``tables`` bucket keys, one numpy batch pass.

    BIT-EQUAL to the expr path by construction: the plane dot is
    accumulated SEQUENTIALLY over dimensions (one vectorized
    multiply-then-add per dimension, binary64 both ways), which is the
    exact rounding sequence of the interpreted aggregate(zip_with) fold
    — numpy's own dot/sum would pairwise-split the reduction and could
    flip a sign at a bucket boundary. Pinned by
    test_lsh_bucket_keys_pandas_bit_equal.

    Why it exists: the HOF fold is interpreted row-at-a-time JVM-side
    (no codegen), so tables x planes x dim multiply-adds per row ran
    ~4 s single-core on a 1-split input at sf0.1; the numpy twin is two
    matrix ops per Arrow batch and parallelizes with input splits the
    same way.

    Degenerate inputs follow the expr path's null story: a null vector
    or a length != dim vector keys to 0 for every table (any null in
    the fold nulls the dot; CASE null>=0 is false for every plane).
    NaN elements match too (r10): Spark's NaN ordering makes NaN >= 0
    TRUE, so a nan-poisoned dot sets the bit — the twin reproduces that
    with an explicit isnan-or (numpy's native NaN >= 0 is false, which
    silently flipped bucket keys before; pinned by
    test_lsh_bucket_keys_nan_bit_equal). A NaN embedding in a 100 TB
    corpus thus degrades recall identically on both paths instead of
    diverging between them."""
    import numpy as np
    import pandas as pd

    flat = []
    for t in range(tables):
        flat.extend(_hyperplanes(dim, planes, t, seed))
    W = np.asarray(flat, dtype=np.float64).T.copy()  # dim x (tables*planes)
    weights = np.left_shift(np.int64(1), np.arange(planes, dtype=np.int64))

    def keys(vs):
        n = len(vs)
        out = np.zeros((n, tables), dtype=np.int64)
        ok = np.fromiter(
            (v is not None and len(v) == dim for v in vs), bool, n)
        if ok.any():
            M = np.stack([np.asarray(v, dtype=np.float64)
                          for v, o in zip(vs, ok) if o])
            acc = np.zeros((M.shape[0], W.shape[1]))
            for d in range(dim):  # sequential over dims = fold order
                acc += M[:, d][:, None] * W[d]
            # Spark orders NaN above every number, so CASE NaN >= 0 is
            # TRUE on the expr path — mirror it (numpy would say False)
            bits = ((acc >= 0.0) | np.isnan(acc)).reshape(-1, tables,
                                                          planes)
            out[ok] = (bits * weights).sum(axis=2, dtype=np.int64)
        return pd.Series(list(out))

    # explicit annotation objects: the module's `from __future__ import
    # annotations` leaves string hints pandas_udf can't resolve without
    # module-global pandas
    keys.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return F.pandas_udf(keys, T.ArrayType(T.LongType()))


def _bucket_structs(vec_name: str, *, dim: int, planes: int, tables: int,
                    seed: int, key_impl: str = "pandas") -> F.Column:
    """array<struct<tbl:int, key:long>> of all ``tables`` bucket keys
    for the vector column (BY NAME) — the shared bucket constructor for
    every LSH consumer. ``key_impl="pandas"`` (default) is the Arrow
    twin (see _bucket_keys_pandas); ``"expr"`` is the pure-JVM
    expression path (authoritative for degenerate NaN inputs)."""
    if key_impl == "pandas":
        _require_arrow("LSH bucket keys", "key_impl='expr'")
        ks = _bucket_keys_pandas(dim, planes, tables, seed)(F.col(vec_name))
        return F.transform(
            ks, lambda k, i: F.struct(i.cast("int").alias("tbl"),
                                      k.alias("key")))
    if key_impl != "expr":
        raise ValueError(f"unknown key_impl: {key_impl!r} "
                         "(expected 'pandas' or 'expr')")
    return F.array(*[
        F.struct(
            F.lit(t).alias("tbl"),
            _bucket_key(vec_name,
                        _hyperplanes(dim, planes, t, seed)).alias("key"),
        )
        for t in range(tables)
    ])


def _sq_dist_sql(vec_name: str, centroid: list[float]) -> str:
    """Squared L2 distance of a vector column (BY NAME) to a literal
    centroid, as SQL text."""
    v = _qname(vec_name)
    return (f"aggregate(zip_with({v}, {_sql_arr(centroid)},"
            " (x, y) -> (x - y) * (x - y)), 0.0D, (acc, e) -> acc + e)")


def _nearest(vec_name: str, centroids: list[list[float]],
             nprobe: int) -> F.Column:
    """Indices of the ``nprobe`` nearest centroids as array<int> —
    array_sort over (distance, index) structs, lexicographic min first.
    One SQL string (see _sql_arr): nlist x dim literals as Columns cost
    a py4j hop per element, re-paid every Lloyd's iteration."""
    scored = "array(" + ",".join(
        f"struct({_sq_dist_sql(vec_name, c)} AS d, {i} AS i)"
        for i, c in enumerate(centroids)
    ) + ")"
    return F.expr(f"transform(slice(array_sort({scored}), 1, {int(nprobe)}),"
                  " s -> s.i)")


def _nearest_pandas(centroids: list[list[float]], nprobe: int):
    """Arrow twin of _nearest: embedding -> array<int> of the nprobe
    nearest centroid indices, one numpy batch pass. BIT-EQUAL ranking
    to the expr path: squared distances accumulate SEQUENTIALLY over
    dimensions ((x-y)*(x-y) then add, binary64 — the interpreted
    fold's exact rounding sequence), and a stable argsort reproduces
    the (distance, index) lexicographic order. Degenerate rows (null
    vector, length != dim) yield [0..nprobe-1], exactly the expr
    path's all-null-distance tie-break (verified); NaN elements also
    agree (r10, pinned by test_ivf_nearest_nan_bit_equal): a NaN
    distance sorts LAST on both paths (Spark orders NaN above every
    number; numpy's stable argsort places NaN at the end), and ties —
    all-NaN rows or equal finite distances — fall back to ascending
    centroid index on both (Spark's struct comparison treats NaN ==
    NaN and compares i; stable argsort preserves input order). Why
    the twin exists: the fold is
    interpreted row-at-a-time JVM-side, so corpus × nlist × dim
    multiply-adds dominate IVF assignment — the 100 TB cost of
    set_ivf/knn_ivf's corpus pass, not just a gate-seconds issue.
    Pinned by test_ivf_nearest_pandas_bit_equal."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)  # nlist x dim
    nlist, dim = C.shape
    base = np.arange(min(nprobe, nlist), dtype=np.int32)

    def nn(vs):
        n = len(vs)
        out = np.tile(base, (n, 1))
        ok = np.fromiter(
            (v is not None and len(v) == dim for v in vs), bool, n)
        if ok.any():
            M = np.stack([np.asarray(v, dtype=np.float64)
                          for v, o in zip(vs, ok) if o])
            acc = np.zeros((M.shape[0], nlist))
            for d in range(dim):  # sequential over dims = fold order
                t = M[:, d][:, None] - C[:, d]
                acc += t * t
            order = np.argsort(acc, axis=1, kind="stable")
            out[ok] = order[:, :len(base)].astype(np.int32)
        return pd.Series(list(out))

    nn.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return F.pandas_udf(nn, T.ArrayType(T.IntegerType()))


def _nearest_impl(vec_name: str, centroids: list[list[float]],
                  nprobe: int, impl: str = "pandas") -> F.Column:
    """Dispatch for the nearest-centroid assignment: ``"pandas"``
    (default) is the Arrow twin, ``"expr"`` the pure-JVM expression
    (authoritative for NaN inputs)."""
    if impl == "pandas":
        _require_arrow("IVF centroid assignment", "assign_impl='expr'")
        return _nearest_pandas(centroids, nprobe)(F.col(vec_name))
    if impl != "expr":
        raise ValueError(f"unknown assign_impl: {impl!r} "
                         "(expected 'pandas' or 'expr')")
    return _nearest(vec_name, centroids, nprobe)


def ivf_train(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    nlist: int = 16,
    iters: int = 5,
    max_train_rows: int = 10_000,
    assign_impl: str = "pandas",
    corpus_rows: int | None = None,
) -> list[list[float]]:
    """Train IVF centroids: distributed deterministic sampling, then
    Lloyd's iterations driver-side in numpy over the bounded sample.

    The training sample is deterministic WITHOUT a global sort (an
    orderBy(hash).limit would top-k per partition and merge
    num_partitions x k vector rows driver-side — a scale-killer at
    100 TB partition counts): a count sizes a hash threshold that keeps
    ~1.2x the target rows in one scan-stage filter, and only that small
    surviving set is hash-sorted to pin the exact sample. Init takes the
    nlist hash-smallest rows, so the whole procedure is reproducible with
    no RNG state to ship.

    r13 (guide §1.2/§2.6): the Lloyd iterations themselves moved from
    per-iteration Spark jobs (assignment pandas_udf + Summarizer.mean
    collect — 2 jobs × iters, ~1.9 s of mostly scheduling at gate
    scale) to ONE bounded collect of the sample (≤ max_train_rows ×
    dim doubles — a few MB regardless of corpus size) plus driver-side
    numpy. Training is now count + 1 collect = ≤ 2 jobs; the 100 TB
    cost — the corpus scan that sizes and filters the sample, and the
    full-corpus ASSIGNMENT in knn_ivf/set_ivf — stays distributed and
    unchanged. Numerics: the assignment distance accumulates
    SEQUENTIALLY over dimensions, the exact rounding sequence of the
    expr/pandas assignment twins (_nearest_pandas), with the same
    NaN-sorts-last and degenerate-row story; per-cluster means
    accumulate in sample order (np.add.at), which differs from the old
    Summarizer partition-merge order by last-ulp rounding only — the
    trained centroids are an approximation either way, every probe
    re-ranks with exact cosine, and the knn_recall gate margins were
    re-measured unchanged-to-better at all three SFs (OPTIMIZATION_r13).
    ``assign_impl`` is kept for API compatibility; training assignment
    is always the shared sequential-fold spelling now.

    ``corpus_rows``: pass the row count when the pipeline already knows
    it, to skip the sizing scan — otherwise training pays one extra
    full corpus pass per train run (r9 verdict item 5). Pass an OVER-
    not under-estimate: the estimate only sizes the keep fraction, and
    the result stays deterministic either way (the hash sort + limit
    re-pins the same exact sample), but an overestimate merely risks a
    sample — still deterministic — short of max_train_rows, while an
    underestimate WIDENS the keep fraction toward keep-everything,
    degenerating the sizing filter into the full-corpus global
    hash-sort the filter exists to avoid (a cost cliff, not a
    correctness one — r10 ADVICE).
    """
    import numpy as np

    v = corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    n = corpus_rows if corpus_rows is not None else v.count()
    bucket_mod = 1 << 20
    h = F.pmod(F.xxhash64(F.col("__id")), F.lit(bucket_mod))
    # keep ~1.2x the target; a keep fraction >= 1 makes the filter a
    # no-op, so apply it unconditionally rather than gating on
    # n > max_train_rows (the old gate silently skipped the filter for
    # any corpus_rows <= max_train_rows, accurate or not)
    if n > 0:
        keep = min(bucket_mod, int(bucket_mod * 1.2 * max_train_rows / n) + 1)
        if keep < bucket_mod:
            v = v.filter(h < keep)
    # the ONE training action: the hash-pinned sample, collected in its
    # deterministic order (bounded: max_train_rows × dim doubles)
    vecs = [
        r["__v"]
        for r in v.orderBy(F.xxhash64(F.col("__id")))
        .limit(max_train_rows).select("__v").collect()
    ]
    centroids = [[float(x) for x in vec] for vec in vecs[:nlist]]
    if not centroids:
        # empty corpus: no centroids to train — callers (knn_ivf) handle
        # [] by returning no neighbors
        return centroids
    dim = len(centroids[0])
    # degenerate sample rows (null / wrong-length vectors) are excluded
    # from the means; the old Spark path fed them to cluster 0's
    # Summarizer where a null vector errored — dropping them is the
    # defined behavior now (assignment of the CORPUS still routes them
    # to list 0 via _nearest_impl, unchanged)
    M = np.array(
        [vec for vec in vecs if vec is not None and len(vec) == dim],
        dtype=np.float64,
    )
    if M.size == 0:
        return centroids
    for _ in range(iters):
        C = np.asarray(centroids, dtype=np.float64)
        acc = np.zeros((M.shape[0], C.shape[0]))
        for d in range(dim):  # sequential over dims = the fold order
            t = M[:, d][:, None] - C[:, d]
            acc += t * t
        # stable argsort, first column: lexicographic (distance, index)
        # min with NaN sorting last — _nearest_pandas's exact tie story
        assign = np.argsort(acc, axis=1, kind="stable")[:, 0]
        sums = np.zeros_like(C)
        counts = np.zeros(C.shape[0], dtype=np.int64)
        np.add.at(sums, assign, M)  # unbuffered: sums in sample order
        np.add.at(counts, assign, 1)
        # empty clusters keep their previous centroid
        centroids = [
            [float(x) for x in (sums[i] / counts[i])] if counts[i] else c
            for i, c in enumerate(centroids)
        ]
    return centroids


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    centroids: list[list[float]] | None = None,
    query_id_col: str | None = None,
    assign_impl: str = "pandas",
    corpus_rows: int | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: corpus vectors
    are bucketed by nearest k-means centroid, queries probe their
    ``nprobe`` nearest lists, exact cosine re-ranks the candidates.

    Same bucket-join shape as knn_lsh with learned buckets instead of
    random hyperplanes: one shuffle join on the centroid id, top-k window
    per query. Pass ``centroids`` to reuse a trained index (train once,
    probe many — the production shape); otherwise ivf_train runs first.
    Returns (query_id, neighbor_id, cos, rank)."""
    qid = query_id_col or id_col
    if centroids is None:
        centroids = ivf_train(
            corpus, vec_col, id_col, nlist=nlist, iters=iters,
            assign_impl=assign_impl, corpus_rows=corpus_rows,
        )
    if not centroids:
        # empty corpus trains zero centroids; F.array() of no columns has
        # no element type and breaks _nearest — the correct result is
        # simply no neighbors, with the contract schema (dtypes derived
        # from the inputs, not hardcoded)
        return (
            queries.select(F.col(qid).alias("query_id")).limit(0)
            .withColumn("neighbor_id",
                        F.lit(None).cast(corpus.schema[id_col].dataType))
            .withColumn("cos", F.lit(0.0))
            .withColumn("rank", F.lit(1))
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn("__list", _nearest_impl("__cv", centroids, 1, assign_impl)[0]) \
        .withColumn("__cn", norm_units(F.col("__cv")))
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn(
        "__list", F.explode(_nearest_impl("__qv", centroids, nprobe,
                                          assign_impl))
    ).withColumn("__qn", norm_units(F.col("__qv")))
    cand = q.join(c, "__list").select(
        "query_id", "neighbor_id",
        cosine_from_units(
            dot_units(F.col("__qv"), F.col("__cv")),
            F.col("__qn"), F.col("__cn"),
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


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
    key_impl: str = "pandas",
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidate retrieval +
    exact cosine re-rank. Each side computes ``tables`` bucket keys; the
    join is on (table, key) — a plain shuffle join Catalyst/AQE can
    broadcast or skew-split. Candidate retrieval and the multi-table
    dropDuplicates are SLIM (id pairs only); vectors re-attach after the
    dedup via per-side hash joins, so vector bytes move O(n) per side,
    not O(candidate pairs). Bucket keys default to the Arrow twin
    (bit-equal, see _bucket_keys_pandas). Returns (query_id,
    neighbor_id, cos, rank)."""
    qid = query_id_col or id_col

    def payload(df, idc, out_id):
        return df.select(
            F.col(idc).alias(out_id), F.col(vec_col).alias(f"__{out_id}_v")
        ).withColumn(f"__{out_id}_n", norm_units(F.col(f"__{out_id}_v")))

    def slim_buckets(sel, out_id):
        buckets = _bucket_structs(
            f"__{out_id}_v", dim=dim, planes=planes, tables=tables,
            seed=seed, key_impl=key_impl)
        return sel.select(out_id, F.explode(buckets).alias("bk")) \
                  .select(out_id, "bk.tbl", "bk.key")

    qp = payload(queries, qid, "query_id")
    cp = payload(corpus, id_col, "neighbor_id")
    cand = (
        slim_buckets(qp, "query_id")
        .join(slim_buckets(cp, "neighbor_id"), ["tbl", "key"])
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
        .join(qp, "query_id").join(cp, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            cosine_from_units(
                dot_units(F.col("__query_id_v"), F.col("__neighbor_id_v")),
                F.col("__query_id_n"), F.col("__neighbor_id_n"),
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_dup_pairs_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    threshold: float = 0.95,
    dim: int,
    planes: int = 4,
    tables: int = 8,
    seed: int = 42,
    impl: str = "expr",
    key_impl: str = "pandas",
) -> DataFrame:
    """Corpus-scale embedding near-duplicate pairs: hyperplane-LSH
    candidate buckets + exact cosine verification — the scale path for
    ``dedup.embedding_dup_pairs`` (which is the O(n²) all-pairs
    verifier). Returns (id_a, id_b, cos), cos >= threshold.

    ``impl="pandas"`` scores candidates with the Arrow-vectorized
    fixed-point scorer (bit-identical to the expression fold — pinned
    by test_embedding_pandas_impl_bit_equal): Spark evaluates
    higher-order array lambdas interpreted per element, so at millions
    of candidate pairs the numpy batch math is ~10× cheaper per pair.

    Recall: a pair at angle θ = acos(threshold) collides in one table
    with probability (1 - θ/π)^planes; the overall miss probability is
    (1 - (1 - θ/π)^planes)^tables. planes=1, tables=16 is effectively
    exact at any useful threshold (miss ~1e-7 even at θ≈66°); the
    4-plane/8-table default trades a few-per-mille miss rate for ~16×
    smaller candidate buckets.

    Scale: candidate generation is SLIM — the bucket self-join and the
    multi-table dropDuplicates move only (id_a, id_b) 16-byte rows (the
    r7 minhash lesson: deduping pairs that still carry their payload
    shuffles O(candidates × vector) bytes — measured 550 MB at sf0.1,
    ~37× the slim plan). Vectors re-attach AFTER the dedup via two hash
    joins against ONE (id, vector, norm) subtree (ReusedExchange /
    runtime broadcast), so vector bytes cross the wire O(n) — once per
    side — not O(candidate pairs). Hot buckets ARE near-duplicate mass
    (the pairs we want), so bucket skew is signal; AQE splits oversized
    partitions.
    """
    from rayforce_spark.datapipe.dedup import fanout

    sel = fanout(df).select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).withColumn("__nu", norm_units(F.col("__v")))
    buckets = _bucket_structs("__v", dim=dim, planes=planes,
                              tables=tables, seed=seed,
                              key_impl=key_impl)
    if impl == "block":
        # r9: verify INSIDE each bucket with the shared numpy block
        # scorer (bit-equal fixed-point math, score_units_block) — each
        # vector ships through Arrow once per table (n × tables rows
        # total) instead of once per CANDIDATE PAIR (the "pandas" shape
        # moved ~2 × 64 doubles × |candidates| — ~700 MB at sf0.1 for a
        # 920-pair result), and the cross-table dropDuplicates runs on
        # the few FINAL pairs, not millions of candidate ids. Guarded:
        # a bucket wider than max_bucket_rows raises with the planes
        # lever named (hot buckets are near-dup mass, but k² inside one
        # task has a ceiling) — same guard class as pack_greedy.
        return _lsh_pairs_block(sel, buckets, threshold,
                                max_bucket_rows=500_000)
    # slim candidate ids: the vector column is pruned before the
    # self-join, so the (tbl, key) exchange and the pair-level
    # dropDuplicates carry ids only
    b = sel.select("__id", F.explode(buckets).alias("bk")) \
           .select("__id", "bk.tbl", "bk.key")
    cand = (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if impl == "pandas":
        from rayforce_spark.datapipe.dedup import _cosine_units_pandas

        cos_fn = _cosine_units_pandas()
        pa = sel.select(F.col("__id").alias("id_a"),
                        F.col("__v").alias("__va"))
        pb = sel.select(F.col("__id").alias("id_b"),
                        F.col("__v").alias("__vb"))
        return (
            cand.join(pa, "id_a").join(pb, "id_b")
            .select("id_a", "id_b",
                    cos_fn(F.col("__va"), F.col("__vb")).alias("cos"))
            .filter(F.col("cos") >= threshold)
        )
    pa = sel.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"),
                    F.col("__nu").alias("__na"))
    pb = sel.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"),
                    F.col("__nu").alias("__nb"))
    return (
        cand.join(pa, "id_a").join(pb, "id_b")
        .select(
            "id_a", "id_b",
            cosine_from_units(
                dot_units(F.col("__va"), F.col("__vb")),
                F.col("__na"), F.col("__nb"),
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def _lsh_pairs_block(sel: DataFrame, buckets, threshold: float,
                     *, max_bucket_rows: int) -> DataFrame:
    """Per-bucket numpy verification for embedding_dup_pairs_lsh
    impl="block": explode (tbl, key) WITH the vector, group by bucket,
    score the bucket's k² pairs in one Arrow batch via
    dedup.score_units_block, emit only passing pairs, dedup across
    tables at the end (a pair found in several tables is emitted by
    each — final-pair dedup is tiny)."""
    import pandas as pd

    from rayforce_spark.datapipe.dedup import score_units_block

    id_type = sel.schema["__id"].dataType
    out_schema = T.StructType([
        T.StructField("id_a", id_type),
        T.StructField("id_b", id_type),
        T.StructField("cos", T.DoubleType()),
    ])
    b = (sel.select("__id", "__v", F.explode(buckets).alias("bk"))
         .select("__id", "__v", "bk.tbl", "bk.key"))
    thr = threshold
    limit = max_bucket_rows

    def _score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        if len(pdf) > limit:
            raise ValueError(
                f"embedding_dup_pairs_lsh[block]: bucket holds "
                f"{len(pdf)} vectors > max_bucket_rows={limit}; raise "
                "planes= (halves expected bucket size per plane) or "
                "use impl='pandas' (streams pairs instead of "
                "materializing the bucket)")
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": pdf["__id"][:0],
                                 "id_b": pdf["__id"][:0],
                                 "cos": pd.Series(dtype="float64")})
        A = np.stack([np.asarray(x, dtype=np.float64)
                      for x in pdf["__v"]])
        ids = pdf["__id"].to_numpy()
        ii, jj, cc = score_units_block(A, A, ids, ids, thr)
        return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj], "cos": cc})

    return (b.groupBy("tbl", "key").applyInPandas(_score, out_schema)
            .dropDuplicates(["id_a", "id_b"]))


def set_ivf(
    corpus: DataFrame,
    path: str,
    vec_col: str,
    id_col: str,
    *,
    nlist: int = 16,
    iters: int = 5,
    centroids: list[list[float]] | None = None,
    assign_impl: str = "pandas",
    corpus_rows: int | None = None,
) -> list[list[float]]:
    """Persist an IVF index: train (or reuse) centroids, write them as
    a tiny parquet sidecar under ``path/_centroids``, and write the
    corpus PARTITIONED BY its nearest-list assignment under
    ``path/data`` — the production train-once/probe-many layout. A
    probe then reads only its ``nprobe`` list directories (parquet
    partition pruning), not the corpus; re-probing never re-trains and
    never re-shuffles. Returns the trained centroids."""
    if centroids is None:
        centroids = ivf_train(corpus, vec_col, id_col, nlist=nlist,
                              iters=iters, assign_impl=assign_impl,
                              corpus_rows=corpus_rows)
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "list int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_centroids")
    if centroids:
        (corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("__cv"))
         .withColumn("__list",
                     _nearest_impl("__cv", centroids, 1, assign_impl)[0])
         .write.partitionBy("__list").mode("overwrite")
         .parquet(f"{path}/data"))
    return centroids


def load_ivf_centroids(spark, path: str) -> list[list[float]]:
    rows = spark.read.parquet(f"{path}/_centroids").collect()
    out: list[list[float]] = [[] for _ in rows]
    for r in rows:
        out[r["list"]] = [float(x) for x in r["centroid"]]
    return out


def knn_ivf_indexed(
    spark,
    path: str,
    queries: DataFrame,
    vec_col: str,
    *,
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str = "vec_id",
    id_type: str = "long",
    assign_impl: str = "pandas",
) -> DataFrame:
    """Probe a persisted IVF index (see :func:`set_ivf`): queries
    explode to their ``nprobe`` nearest lists and join the
    list-partitioned corpus on the PARTITION column, so the scan reads
    only probed list directories (few queries -> dynamic partition
    pruning; broad probes read what they touch). Exact fixed-point
    cosine re-ranks, same contract as knn_ivf:
    (query_id, neighbor_id, cos, rank). ``id_type`` is only used for
    the empty-index early return (an empty corpus writes no data dir
    to read the corpus id type from) — pass the corpus id column's
    Spark type name if it isn't long, so empty and populated probes
    union cleanly."""
    centroids = load_ivf_centroids(spark, path)
    if not centroids:
        return (queries.select(F.col(query_id_col).alias("query_id"))
                .limit(0)
                .withColumn("neighbor_id", F.lit(None).cast(id_type))
                .withColumn("cos", F.lit(0.0))
                .withColumn("rank", F.lit(1)))
    c = spark.read.parquet(f"{path}/data").withColumn(
        "__cn", norm_units(F.col("__cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn(
        "__list", F.explode(_nearest_impl("__qv", centroids, nprobe,
                                          assign_impl))
    ).withColumn("__qn", norm_units(F.col("__qv")))
    cand = q.join(c, "__list").select(
        "query_id", "neighbor_id",
        cosine_from_units(
            dot_units(F.col("__qv"), F.col("__cv")),
            F.col("__qn"), F.col("__cn"),
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
