"""Deterministic sampling and splitting for reproducible data curation.

A 100 TB training pipeline needs *reproducible* subsetting: the same
document must land in the same sample / fold on every run, on any engine,
at any partitioning — `df.sample()` (seeded per-partition RNG) breaks the
moment the partition layout changes. Everything here derives membership
from a pure function of a key column, so results are stable across runs,
cluster sizes, and engines, and each operator is a narrow scan-stage
filter (no shuffle) unless noted.

Scale notes
-----------
- `hash_bucket` / `sample_hash` / `assign_folds` / `mix_corpora` are pure
  Column expressions — they execute in the scan stage with predicate
  pushdown intact and add zero shuffles at any scale.
- `cap_per_key` is one hash shuffle on the key (window row_number). A key
  with billions of rows would bottleneck its single task; cap such skew
  upstream with `sample_hash` pre-filtering, or raise `n` granularity by
  salting the key — documented rather than hidden because a silent
  two-phase rewrite would change which rows are kept.

Portability: the bucket hash is Knuth multiplicative hashing over a
Mersenne-prime field — plain bigint arithmetic that reproduces
bit-identically in any SQL engine (DuckDB, Trino, BigQuery), unlike
xxhash64 which only Spark exposes. For string keys, crc32/ascii-fold the
key first or use F.xxhash64 when cross-engine parity is not required.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# golden-ratio multiplicative constant (Knuth, TAOCP vol. 3 §6.4) over the
# Mersenne prime 2^31-1: k < 2^31 after the first pmod, so k * KNUTH < 2^63
# (~2^62.3) — no signed-64-bit overflow in any engine's bigint arithmetic
_KNUTH = 2654435761
_MERSENNE = 2147483647  # 2^31 - 1
_GRAIN = 1_000_000  # sampling resolution: 1e-6


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_bucket(key: Column | str, n_buckets: int, salt: int = 0) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer key column.

    ((key + salt) mod P) * KNUTH mod P mod n_buckets, P = 2^31-1. Pure
    bigint expression: same value on every run / partitioning / engine.
    """
    k = F.pmod(_col(key).cast("long") + F.lit(salt), F.lit(_MERSENNE))
    return F.pmod(k * F.lit(_KNUTH), F.lit(_MERSENNE)) % F.lit(n_buckets)


def sample_hash(df: DataFrame, key: Column | str, fraction: float,
                salt: int = 0) -> DataFrame:
    """Keep a deterministic `fraction` of rows by key (1e-6 resolution).

    Scan-stage filter — no shuffle, survives any repartitioning, and two
    samples with the same salt are consistent (a 10% sample is a subset
    of a 20% sample), which makes progressive scale-up runs cheap.
    """
    return df.filter(hash_bucket(key, _GRAIN, salt) < int(fraction * _GRAIN))


def assign_folds(key: Column | str, weights: Sequence[float],
                 names: Sequence[str] | None = None,
                 salt: int = 0) -> Column:
    """Fold label ('train'/'val'/'test' by default) from cumulative weight
    thresholds over the hash bucket — a deterministic, engine-portable
    train/val/test split as a Column expression."""
    if names is None:
        names = ["train", "val", "test"][: len(weights)]
    if len(names) != len(weights):
        raise ValueError("names and weights must align")
    total = float(sum(weights))
    b = hash_bucket(key, _GRAIN, salt)
    expr = F.lit(names[-1])
    cum = 0.0
    arms = []
    for nm, w in zip(names[:-1], weights[:-1]):
        cum += w / total
        arms.append((int(cum * _GRAIN), nm))
    for thresh, nm in reversed(arms):
        expr = F.when(b < thresh, nm).otherwise(expr)
    return expr


def train_val_test_split(df: DataFrame, key: Column | str,
                         weights: Sequence[float] = (0.8, 0.1, 0.1),
                         salt: int = 0,
                         fold_col: str = "fold") -> DataFrame:
    """Attach a deterministic fold column; filter by it to materialize
    splits (each split is again a pure scan-stage predicate)."""
    return df.withColumn(fold_col, assign_folds(key, weights, salt=salt))


def cap_per_key(df: DataFrame, key: Column | str | list, n: int,
                order_by: Column | str | list | None = None) -> DataFrame:
    """Keep at most `n` rows per key (e.g. cap documents per domain so no
    single source dominates the training mix).

    Deterministic when `order_by` totally orders rows within a key. One
    hash shuffle on the key; see module docstring for the skew note.
    """
    keys = [_col(k) for k in (key if isinstance(key, list) else [key])]
    order = (order_by if isinstance(order_by, list)
             else [order_by]) if order_by is not None else keys
    w = Window.partitionBy(*keys).orderBy(*[_col(o) for o in order])
    rn = "__rn"
    while rn in df.columns:  # never clobber a caller column
        rn += "_"
    return (df.withColumn(rn, F.row_number().over(w))
            .filter(F.col(rn) <= n).drop(rn))


def mix_corpora(sources: Iterable[tuple[DataFrame, Column | str, float]],
                salt: int = 0) -> DataFrame:
    """Blend corpora at given rates: deterministic per-source downsampling
    + unionByName (allowMissingColumns). Rates > 1.0 are capped at 1.0 —
    true oversampling (duplication) is an explicit separate step so row
    provenance stays 1:1."""
    out = None
    for df, key, rate in sources:
        part = sample_hash(df, key, min(rate, 1.0), salt)
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True)
    if out is None:
        raise ValueError("mix_corpora: no sources")
    return out


def shuffle_epoch(df: DataFrame, key: Column | str, epoch: int,
                  *, shards: int = 1024, salt: int = 0) -> DataFrame:
    """Deterministic per-epoch corpus shuffle WITHOUT a global sort
    (training loaders reshuffle each epoch; an orderBy(rand()) is a
    single total sort of 100 TB and non-reproducible). Adds
    ``shard`` (which output file/partition the row lands in) and
    ``pos`` (its position within that shard): shard = Knuth hash of
    (key, salt+epoch), pos = rank of a second independent hash within
    the shard — one hash shuffle + per-shard sort, the same plan shape
    as any keyed window. Reading shards in (shard, pos) order IS the
    epoch's permutation; epoch+1 gives an unrelated permutation from
    the same expression (pure bigint arithmetic — reproducible across
    runs, partitionings, and engines, like every sampler here).

    100 TB shape: ``shards`` bounds the per-shard sort (corpus/shards
    rows per task); write with ``.write.partitionBy`` or
    repartition(shards, "shard") + sortWithinPartitions("shard","pos")
    to lay files out in permutation order."""
    from pyspark.sql import Window

    taken = [c for c in ("shard", "pos") if c in df.columns]
    if taken:
        raise ValueError(
            f"shuffle_epoch: input already has column(s) {taken} — "
            "rename them first (silently overwriting corrupts "
            "compositions with the packers, r9 review)")
    eshard = hash_bucket(key, shards, salt=salt + 1_000_003 * (epoch + 1))
    # independent second hash for the within-shard order (different
    # salt stream; ties broken by the key itself for totality)
    okey = hash_bucket(key, _GRAIN, salt=salt + 2_000_029 * (epoch + 1))
    w = Window.partitionBy("shard").orderBy("__rf_eord", _col(key))
    return (df.withColumn("shard", eshard)
            .withColumn("__rf_eord", okey)
            .withColumn("pos", F.row_number().over(w) - 1)
            .drop("__rf_eord"))
