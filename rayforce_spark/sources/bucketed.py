"""Bucketed tables: pre-shuffled on-disk layout for co-located joins.

The reference co-locates joins by keeping each table's hash index in
memory next to the data (ref core/index.c:2886 — the key->row map IS the
layout); at 100 TB the Spark analog is bucketing: write the table
hash-partitioned by the join/group keys into N buckets
(``bucketBy(n, keys).sortBy(keys)`` + ``saveAsTable``), and every later
equi-join or aggregation on those keys skips its Exchange entirely —
the scan's output partitioning already satisfies the requirement. For a
fact table joined repeatedly on the same key (the reference's tick-data
idiom: trades/quotes keyed by symbol), this converts every query's
shuffle of the big side into a one-time write cost.

Notes for real clusters:
* both join sides must be bucketed on the same keys with compatible
  bucket counts (equal, or one a multiple of the other with AQE);
* ``sortBy`` additionally enables shuffle-AND-sort-free sort-merge joins;
* bucket pruning applies to equality filters on the bucket keys
  (``spark.sql.sources.bucketing.enabled`` is on by default).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame, SparkSession


def set_bucketed(
    df: DataFrame,
    table: str,
    keys: Union[str, Sequence[str]],
    *,
    n_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed catalog table named ``table``.

    ``keys`` are the bucket (future join/group) keys; ``sort=True`` also
    sorts within buckets by the same keys (sort-merge joins then need
    neither exchange nor sort). ``path`` pins an external location;
    otherwise the session's warehouse dir is used. Bucket metadata lives
    in the session catalog — readers must go through
    :func:`get_bucketed` / ``spark.table``, not ``spark.read.parquet``
    (a raw path read loses the bucketing contract).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def get_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Load a bucketed table through the catalog (keeps the bucket spec;
    joins/aggs on the bucket keys plan with no Exchange on this side)."""
    return spark.table(table)
