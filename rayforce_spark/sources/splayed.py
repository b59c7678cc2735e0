"""Splayed tables: one-file-per-column persisted tables -> Parquet.

ref core/vary.c:145,165 (set-splayed/get-splayed), core/io.c:1194 (write:
one file per column + .d schema file), core/io.c:1310 (mmap lazy read).

Parquet is the Spark-native equivalent: columnar chunks are the per-column
files, footer metadata is the .d schema, and the mmap'd lazy columns
(MAPFD, ref core/fdmap.c:32) become the vectorized Parquet reader with
column pruning — only referenced columns are ever read, matching the
reference's late materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def set_splayed(df: DataFrame, path: str, *, mode: str = "overwrite",
                sort_within_partitions_by: list[str] | None = None) -> None:
    """Persist a table as a Parquet directory.

    ``sort_within_partitions_by`` mirrors the reference idiom of writing
    time-sorted splays (better run-length/dictionary compression + rowgroup
    min/max pruning on the sort key at read time).
    """
    out = df
    if sort_within_partitions_by:
        out = out.sortWithinPartitions(*sort_within_partitions_by)
    out.write.parquet(path, mode=mode)


def get_splayed(spark: SparkSession, path: str) -> DataFrame:
    """Load a splayed (Parquet) table — lazy, column-pruned, mmap-free."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path)
