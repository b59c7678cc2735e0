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
    from rayforce_spark.sources._sidecar import write_schema_sidecar

    out = df
    if sort_within_partitions_by:
        out = out.sortWithinPartitions(*sort_within_partitions_by)
    out.write.parquet(path, mode=mode)
    # the `.d` analog (ref core/io.c:1194): a zero-row write still reads
    # back with the right schema
    write_schema_sidecar(out, path)


def get_splayed(spark: SparkSession, path: str) -> DataFrame:
    """Load a splayed (Parquet) table — lazy, column-pruned, mmap-free.
    An empty splay (no data files) reads back via the schema sidecar."""
    from pyspark.errors import AnalysisException

    from rayforce_spark.sources._sidecar import read_schema_sidecar

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        schema = read_schema_sidecar(spark, path)
        if schema is None:
            raise
        return spark.read.schema(schema).parquet(path)
