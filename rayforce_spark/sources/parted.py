"""Parted databases: date-partitioned on-disk tables -> partitioned Parquet.

ref core/vary.c:176,185-330 (set-parted/get-parted): the reference lays out
``db/2024.01.01/tablename/col`` directories, loads a virtual partition
column, and executes per-partition then merges (PARTED* types,
core/rayforce.h:70-82; partition-wise aggregation core/aggr.c:82-133).

Spark equivalent: ``partitionBy(part_col)`` Parquet. The virtual partition
column is Spark's partition directory column; partition pruning on the
where-clause is Catalyst's PartitionPruning; per-partition execution +
merge is the standard partial/final physical plan. At 100 TB the partition
column choice IS the table layout — date for time-series (the reference's
only choice), anything low-cardinality-per-query here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def set_parted(
    df: DataFrame,
    path: str,
    part_col: str = "date",
    *,
    part_expr: Column | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write a date-parted (or arbitrary-key-parted) dataset.

    ``part_expr`` lets callers derive the partition value (e.g.
    ``F.to_date(K.ns_to_timestamp("ts"))`` for an ns-long event table).
    """
    out = df
    if part_expr is not None:
        out = out.withColumn(part_col, part_expr)
    from rayforce_spark.sources._sidecar import write_schema_sidecar

    writer = out.repartition(part_col).write.partitionBy(part_col)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path, mode=mode)
    # partitionBy writes NO files at all for a zero-row frame — record
    # the schema (partition column included) so the read side still works
    write_schema_sidecar(out, path)


def get_parted(spark: SparkSession, path: str) -> DataFrame:
    """Load a parted dataset; the partition column is virtual (directory-
    derived), and filters on it prune directories before any IO —
    the Spark analog of the reference skipping empty partition entries
    (ref core/index.c:2203-2221)."""
    from pyspark.errors import AnalysisException

    from rayforce_spark.sources._sidecar import read_schema_sidecar

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        return spark.read.option("basePath", path).parquet(path)
    except AnalysisException:
        schema = read_schema_sidecar(spark, path)
        if schema is None:
            raise
        return spark.read.schema(schema).option("basePath", path).parquet(path)
