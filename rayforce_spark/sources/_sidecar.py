"""Schema sidecar for persisted layouts.

A zero-row write is legal (aggressively filtered job, fresh ingest dir)
but Spark's ``partitionBy`` writes no data files for it, and a later
read fails with UNABLE_TO_INFER_SCHEMA. The reference's splayed layout
never has this problem — its ``.d`` schema file IS the table (ref
core/io.c:1194) — so the writers here record the same thing: a one-line
DDL sidecar next to the data, and readers fall back to it when there is
nothing to infer from. Hadoop FileSystem API via py4j, so local paths
and object stores (s3a/abfs) behave identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SIDECAR = "_rf_schema.ddl"


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def write_schema_sidecar(df: DataFrame, path: str) -> None:
    """Record ``df``'s schema (StructType JSON) at ``path``/_rf_schema.ddl
    (the `.d` analog). Overwrites; cheap (one tiny driver-side file)."""
    spark = df.sparkSession
    jvm = spark._jvm
    fs, _ = _fs_path(spark, path)
    target = jvm.org.apache.hadoop.fs.Path(path + "/" + SIDECAR)
    out = fs.create(target, True)
    try:
        out.write(bytearray(df.schema.json().encode()))
    finally:
        out.close()


def read_schema_sidecar(spark: SparkSession, path: str):
    """The recorded StructType, or None if no sidecar exists."""
    import json

    from pyspark.sql import types as T

    jvm = spark._jvm
    fs, _ = _fs_path(spark, path)
    target = jvm.org.apache.hadoop.fs.Path(path + "/" + SIDECAR)
    if not fs.exists(target):
        return None
    stream = fs.open(target)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream))
        return T.StructType.fromJson(json.loads(reader.readLine()))
    finally:
        stream.close()
