"""Typed CSV read/write (ref core/io.c:670 ray_read_csv, core/io.c:946
ray_write_csv).

The reference declares CSV schemas as a type vector, e.g.
``(read-csv "flips.csv" [SYMBOL I64 F64] {...})`` (examples/flips.rfl:8-20).
Here the same type vector becomes a StructType; the parallel chunked parse
(ref core/io.c:574) is Spark's splittable CSV reader.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# reference type names (core/env.c:272-326) -> Spark types (SURVEY §1.2)
_TYPE_MAP = {
    "b8": T.BooleanType(),
    "u8": T.ShortType(),
    "i16": T.ShortType(),
    "i32": T.IntegerType(),
    "i64": T.LongType(),
    "f64": T.DoubleType(),
    "symbol": T.StringType(),
    "c8": T.StringType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "time": T.IntegerType(),  # i32 millis-since-midnight (core/ops.h:269)
    "timestamp": T.TimestampType(),
}


def schema_from_types(names: Sequence[str], types: Sequence[str]) -> T.StructType:
    fields = []
    for n, ty in zip(names, types):
        key = ty.lower()
        if key not in _TYPE_MAP:
            raise ValueError(f"unknown type '{ty}' (choose from {sorted(_TYPE_MAP)})")
        fields.append(T.StructField(n, _TYPE_MAP[key], True))
    return T.StructType(fields)


def read_csv(
    spark: SparkSession,
    path: str,
    names: Sequence[str],
    types: Sequence[str],
    *,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """(read-csv path [types] {names}) — explicit schema, no inference
    (inference = a full extra pass at 100 TB)."""
    return spark.read.csv(
        path, schema=schema_from_types(names, types), header=header, sep=sep
    )


def write_csv(df: DataFrame, path: str, *, header: bool = True, sep: str = ",",
              mode: str = "overwrite") -> None:
    """(write-csv path t) — distributed write; one file per partition."""
    df.write.csv(path, header=header, sep=sep, mode=mode)
