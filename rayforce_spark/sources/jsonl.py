"""JSONL source/sink — one JSON object per line, the de-facto
interchange format for LLM document corpora (beyond the reference's
format surface: it ships read-csv only, ref core/io.c:670; a
training-data engine ingests and exports JSONL in practice).

Same contract as :mod:`csv`: the schema is EXPLICIT (the reference's
type-vector idiom — runtime inference would be a full extra pass over
a 100 TB corpus), the read is Spark's splittable distributed json
reader (newline-delimited json splits on line boundaries exactly like
CSV), the write is one file per partition. Malformed lines follow
Spark's PERMISSIVE default (null row) unless ``strict=True``
(FAILFAST) — corpus files in the wild carry broken lines, and a
100 TB job that dies at 99% on one of them is worse than a counted
null row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from rayforce_spark.sources.csv import schema_from_types


def read_jsonl(
    spark: SparkSession,
    path: str,
    names: Sequence[str],
    types: Sequence[str],
    *,
    strict: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON with an explicit reference-style
    type vector (same names/types contract as read_csv)."""
    return spark.read.json(
        path,
        schema=schema_from_types(names, types),
        mode="FAILFAST" if strict else "PERMISSIVE",
    )


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite",
                compression: str | None = None) -> None:
    """Distributed newline-delimited JSON write; one file per
    partition. ``compression``: e.g. "gzip" — JSONL corpora usually
    ship gzipped (note gzip files are NOT splittable on read; prefer
    uncompressed or zstd-parquet for the hot path)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
