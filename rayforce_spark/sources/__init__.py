"""Sources & sinks (SURVEY §2.1, ref core/io.c, core/vary.c).

The reference's disk formats map onto Parquet:
  splayed table (one mmap'd file per column + .d schema, ref core/io.c:1194)
    -> a Parquet directory (columnar chunks ARE the per-column files)
  parted database (date-partitioned dirs db/2024.01.01/t/col,
    ref core/vary.c:176-330) -> partitionBy(date) Parquet dataset with
    partition pruning
  symbol enumerations (shared sym file, ref core/vary.c:185)
    -> Parquet dictionary encoding (implicit)
  typed CSV (type-vector schema, ref core/io.c:670) -> spark.read.csv(schema)
  journal (append expressions to a file handle, replay with read,
    ref core/io.c:214,343, examples/journal.rfl) -> an append-only JSON-lines
    log replayable in batch or as a stream (streaming/journal.py)

Beyond the reference's surface: JSONL read/write (jsonl.py) — the
LLM-corpus interchange format, same explicit type-vector contract.
"""

from rayforce_spark.sources.csv import read_csv, write_csv
from rayforce_spark.sources.jsonl import read_jsonl, write_jsonl
from rayforce_spark.sources.splayed import get_splayed, set_splayed
from rayforce_spark.sources.parted import get_parted, set_parted
from rayforce_spark.sources.bucketed import get_bucketed, set_bucketed

__all__ = [
    "read_csv",
    "write_csv",
    "read_jsonl",
    "write_jsonl",
    "get_splayed",
    "set_splayed",
    "get_parted",
    "set_parted",
    "get_bucketed",
    "set_bucketed",
]
