"""Journal: append-only replayable log (ref examples/journal.rfl,
core/io.c:214 read/replay, core/io.c:343 write).

The reference journals *expressions* to a binary file handle and re-evals
them on replay. The Spark-native shape is a data journal: append row
batches as JSON-lines (or Parquet) files in a directory; replay = batch
read; subscribe = readStream on the same directory. Exactly-once replay
comes from file-source checkpointing instead of the reference's manual
offset handling.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class Journal:
    """An append-only journal directory of JSON-lines batch files.

    ``append`` writes a new file per batch (atomic rename so a concurrent
    streaming reader never sees partial files) — the Spark analog of the
    reference's `(write h expr)` appends to an open file handle.
    """

    def __init__(self, path: str, schema: T.StructType | str):
        self.path = path
        self.schema = schema
        os.makedirs(path, exist_ok=True)

    def append(self, rows: list[dict]) -> str:
        name = f"{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.json"
        tmp = os.path.join(self.path, f".tmp-{name}")
        final = os.path.join(self.path, name)
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, final)
        return final

    def append_df(self, df: DataFrame) -> None:
        """Journal a DataFrame (distributed write, one file per partition)."""
        df.write.mode("append").json(self.path)


def replay_journal(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """Batch replay: the reference's `(read h)` loop over journaled
    expressions (examples/journal.rfl) — here one declarative read."""
    return spark.read.schema(schema).json(path)


def read_journal_stream(spark: SparkSession, path: str, schema: T.StructType | str,
                        max_files_per_trigger: int | None = None) -> DataFrame:
    """Subscribe to the journal as a stream; downstream transformations +
    writeStream replace the reference's timer/event-loop consumers.
    ``max_files_per_trigger`` bounds each micro-batch to that many
    journal files (throughput/latency knob; also what the STREAMCHECK
    crash-recovery leg uses to guarantee a kill lands mid-stream)."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.json(path)
