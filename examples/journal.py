"""PySpark counterpart of the reference's examples/journal.rfl.

Rayfall:
    (set h (hopen "/tmp/jou.log"))
    (write h (list 'f 1 2)) ...     ; journal expressions
    (read h)                        ; replay

Here the journal is an append-only directory of JSON batches; replay is
a batch read, and the same directory doubles as a streaming source
(readStream) — the reference's event-loop consumer.

Run: python examples/journal.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rayforce_spark.session import get_spark
from rayforce_spark.streaming import Journal, replay_journal


def main():
    spark = get_spark("example_journal")
    path = tempfile.mkdtemp(prefix="jou")
    schema = "x long, y long"
    j = Journal(path, schema)
    j.append([{"x": 1, "y": 2}])
    j.append([{"x": 2, "y": 3}])
    j.append([{"x": 3, "y": 4}])

    # replay: (read h) — apply f to each journaled record
    replay_journal(spark, path, schema).select(
        (F.col("x") + F.col("y")).alias("res")
    ).show()
    spark.stop()


if __name__ == "__main__":
    main()
