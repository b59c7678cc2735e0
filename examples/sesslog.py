"""PySpark counterpart of the reference's examples/sesslog.rfl.

Rayfall keeps a session table mutated by (insert 'sesslog ...) callbacks
on the IPC event loop with timer sweeps. The Spark-native form: events
arrive through a journal stream, keyed state sessionizes them, closed
sessions land in the output sink.

Run: python examples/sesslog.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rayforce_spark.session import get_spark
from rayforce_spark.streaming import Journal, read_journal_stream
from rayforce_spark.streaming.stateful import sessionize


def main():
    spark = get_spark("example_sesslog")
    path = tempfile.mkdtemp(prefix="sesslog")
    schema = "user_id long, ts_sec double, value double"
    j = Journal(path, schema)
    j.append([
        {"user_id": 1, "ts_sec": 0.0, "value": 1.0},
        {"user_id": 1, "ts_sec": 10.0, "value": 2.0},
        {"user_id": 1, "ts_sec": 5000.0, "value": 7.0},  # crosses the gap
        {"user_id": 2, "ts_sec": 100.0, "value": 5.0},
    ])
    out = sessionize(
        read_journal_stream(spark, path, schema), gap_sec=1800
    )
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("sessions").start())
    import time
    deadline = time.time() + 60
    while time.time() < deadline:
        if spark.sql("SELECT * FROM sessions").count() > 0:
            break
        time.sleep(0.5)
    spark.sql("SELECT * FROM sessions").show()
    q.stop()
    spark.stop()


if __name__ == "__main__":
    main()
