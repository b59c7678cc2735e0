"""PySpark counterpart of the reference's examples/upsert.rfl.

Rayfall:
    (set t (table [ID Name Value] ...))
    (set t (upsert t 1 (list 4 'David 40.0)))      ; new key appends
    (set t (upsert t 1 (list 2 'Bobby 25.0)))      ; existing key replaces

Run: python examples/upsert.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rayforce_spark import upsert
from rayforce_spark.session import Session, get_spark


def main():
    spark = get_spark("example_upsert")
    ses = Session(spark)
    ses.set("t", spark.createDataFrame(
        [(1, "Alice", 10.0), (2, "Bob", 20.0), (3, "Charlie", 30.0)],
        "ID long, Name string, Value double",
    ))

    def up(rows):
        # first 1 column is the key, like (upsert t 1 ...)
        fresh = spark.createDataFrame(rows, "ID long, Name string, Value double")
        ses.set("t", upsert(ses.get("t"), fresh, 1))

    up([(4, "David", 40.0)])            # new record appends
    up([(2, "Bobby", 25.0)])            # existing key replaced
    up([(5, "Eve", 50.0), (6, "Frank", 60.0)])  # multi-record
    ses.get("t").orderBy("ID").show()
    spark.stop()


if __name__ == "__main__":
    main()
