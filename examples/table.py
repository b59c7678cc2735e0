"""PySpark counterpart of the reference's examples/table.rfl + update.rfl.

Rayfall:
    (set t (table [sym price volume] ...))
    (select {total: (sum price) from: t by: sym})
    (update {price: (* price 1.1) from: t where: (> volume 400)})

Run: python examples/table.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rayforce_spark import A, select, update
from rayforce_spark.session import get_spark


def main():
    spark = get_spark("example_table")
    t = spark.createDataFrame(
        [("aapl", 102.0, 500), ("vod", 99.0, 400), ("goog", 203.0, 900),
         ("aapl", 104.0, 200)],
        "sym string, price double, volume long",
    )

    # (select {total: (sum price) n: (count) from: t by: sym})
    select(t, {"total": A.sum_("price"), "n": A.count()}, by="sym").show()

    # (update {price: (* price 1.1) from: t where: (> volume 400)})
    update(t, {"price": F.col("price") * 1.1},
           where=F.col("volume") > 400).show()

    # grouped update: every row gets its group's max
    update(t, {"grp_max": A.max_("price")}, by="sym").show()
    spark.stop()


if __name__ == "__main__":
    main()
