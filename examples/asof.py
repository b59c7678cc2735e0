"""PySpark counterpart of the reference's examples/asof.rfl + wj.rfl.

Rayfall:
    (set quotes (table [Sym Ts Bid Ask] ...))
    (set trades (table [Sym Ts Qty Price] ...))
    (asof-join [Sym Ts] trades quotes)
    (window-join [Sym Ts] intervals trades quotes {a: (avg Ask)})

Run: python examples/asof.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rayforce_spark import A, asof_join, window_join
from rayforce_spark.session import get_spark


def main():
    spark = get_spark("example_asof")
    # times as ms-since-midnight (the reference's TIME type)
    quotes = spark.createDataFrame(
        [("AAPL", 35995000, 189.9, 190.1),
         ("AAPL", 36003000, 190.0, 190.2),
         ("AAPL", 36007000, 190.05, 190.25),
         ("MSFT", 36002000, 410.1, 410.3)],
        "Sym string, Ts long, Bid double, Ask double",
    )
    trades = spark.createDataFrame(
        [("AAPL", 36001000, 100, 190.05),
         ("AAPL", 36005000, 250, 190.1),
         ("MSFT", 36004000, 200, 410.25)],
        "Sym string, Ts long, Qty long, Price double",
    )

    # (asof-join [Sym Ts] trades quotes): each trade gets the latest
    # quote at-or-before its timestamp
    asof_join(trades, quotes, on="Sym", asof="Ts").show()

    # (window-join [Sym Ts] intervals trades quotes {...}): aggregate the
    # quotes within [-1s, +1s] of each trade
    window_join(
        trades, quotes, "Sym", "Ts",
        F.col("Ts") - 1000, F.col("Ts") + 1000,
        {"bid": A.min_("Bid"), "ask": A.max_("Ask"), "n": A.count("Bid")},
    ).show()
    spark.stop()


if __name__ == "__main__":
    main()
