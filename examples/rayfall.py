"""Run reference Rayfall programs VERBATIM through the rayfall front-end.

These snippets are copied from the reference's documentation
(docs queries/select.md, joins.md) and its examples/asof.rfl header —
the point of `rayforce_spark.rayfall` is that they execute unchanged:
the reader parses the s-expression surface (ref core/parse.c) and the
evaluator stages it onto the Spark verbs (ref core/eval.c:934-1005 ->
operators.query / operators.joins).

Run: python examples/rayfall.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rayforce_spark.rayfall import Interp
from rayforce_spark.session import get_spark


def main():
    spark = get_spark("example_rayfall")
    it = Interp(spark)

    # docs queries/select.md — the flagship select
    it.eval_str("""
    (set employees (table [name dept salary hire_date]
      (list
        (list "Alice" "Bob" "Charlie" "David")
        ['IT 'HR 'IT 'IT]
        [75000 65000 85000 72000]
        [2021.01.15 2020.03.20 2019.11.30 2022.05.10])))
    """)
    it.eval_str("""
    (select {
      avg_salary: (avg salary)
      headcount: (count name)
      from: employees
      where: (> salary 70000)
      by: dept})
    """).show()

    # examples/asof.rfl header comment — quotes/trades asof + window join
    it.eval_str("""
    (set quotes (table [Sym Ts Bid Ask]
      (list ['AAPL 'AAPL 'AAPL 'MSFT] [09:59:55 10:00:03 10:00:07 10:00:02]
            [189.9 190.0 190.05 410.1] [190.1 190.2 190.25 410.3])))
    (set trades (table [Sym Ts Qty Price]
      (list ['AAPL 'AAPL 'MSFT] [10:00:01 10:00:05 10:00:04]
            [100 250 200] [190.05 190.1 410.25])))
    """)
    it.eval_str("(asof-join [Sym Ts] trades quotes)").show()
    it.eval_str("""
    (window-join [Sym Ts] (map-left + [-5000 5000] (at trades 'Ts))
                 trades quotes {a: (avg Ask)})
    """).show()

    # docs queries/joins.md — left join with the reference's dedup semantics
    it.eval_str("""
    (set t (table [symbol order_id price] (list ['AAPL 'MSFT 'GOOG] [1001 1002 1003] [150.25 300.50 125.75])))
    (set o (table [order_id status] (list [1001 1002 1004] ['FILLED 'FILLED 'PENDING])))
    """)
    it.eval_str("(left-join [order_id] t o)").show()
    spark.stop()


if __name__ == "__main__":
    main()
