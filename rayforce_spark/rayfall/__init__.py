"""Rayfall front-end: parse + eval the reference's query strings onto the
Spark verbs (ref core/parse.c, core/eval.c:934-1005; SURVEY §2.9, §7).

>>> from rayforce_spark.rayfall import eval_str
>>> df = eval_str('''
...   (set t (table [id v] (list [1 2 3] [10 20 30])))
...   (select {total: (sum v) from: t by: id})
... ''')
"""

from rayforce_spark.rayfall.evalr import Interp, RayfallError, eval_str
from rayforce_spark.rayfall.reader import parse

__all__ = ["Interp", "RayfallError", "eval_str", "parse"]
