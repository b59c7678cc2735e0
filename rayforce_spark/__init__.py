"""rayforce_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of RayforceDB/rayforce.

This is NOT a port of the reference C engine: queries are declared with the
PySpark DataFrame API and optimized/executed by Catalyst + Tungsten. The
public surface mirrors the reference's query language (Rayfall) verb-for-verb
(see SURVEY.md §2 for the inventory and reference citations), re-expressed as
Python functions over DataFrames.

Layout:
    session    — SparkSession factory + name->DataFrame catalog (kdb-style
                 named-table mutation analog, ref core/env.c globals)
    functions  — expression library: aggregate markers, kdb null/arith
                 semantics (ref core/ops.h), text/vector helpers
    operators  — query verbs: select/update (ref core/query.c:607), joins
                 incl. asof/window join (ref core/join.c), sets, ordering
    sources    — csv / splayed / parted storage (ref core/io.c, core/vary.c)
    datapipe   — beyond-reference large-scale pipeline ops: dedup,
                 similarity search, text analysis, multimodal columns
    streaming  — journal replay + timers as Structured Streaming
    rayfall    — parse/eval of the reference's query strings onto the
                 verbs above (ref core/parse.c, core/eval.c:934-1005)
"""

from rayforce_spark.session import Session, get_spark

from rayforce_spark.functions import aggregates as A
from rayforce_spark.functions import kdb as K

from rayforce_spark.operators.query import select, update
from rayforce_spark.rayfall import eval_str
from rayforce_spark.operators.joins import (
    left_join,
    inner_join,
    asof_join,
    window_join,
    window_join_wj,
    insert,
    upsert,
    salted_join,
)
from rayforce_spark.operators.sets import (
    in_,
    within,
    except_,
    sect,
    union,
    find,
)
from rayforce_spark.operators.order import (
    xasc,
    xdesc,
    rank,
    xrank,
    bin_,
    binr,
)

__all__ = [
    "Session",
    "get_spark",
    "A",
    "K",
    "select",
    "update",
    "eval_str",
    "left_join",
    "inner_join",
    "asof_join",
    "window_join",
    "window_join_wj",
    "insert",
    "upsert",
    "salted_join",
    "in_",
    "within",
    "except_",
    "sect",
    "union",
    "find",
    "xasc",
    "xdesc",
    "rank",
    "xrank",
    "bin_",
    "binr",
]

__version__ = "0.1.0"
