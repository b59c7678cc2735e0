"""Expression library for rayforce_spark.

aggregates — aggregate verbs (ref core/aggr.c, flagged FN_AGGR at
             core/env.c:135-146); returned AggExpr markers let the query
             layer route them through groupBy().agg() / Window, mirroring
             how the reference's select feeds FN_AGGR verbs the lazy
             group map (ref core/eval.c:723-728).
kdb        — scalar semantics of the reference (ref core/ops.h): Euclidean
             div/mod, div-by-zero -> null, xbar bucketing, glob like,
             within, temporal helpers.
"""

from rayforce_spark.functions import aggregates, kdb

__all__ = ["aggregates", "kdb"]
