"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every query here routes through the rayforce_spark package — this file is
the driver-facing index of SURVEY.md §2 operator coverage.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rayforce_spark import A, K, select, update
from rayforce_spark.session import load_tables


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1 shape through the engine's select verb (the reference's
    `(select {… from: lineitem where: … by: …})`, ref core/query.c:607).
    """
    t = load_tables(spark, "/root/testdata/sf0.001", ["lineitem"])
    return select(
        t["lineitem"],
        {
            "sum_qty": A.sum_("l_quantity"),
            "sum_base_price": A.sum_("l_extendedprice"),
            "sum_disc_price": A.sum_(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ),
            "avg_qty": A.avg("l_quantity"),
            "avg_price": A.avg("l_extendedprice"),
            "avg_disc": A.avg("l_discount"),
            "count_order": A.count(),
        },
        where=F.col("l_shipdate") <= "1998-09-02",
        by=["l_returnflag", "l_linestatus"],
    )


def _t(spark: SparkSession, sf_dir: str, *names: str):
    tabs = load_tables(spark, sf_dir, list(names))
    return [tabs[n] for n in names]


# ---------------------------------------------------------------------------
# queries: one entry per implemented SURVEY §2 operator
# ---------------------------------------------------------------------------

def q_groupby_sum(spark, sf):
    (li,) = _t(spark, sf, "lineitem")
    return select(li, {"sum_qty": A.sum_("l_quantity")}, by="l_returnflag")


def q_groupby_multikey(spark, sf):
    (li,) = _t(spark, sf, "lineitem")
    return select(
        li,
        {"sum_qty": A.sum_("l_quantity"), "n": A.count()},
        by=["l_returnflag", "l_linestatus"],
    )


def q_groupby_stats(spark, sf):
    (li,) = _t(spark, sf, "lineitem")
    return select(
        li,
        {
            "avg_price": A.avg("l_extendedprice"),
            "min_disc": A.min_("l_discount"),
            "max_tax": A.max_("l_tax"),
            "med_qty": A.med("l_quantity"),
            "dev_price": A.dev("l_extendedprice"),
            "n_parts": A.count_distinct("l_partkey"),
        },
        by="l_returnflag",
    )


def q_tpch_q1(spark, sf):
    (li,) = _t(spark, sf, "lineitem")
    return select(
        li,
        {
            "sum_qty": A.sum_("l_quantity"),
            "sum_disc_price": A.sum_(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ),
            "avg_qty": A.avg("l_quantity"),
            "count_order": A.count(),
        },
        where=F.col("l_shipdate") <= "1998-09-02",
        by=["l_returnflag", "l_linestatus"],
    )


def q_agg_arith(spark, sf):
    # H2O groupby Q6 shape: max - min by key
    (li,) = _t(spark, sf, "lineitem")
    return select(
        li,
        {"range_qty": A.max_("l_quantity") - A.min_("l_quantity")},
        by="l_returnflag",
    )


def q_flat_agg(spark, sf):
    (o,) = _t(spark, sf, "orders")
    return select(
        o,
        {
            "total": A.sum_("o_totalprice"),
            "n": A.count(),
            "mx": A.max_("o_totalprice"),
            "mn": A.min_("o_totalprice"),
            "md": A.med("o_totalprice"),
        },
    )


def q_project_filter(spark, sf):
    (o,) = _t(spark, sf, "orders")
    return select(
        o,
        {"k": F.col("o_orderkey"), "p2": F.col("o_totalprice") * 2},
        where=F.col("o_orderstatus") == "O",
    )


def q_xbar_bucket(spark, sf):
    (o,) = _t(spark, sf, "orders")
    return select(
        o,
        {"n": A.count(), "avg_price": A.avg("o_totalprice")},
        by={"price_bucket": K.xbar(1000, F.col("o_totalprice"))},
    )


def q_update_where(spark, sf):
    (o,) = _t(spark, sf, "orders")
    return update(
        o,
        {"o_totalprice": F.col("o_totalprice") * 1.1},
        where=F.col("o_orderstatus") == "F",
    ).select("o_orderkey", "o_totalprice")


def q_update_grouped(spark, sf):
    (li,) = _t(spark, sf, "lineitem")
    return update(li, {"grp_max": A.max_("l_quantity")}, by="l_orderkey").select(
        "l_orderkey", "l_linenumber", "grp_max"
    )


def q_distinct(spark, sf):
    (li,) = _t(spark, sf, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


def q_ediv_emod(spark, sf):
    (li,) = _t(spark, sf, "lineitem")
    x = F.col("l_orderkey") - 3000  # exercise negatives
    return li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("ln"),
        K.ediv(x, F.lit(7)).alias("d7"),
        K.emod(x, F.lit(7)).alias("m7"),
        K.ediv(x, F.lit(-7)).alias("dn7"),
        K.emod(x, F.lit(-7)).alias("mn7"),
        K.ediv(x, F.col("l_linenumber") - 1).alias("dz"),  # zero divisor rows
        K.fdiv("l_extendedprice", "l_quantity").alias("fd"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "groupby_sum": q_groupby_sum,
    "groupby_multikey": q_groupby_multikey,
    "groupby_stats": q_groupby_stats,
    "tpch_q1": q_tpch_q1,
    "agg_arith": q_agg_arith,
    "flat_agg": q_flat_agg,
    "project_filter": q_project_filter,
    "xbar_bucket": q_xbar_bucket,
    "update_where": q_update_where,
    "update_grouped": q_update_grouped,
    "distinct": q_distinct,
    "ediv_emod": q_ediv_emod,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


ORACLE: dict[str, str] = {
    "groupby_sum": (
        "SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1"
    ),
    "groupby_multikey": """
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
               count(*) AS n
        FROM lineitem GROUP BY 1, 2
    """,
    "groupby_stats": """
        SELECT l_returnflag,
               avg(l_extendedprice) AS avg_price,
               min(l_discount) AS min_disc,
               max(l_tax) AS max_tax,
               median(l_quantity) AS med_qty,
               stddev_pop(l_extendedprice) AS dev_price,
               count(DISTINCT l_partkey) AS n_parts
        FROM lineitem GROUP BY 1
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               avg(l_quantity) AS avg_qty,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1, 2
    """,
    "agg_arith": """
        SELECT l_returnflag, max(l_quantity) - min(l_quantity) AS range_qty
        FROM lineitem GROUP BY 1
    """,
    "flat_agg": """
        SELECT sum(o_totalprice) AS total, count(*) AS n,
               max(o_totalprice) AS mx, min(o_totalprice) AS mn,
               median(o_totalprice) AS md
        FROM orders
    """,
    "project_filter": (
        "SELECT o_orderkey AS k, o_totalprice * 2 AS p2 FROM orders "
        "WHERE o_orderstatus = 'O'"
    ),
    "xbar_bucket": """
        SELECT floor(o_totalprice / 1000) * 1000 AS price_bucket,
               count(*) AS n, avg(o_totalprice) AS avg_price
        FROM orders GROUP BY 1
    """,
    "update_where": """
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 1.1
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
    """,
    "update_grouped": """
        SELECT l_orderkey, l_linenumber,
               max(l_quantity) OVER (PARTITION BY l_orderkey) AS grp_max
        FROM lineitem
    """,
    "distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "ediv_emod": """
        SELECT l_orderkey AS k, l_linenumber AS ln,
               CAST(floor((l_orderkey - 3000) / 7.0) AS BIGINT) AS d7,
               CAST((l_orderkey - 3000) - 7 * floor((l_orderkey - 3000) / 7.0) AS BIGINT) AS m7,
               CAST(-floor((l_orderkey - 3000) / 7.0) AS BIGINT) AS dn7,
               CAST((l_orderkey - 3000) - 7 * floor((l_orderkey - 3000) / 7.0) AS BIGINT) AS mn7,
               CASE WHEN l_linenumber - 1 = 0 THEN NULL
                    ELSE CAST(floor((l_orderkey - 3000) / abs(l_linenumber - 1))
                              * sign(l_linenumber - 1) AS BIGINT) END AS dz,
               l_extendedprice / l_quantity AS fd
        FROM lineitem
    """,
}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
