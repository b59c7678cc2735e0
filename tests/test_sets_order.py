"""Set/membership and ordering/ranking verbs (SURVEY §2.5-2.6)."""

from pyspark.sql import functions as F

from rayforce_spark import K, in_, within, except_, sect, union, xasc, xdesc, rank, xrank, bin_, binr
from rayforce_spark.operators.sets import semi, anti, find
from rayforce_spark.operators.order import top_k

from tests.conftest import assert_matches_duckdb


def test_semi_anti(tables, duck):
    cust = tables["customer"]
    orders_keys = tables["orders"].select(F.col("o_custkey").alias("c_custkey"))
    assert_matches_duckdb(
        semi(cust, orders_keys, "c_custkey").select("c_custkey"), duck,
        "SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",
    )
    assert_matches_duckdb(
        anti(cust, orders_keys, "c_custkey").select("c_custkey"), duck,
        "SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
    )


def test_except_sect_union(tables, duck):
    a = tables["customer"].select(F.col("c_nationkey").alias("k"))
    b = tables["supplier"].select(F.col("s_nationkey").alias("k"))
    # duplicate-preserving filter semantics (ref tests/lang.c:3964:
    # (except [1 1 2 2 3] [1 3]) = [2 2]) — NOT SQL EXCEPT/INTERSECT
    assert_matches_duckdb(
        except_(a, b), duck,
        "SELECT c_nationkey AS k FROM customer WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier)",
    )
    assert_matches_duckdb(
        sect(a, b), duck,
        "SELECT c_nationkey AS k FROM customer WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)",
    )
    assert_matches_duckdb(
        union(a, b), duck,
        "SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier",
    )


def test_in_within(tables, duck):
    out = tables["events"].filter(
        in_("event_type", ["click", "view"]) & within("value", 10.0, 50.0)
    ).select("event_id")
    assert_matches_duckdb(
        out, duck,
        """SELECT event_id FROM events
           WHERE event_type IN ('click','view') AND value BETWEEN 10.0 AND 50.0""",
    )


def test_find_positional(spark):
    hay = spark.createDataFrame([("a",), ("b",), ("c",), ("b",)], "v string")
    needles = spark.createDataFrame([("b",), ("z",)], "v string")
    got = {r.v: r.idx for r in find(hay, needles, "v").collect()}
    assert got == {"b": 1, "z": None}


def test_xasc_xdesc(tables):
    df = tables["nation"]
    asc_keys = [r.n_nationkey for r in xasc(df, "n_nationkey").collect()]
    assert asc_keys == sorted(asc_keys)
    desc_keys = [r.n_nationkey for r in xdesc(df, "n_nationkey").collect()]
    assert desc_keys == sorted(desc_keys, reverse=True)


def test_rank_xrank(tables, duck):
    out = rank(
        tables["customer"], ["c_acctbal", "c_custkey"], by=["c_mktsegment"]
    ).select("c_custkey", "rank")
    assert_matches_duckdb(
        out, duck,
        """SELECT c_custkey,
                  row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal, c_custkey) - 1 AS rank
           FROM customer""",
    )
    out2 = xrank(
        tables["customer"], 4, ["c_acctbal", "c_custkey"]
    ).select("c_custkey", "bucket")
    # reference xrank: bucket = rank*n div len (ref core/order.c:589-596),
    # NOT ntile — group sizes interleave instead of front-loading
    assert_matches_duckdb(
        out2, duck,
        """SELECT c_custkey,
                  (row_number() OVER (ORDER BY c_acctbal, c_custkey) - 1) * 4
                      // count(*) OVER () AS bucket
           FROM customer""",
    )


def test_xrank_interleaves_bucket_sizes(spark):
    # len=10, n=4: reference formula gives sizes 3,2,3,2 (ntile gives
    # 3,3,2,2) — pin the divergence explicitly
    df = spark.createDataFrame([(i,) for i in range(10)], "v long")
    out = xrank(df, 4, ["v"]).groupBy("bucket").count().collect()
    sizes = {r["bucket"]: r["count"] for r in out}
    assert sizes == {0: 3, 1: 2, 2: 3, 3: 2}


def test_top_k_per_group(tables, duck):
    out = top_k(
        tables["orders"], ["o_totalprice", "o_orderkey"], 3,
        by=["o_orderstatus"],
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    assert_matches_duckdb(
        out, duck,
        """SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
             SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
             FROM orders) WHERE rn <= 3""",
    )


def test_bin_binr(spark):
    df = spark.createDataFrame([(-5,), (0,), (3,), (10,), (25,)], "x long")
    got = df.select(
        "x",
        bin_([0, 5, 10, 20], "x").alias("b"),
        binr([0, 5, 10, 20], "x").alias("br"),
    ).collect()
    by_x = {r.x: (r.b, r.br) for r in got}
    # bin: index of last boundary <= x (-1 below); binr: first >= x (len above)
    assert by_x == {-5: (-1, 0), 0: (0, 0), 3: (0, 1), 10: (2, 2), 25: (3, 4)}


def test_like_glob(tables, duck):
    out = tables["part"].filter(K.like("p_name", "*widget*")).select("p_partkey")
    assert_matches_duckdb(
        out, duck, "SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'"
    )
    out2 = tables["part"].filter(K.like("p_name", "[cs]*")).select("p_partkey")
    assert_matches_duckdb(
        out2, duck,
        "SELECT p_partkey FROM part WHERE regexp_matches(p_name, '^[cs].*$')",
    )
    out3 = tables["part"].filter(K.like("p_brand", "Brand#1?")).select("p_partkey", "p_brand")
    assert_matches_duckdb(
        out3, duck,
        "SELECT p_partkey, p_brand FROM part WHERE regexp_matches(p_brand, '^Brand#1.$')",
    )


def test_in_null_sentinel_semantics(spark):
    # kdb nulls are sentinel values: (in 0N [0N 1]) is true; and a miss
    # against a null-containing set is false, never SQL NULL
    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "v long"
    ).withColumn("arr", F.array(F.lit(1), F.lit(None).cast("long")))
    rows = df.select(
        "v",
        in_("v", [1, None]).alias("lit_in"),
        in_("v", F.col("arr")).alias("arr_in"),
    ).collect()
    got = {r["v"]: (r["lit_in"], r["arr_in"]) for r in rows}
    assert got[1] == (True, True)
    assert got[2] == (False, False)     # miss vs null-set: false, not NULL
    assert got[None] == (True, True)    # null probe matches null member


def test_except_sect_keep_duplicates(spark):
    # (except [1 1 2 2 3] [1 3]) = [2 2] (ref tests/lang.c:3964);
    # sect likewise filters, keeping left duplicates
    a = spark.createDataFrame([(1,), (1,), (2,), (2,), (3,)], "v long")
    b = spark.createDataFrame([(1,), (3,)], "v long")
    assert sorted(r.v for r in except_(a, b).collect()) == [2, 2]
    assert sorted(r.v for r in sect(a, b).collect()) == [1, 1, 3]
