"""Join verb tests vs DuckDB oracle — asof/window join semantics are the
differentiating operators (SURVEY §7 step 4), so they get the most cases."""

from pyspark.sql import functions as F

from rayforce_spark import A, K, asof_join, inner_join, insert, left_join, upsert, window_join

from tests.conftest import assert_matches_duckdb

NS_5MIN = 300_000_000_000


def test_inner_join(tables, duck):
    out = inner_join(
        tables["orders"],
        tables["customer"].withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey",
    ).select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
    assert_matches_duckdb(
        out, duck,
        """SELECT o_orderkey, o_custkey, c_name, o_totalprice
           FROM orders JOIN customer ON o_custkey = c_custkey""",
    )


def test_left_join_unique_key(tables, duck):
    out = left_join(
        tables["nation"],
        tables["region"].withColumnRenamed("r_regionkey", "n_regionkey"),
        "n_regionkey",
    )
    assert_matches_duckdb(
        out, duck,
        """SELECT n_regionkey, n_nationkey, n_name, r_name
           FROM nation LEFT JOIN region ON n_regionkey = r_regionkey""",
    )


def test_left_join_dedup_first_wins(tables, duck):
    """Reference left-join de-duplicates the right side by key keeping
    the FIRST row per key (ref core/index.c:2886, live-pinned r8 — the
    hash index probe returns the first build row; r9 flipped the batch
    default to match). 'first' defined by l_linenumber here; keep="last"
    stays available as the upsert rule."""
    right = tables["lineitem"].select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_quantity"
    )
    out = left_join(
        tables["orders"].select("o_orderkey", "o_totalprice"),
        right,
        "o_orderkey",
        order_col=F.struct("l_linenumber", "l_quantity"),
    )
    assert_matches_duckdb(
        out, duck,
        """SELECT o_orderkey, o_totalprice, l_linenumber, l_quantity
           FROM orders LEFT JOIN (
             SELECT * FROM (
               SELECT l_orderkey, l_linenumber, l_quantity,
                      row_number() OVER (PARTITION BY l_orderkey
                                         ORDER BY l_linenumber ASC,
                                                  l_quantity ASC) AS rn
               FROM lineitem) WHERE rn = 1)
           ON o_orderkey = l_orderkey""",
    )
    last = left_join(
        tables["orders"].select("o_orderkey", "o_totalprice"),
        right,
        "o_orderkey",
        order_col=F.struct("l_linenumber", "l_quantity"),
        keep="last",
    )
    assert_matches_duckdb(
        last, duck,
        """SELECT o_orderkey, o_totalprice, l_linenumber, l_quantity
           FROM orders LEFT JOIN (
             SELECT * FROM (
               SELECT l_orderkey, l_linenumber, l_quantity,
                      row_number() OVER (PARTITION BY l_orderkey
                                         ORDER BY l_linenumber DESC,
                                                  l_quantity DESC) AS rn
               FROM lineitem) WHERE rn = 1)
           ON o_orderkey = l_orderkey""",
    )


def _clicks_purchases(tables):
    ev = tables["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    return purchases, clicks


def test_asof_join(tables, duck):
    purchases, clicks = _clicks_purchases(tables)
    out = asof_join(purchases, clicks, on="user_id", asof="ts").select(
        "event_id",
        "user_id",
        K.ns_to_us("ts").alias("ts_us"),
        "value",
        "click_value",
    )
    assert_matches_duckdb(
        out, duck,
        """
        SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.value,
               r.click_value
        FROM (SELECT event_id, user_id, ts, value FROM events
              WHERE event_type = 'purchase') l
        ASOF LEFT JOIN (SELECT user_id, ts, value AS click_value FROM events
                        WHERE event_type = 'click') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
    )


def test_asof_join_strict(tables, duck):
    purchases, clicks = _clicks_purchases(tables)
    out = asof_join(
        purchases, clicks, on="user_id", asof="ts", strict=True
    ).select("event_id", "click_value")
    assert_matches_duckdb(
        out, duck,
        """
        SELECT l.event_id, r.click_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') l
        ASOF LEFT JOIN (SELECT user_id, ts, value AS click_value FROM events
                        WHERE event_type = 'click') r
          ON l.user_id = r.user_id AND l.ts > r.ts
        """,
    )


def test_asof_join_duplicate_timestamps(spark, duck):
    """Duplicate right timestamps: LAST right row in table order wins
    (ref core/index.c:3194 binary-search upper bound)."""
    left = spark.createDataFrame(
        [("A", 10), ("A", 5), ("B", 10)], "sym string, t long"
    )
    right = spark.createDataFrame(
        [("A", 5, 1.0), ("A", 5, 2.0), ("A", 7, 3.0), ("B", 11, 4.0)],
        "sym string, t long, px double",
    )
    out = asof_join(left, right, on="sym", asof="t")
    rows = {(r.sym, r.t): r.px for r in out.collect()}
    assert rows == {("A", 10): 3.0, ("A", 5): 2.0, ("B", 10): None}


def test_window_join(tables, duck):
    purchases, clicks = _clicks_purchases(tables)
    out = window_join(
        purchases,
        clicks,
        on="user_id",
        time_col="ts",
        lo=F.col("ts") - NS_5MIN,
        hi=F.col("ts") + NS_5MIN,
        aggs={
            "min_click": A.min_("click_value"),
            "max_click": A.max_("click_value"),
            "n_click": A.count("click_value"),
        },
    ).select(
        "event_id",
        "user_id",
        K.ns_to_us("ts").alias("ts_us"),
        "min_click",
        "max_click",
        "n_click",
    )
    assert_matches_duckdb(
        out, duck,
        f"""
        SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
               min(r.value) AS min_click, max(r.value) AS max_click,
               count(r.value) AS n_click
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') l
        LEFT JOIN (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'click') r
          ON l.user_id = r.user_id
         AND epoch_ns(r.ts) BETWEEN epoch_ns(l.ts) - {NS_5MIN}
                                AND epoch_ns(l.ts) + {NS_5MIN}
        GROUP BY 1, 2, 3
        """,
    )


def test_window_join_open_bounds(spark):
    left = spark.createDataFrame([("A", 10)], "sym string, t long")
    right = spark.createDataFrame(
        [("A", 5, 1.0), ("A", 10, 2.0), ("A", 15, 3.0), ("A", 12, 4.0)],
        "sym string, t long, px double",
    )
    closed = window_join(
        left, right, on="sym", time_col="t",
        lo=F.col("t") - 5, hi=F.col("t") + 5,
        aggs={"n": A.count("px"), "mx": A.max_("px")},
    ).collect()[0]
    assert (closed.n, closed.mx) == (4, 4.0)
    open_ = window_join(
        left, right, on="sym", time_col="t",
        lo=F.col("t") - 5, hi=F.col("t") + 5,
        aggs={"n": A.count("px"), "mx": A.max_("px")}, closed=False,
    ).collect()[0]
    assert (open_.n, open_.mx) == (2, 4.0)


def test_insert(tables, duck):
    a = tables["orders"].filter(F.col("o_orderstatus") == "O")
    b = tables["orders"].filter(F.col("o_orderstatus") == "F")
    out = insert(a, b).select("o_orderkey")
    assert_matches_duckdb(
        out, duck,
        """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
           UNION ALL
           SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'""",
    )


def test_upsert(tables, duck):
    target = tables["customer"]
    rows = (
        tables["customer"]
        .filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_acctbal", F.lit(0.0))
    )
    out = upsert(target, rows, n_keys=1).select("c_custkey", "c_acctbal")
    assert_matches_duckdb(
        out, duck,
        """
        SELECT c_custkey, CASE WHEN c_custkey % 10 = 0 THEN 0.0
                               ELSE c_acctbal END AS c_acctbal
        FROM customer
        """,
    )


def test_upsert_appends_new_keys(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    rows = spark.createDataFrame(
        [(2, "B1"), (2, "B2"), (3, "c")], "k long, v string"
    )
    out = {r.k: r.v for r in upsert(target, rows, n_keys=1, order_col=F.col("v")).collect()}
    assert out == {1: "a", 2: "B2", 3: "c"}


def test_upsert_in_place_first_occurrence(spark):
    # live-pinned reference semantics (ref_diff_tables r7): matched keys
    # update their FIRST target occurrence IN PLACE (row position kept,
    # later dup-key rows untouched); new keys append in input order
    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (1, 30.0), (3, 40.0)], "k long, v double")
    rows = spark.createDataFrame(
        [(1, 99.0), (5, 1.0), (4, 2.0)], "k long, v double")
    got = [(r.k, r.v) for r in upsert(target, rows, n_keys=1).collect()]
    assert got == [(1, 99.0), (2, 20.0), (1, 30.0), (3, 40.0),
                   (5, 1.0), (4, 2.0)]
    # duplicate NEW keys append every occurrence in input order (the
    # batch matches the ORIGINAL index — live-probed, r7 review):
    # (upsert t 1 [5 4 5]) with 4,5 absent -> three appended rows
    straddle = spark.createDataFrame(
        [(5, 1.0), (4, 2.0), (5, 3.0)], "k long, v double")
    got2 = [(r.k, r.v) for r in upsert(target, straddle, n_keys=1).collect()]
    assert got2 == [(1, 10.0), (2, 20.0), (1, 30.0), (3, 40.0),
                    (5, 1.0), (4, 2.0), (5, 3.0)]


def test_salted_join_matches_plain(tables):
    from rayforce_spark import salted_join

    li = tables["lineitem"]
    orders = tables["orders"]
    for how in ("inner", "left"):
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey, how) \
            .select("l_orderkey", "l_linenumber", "o_totalprice")
        salted = salted_join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            orders, "o_orderkey", how, salt=8,
        ).select(F.col("o_orderkey").alias("l_orderkey"),
                 "l_linenumber", "o_totalprice")
        a = sorted(map(tuple, plain.collect()))
        b = sorted(map(tuple, salted.collect()))
        assert a == b, f"salted {how} join differs"


def test_window_join_fixed_equivalence(tables):
    # the block prefix/suffix plan must agree with the generic pair-join
    # plan on both closed and open bounds, incl. empty-window rows
    from pyspark.sql import functions as F

    from rayforce_spark import A
    from rayforce_spark.operators.joins import window_join, window_join_fixed

    ev = tables["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("cv")
    )
    ns5 = 300_000_000_000
    aggs = {
        "mn": A.min_("cv"), "mx": A.max_("cv"), "sm": A.sum_("cv"),
        "n": A.count("cv"), "av": A.avg("cv"),
    }
    for closed in (True, False):
        generic = window_join(
            purchases, clicks, on="user_id", time_col="ts",
            lo=F.col("ts") - ns5, hi=F.col("ts") + ns5,
            aggs=aggs, closed=closed,
        )
        fixed = window_join_fixed(
            purchases, clicks, on="user_id", time_col="ts",
            lo=-ns5, hi=ns5, aggs=aggs, closed=closed,
        )
        # empty windows: sum/avg are NULL (reference wj semantics,
        # live-pinned by ref_diff_tables), count 0 — in BOTH plans
        rnd = lambda x: None if x is None else round(x, 9)  # noqa: E731
        ga = {r.event_id: (r.mn, r.mx, rnd(r.sm), r.n, rnd(r.av))
              for r in generic.collect()}
        fa = {r.event_id: (r.mn, r.mx, rnd(r.sm), r.n, rnd(r.av))
              for r in fixed.collect()}
        assert ga == fa, f"closed={closed}: {len(ga)} vs {len(fa)} rows"
