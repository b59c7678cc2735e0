"""Rayfall front-end tests: reference doc examples and the reference's own
language tests run VERBATIM through rayforce_spark.rayfall.eval_str.

Sources (expected values copied from the reference, code re-expressed on
Spark): docs queries/select.md, update.md, insert.md, upsert.md, joins.md;
tests/lang.c:4289-4335 (window-join family).
"""

import datetime as dt

import pytest

from rayforce_spark.rayfall import Interp, RayfallError, parse
from rayforce_spark.rayfall.reader import QSym, Sym, TimeMs, Vec


@pytest.fixture()
def it(spark):
    return Interp(spark)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def test_reader_literals():
    (form,) = parse("(f 1 -2 3.5 \"hi\" 'sym bare 2021.01.15 09:30:00.250)")
    head, a, b, c, d, e, f, g, h = form
    assert head == Sym("f")
    assert a == 1 and b == -2 and c == 3.5 and d == "hi"
    assert isinstance(e, QSym) and e == "sym"
    assert isinstance(f, Sym) and f == "bare"
    assert g == dt.date(2021, 1, 15)
    assert h == TimeMs(((9 * 60 + 30) * 60) * 1000 + 250)


def test_reader_vector_self_quotes():
    (form,) = parse("[name dept 1 'x]")
    assert isinstance(form, Vec)
    assert [type(x) for x in form] == [QSym, QSym, int, QSym]


def test_reader_dict_and_comments():
    (form,) = parse("(select {a: (sum x) from: t}) ;; trailing comment")
    assert form[0] == Sym("select")
    pairs = form[1]
    assert [k for k, _ in pairs] == ["a", "from"]


# ---------------------------------------------------------------------------
# select (docs queries/select.md — printed outputs copied as expectations)
# ---------------------------------------------------------------------------

EMPLOYEES = """
(set employees (table [name dept salary hire_date]
  (list
    (list "Alice" "Bob" "Charlie" "David")
    ['IT 'HR 'IT 'IT]
    [75000 65000 85000 72000]
    [2021.01.15 2020.03.20 2019.11.30 2022.05.10])))
"""


def test_select_grouped_filtered(it):
    # docs queries/select.md:14 — avg 77333.33, headcount 3, one IT row
    it.eval_str(EMPLOYEES)
    rows = it.eval_str(
        "(select {avg_salary: (avg salary) headcount: (count name)"
        " from: employees where: (> salary 70000) by: dept})"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.dept == "IT"
    assert r.avg_salary == pytest.approx(77333.3333333)
    assert r.headcount == 3


def test_select_where_projection(it):
    # docs queries/select.md:47 — Alice, Charlie, David
    it.eval_str(EMPLOYEES)
    rows = it.eval_str(
        "(select {name: name salary: salary from: employees"
        " where: (> salary 70000)})"
    ).orderBy("salary").collect()
    assert [(r.name, r.salary) for r in rows] == [
        ("David", 72000), ("Alice", 75000), ("Charlie", 85000)]


def test_select_complex_where(it):
    # docs queries/select.md:65 — IT, 70000 <= salary <= 80000
    it.eval_str(EMPLOYEES)
    rows = it.eval_str(
        "(select {name: name salary: salary from: employees"
        " where: (and (= dept 'IT) (>= salary 70000) (<= salary 80000))})"
    ).orderBy("salary").collect()
    assert [r.name for r in rows] == ["David", "Alice"]


def test_select_flat_aggregation(it):
    # docs queries/select.md:78 — 297000 / 74250.00 / 4
    it.eval_str(EMPLOYEES)
    r = it.eval_str(
        "(select {total_salary: (sum salary) avg_salary: (avg salary)"
        " headcount: (count name) from: employees})"
    ).collect()[0]
    assert (r.total_salary, r.avg_salary, r.headcount) == (297000, 74250.0, 4)


def test_select_grouped_min_date(it):
    # docs queries/select.md:98 — IT 77333.33/3/2019.11.30, HR 65000/1/2020.03.20
    it.eval_str(EMPLOYEES)
    rows = it.eval_str(
        "(select {avg_salary: (avg salary) headcount: (count name)"
        " earliest_hire: (min hire_date) from: employees by: dept})"
    ).orderBy("dept").collect()
    hr, itd = rows
    assert (hr.dept, hr.avg_salary, hr.headcount, hr.earliest_hire) == (
        "HR", 65000.0, 1, dt.date(2020, 3, 20))
    assert (itd.dept, itd.avg_salary, itd.headcount, itd.earliest_hire) == (
        "IT", pytest.approx(77333.3333333), 3, dt.date(2019, 11, 30))


def test_select_by_dict_keys_emitted_once(it):
    # docs queries/select.md:117 — keys listed as outputs AND in by: come
    # out exactly once, leading
    it.eval_str(EMPLOYEES)
    df = it.eval_str(
        "(select {dept: dept avg_salary: (avg salary) from: employees"
        " by: {dept: dept}})"
    )
    assert df.columns == ["dept", "avg_salary"]


def test_select_at_column_conflict(it):
    # docs queries/select.md:37 — (at employees 'name) for shadowed names
    it.eval_str(EMPLOYEES)
    rows = it.eval_str(
        "(select {name: (at employees 'name) from: employees})").collect()
    assert {r.name for r in rows} == {"Alice", "Bob", "Charlie", "David"}


def test_select_take(it):
    it.eval_str(EMPLOYEES)
    assert it.eval_str("(count (select {name: name from: employees take: 2}))") == 2


# ---------------------------------------------------------------------------
# update (docs queries/update.md)
# ---------------------------------------------------------------------------


def test_update_where(it):
    # docs queries/update.md:5-24 — Alice 82500, Bob 65000, Charlie 93500
    it.eval_str("""
    (set employees (table [name dept salary]
      (list (list "Alice" "Bob" "Charlie") ['IT 'HR 'IT] [75000 65000 85000])))
    (set employees (update {salary: (* salary 1.1) from: employees
                            where: (> salary 70000)}))
    """)
    rows = it.eval_str(
        "(select {name: name salary: salary from: employees})"
    ).orderBy("name").collect()
    assert [(r.name, round(r.salary)) for r in rows] == [
        ("Alice", 82500), ("Bob", 65000), ("Charlie", 93500)]


def test_join_overwrite_and_wj_empty_window(it):
    # live-pinned vs the reference binary (scripts/ref_diff_tables.py):
    # (1) lj/ij/aj overwrite shared non-key columns with the RIGHT value
    # on matched rows, keep the left value otherwise (kdb lj/aj rule);
    # (2) wj empty windows: count 0, sum/avg/min null (ref core/aggr.c
    # Null branch) — NOT the select-path kdb 0-identity for sum.
    it.eval_str("(set a (table [g x y] (list ['aa 'bb 'cc] [1 2 3] [10 20 30])))")
    it.eval_str("(set b (table [g y z] (list ['bb 'cc 'dd] [99 98 97] [5 6 7])))")
    lj = it.eval_str("(left-join [g] a b)").collect()
    assert [(r.g, r.y, r.z) for r in lj] == [
        ("aa", 10, None), ("bb", 99, 5), ("cc", 98, 6)]
    ij = it.eval_str("(inner-join [g] a b)").collect()
    assert [(r.g, r.y, r.z) for r in ij] == [("bb", 99, 5), ("cc", 98, 6)]
    it.eval_str("(set t2 (table [g ts tm v] "
                "(list ['bb 'cc] [1 6] (as 'TIME [1 6]) [1 28])))")
    it.eval_str("(set u2 (table [g ts tm w] "
                "(list ['cc] [1] (as 'TIME [1]) [-4])))")
    aj = it.eval_str("(asof-join [g ts] t2 u2)").collect()
    assert [(r.g, r.tm, r.w) for r in aj] == [("bb", 1, None), ("cc", 1, -4)]
    wj = it.eval_str(
        "(window-join1 [g tm] (map-left + [-5 5] (at t2 'tm)) t2 u2 "
        "{m0: (count w) m1: (sum w) m2: (avg w) m3: (min w)})").collect()
    assert [(r.g, r.m0, r.m1, r.m2, r.m3) for r in wj] == [
        ("bb", 0, None, None, None), ("cc", 1, -4, -4.0, -4)]


def test_column_division_by_zero_is_null(it):
    # ref core/ops.h:169: /0 -> null for BOTH `/` (floor) and `div`
    # (true) on columns — Spark 4's default ANSI mode would throw.
    # Live-pinned by ref_diff_tables (update x: (/ b h) with h=0 rows).
    it.eval_str("(set t (table [b h] (list [-0.75 2.50 1.75] [-2 0 0])))")
    rows = it.eval_str(
        "(update {from: t x: (/ b h) y: (div b h)})").collect()
    assert [r.x for r in rows] == [0.0, None, None]
    assert rows[0].y == 0.375 and rows[1].y is None and rows[2].y is None


def test_update_grouped_aggregate_broadcast(it):
    it.eval_str("""
    (set t (table [name dept salary]
      (list (list "A" "B" "C" "D") ['IT 'HR 'IT 'HR] [100 200 300 400])))
    (set t (update {mx: (max salary) from: t by: dept}))
    """)
    rows = it.eval_str("(select {name: name mx: mx from: t})").orderBy("name").collect()
    assert [(r.name, r.mx) for r in rows] == [("A", 300), ("B", 400), ("C", 300), ("D", 400)]


# ---------------------------------------------------------------------------
# insert / upsert (docs queries/insert.md, upsert.md)
# ---------------------------------------------------------------------------


def test_insert_single_and_multi(it):
    it.eval_str("(set employees (table [name age] (list ['Alice 'Bob] [25 30])))")
    it.eval_str("(set employees (insert employees (list 'Charlie 35)))")
    rows = it.eval_str("(select {name: name age: age from: employees})").orderBy("age").collect()
    assert [(r.name, r.age) for r in rows] == [("Alice", 25), ("Bob", 30), ("Charlie", 35)]
    it.eval_str("(set employees (insert employees (list ['David 'Eve] [40 25])))")
    assert it.eval_str("(count employees)") == 5


def test_insert_dict_payload(it):
    it.eval_str("(set t (table [name age] (list ['A 'B] [1 2])))")
    it.eval_str("(set t (insert t {age: [3 4] name: ['C 'D]}))")
    assert it.eval_str("(count t)") == 4
    rows = it.eval_str("(select {name: name age: age from: t where: (> age 2)})").orderBy("age").collect()
    assert [(r.name, r.age) for r in rows] == [("C", 3), ("D", 4)]


def test_upsert(it):
    # docs queries/upsert.md:5-20
    it.eval_str("(set employees (table [id name age] (list [1 2] ['Alice 'Bob] [25 30])))")
    it.eval_str(
        "(set employees (upsert employees 1"
        " (list [2 3] ['Bob-updated 'Charlie] [30 35])))")
    rows = it.eval_str(
        "(select {id: id name: name age: age from: employees})"
    ).orderBy("id").collect()
    assert [(r.id, r.name, r.age) for r in rows] == [
        (1, "Alice", 25), (2, "Bob-updated", 30), (3, "Charlie", 35)]


# ---------------------------------------------------------------------------
# joins (docs queries/joins.md — printed outputs copied as expectations)
# ---------------------------------------------------------------------------

TRADES_ORDERS = """
(set trades (table [symbol order_id price quantity]
    (list ['AAPL 'MSFT 'GOOG] [1001 1002 1003] [150.25 300.50 125.75] [100 200 150])))
(set orders (table [order_id client_id timestamp status]
   (list [1001 1002 1004]
         ['CLIENT_A 'CLIENT_B 'CLIENT_C]
         [09:00:00 09:05:00 09:10:00]
         ['FILLED 'FILLED 'PENDING])))
"""


def test_left_join_doc(it):
    # docs queries/joins.md:37 — 1003 row null-filled
    it.eval_str(TRADES_ORDERS)
    rows = it.eval_str("(left-join [order_id] trades orders)").orderBy("order_id").collect()
    assert [(r.order_id, r.symbol, r.client_id, r.status) for r in rows] == [
        (1001, "AAPL", "CLIENT_A", "FILLED"),
        (1002, "MSFT", "CLIENT_B", "FILLED"),
        (1003, "GOOG", None, None)]


def test_inner_join_doc(it):
    # docs queries/joins.md:89 — GOOG excluded
    it.eval_str(TRADES_ORDERS)
    it.eval_str("""
    (set settlements (table [order_id settlement_date fee]
      (list [1001 1002 1004] [2024.01.15 2024.01.15 2024.01.16] [0.50 1.00 0.75])))
    """)
    rows = it.eval_str("(inner-join [order_id] trades settlements)").orderBy("order_id").collect()
    assert [(r.order_id, r.symbol, r.settlement_date, r.fee) for r in rows] == [
        (1001, "AAPL", dt.date(2024, 1, 15), 0.50),
        (1002, "MSFT", dt.date(2024, 1, 15), 1.00)]


ASOF_SETUP = """
(set n 10)
(set tsym (take (concat (take 'AAPL 99) (take 'MSFT 1)) n))
(set ttime (+ 09:00:00 (as 'TIME (/ (* (til n) 3) 10))))
(set price (+ 10 (til n)))
(set bsym (take (concat (concat (take 'AAPL 3) (take 'MSFT 2)) (take 'GOOG 1)) (* 2 n)))
(set btime (+ 09:00:00 (as 'TIME (/ (* (til (* 2 n)) 2) 10))))
(set bid (+ 8 (/ (til (* 2 n)) 2)))
(set ask (+ 12 (/ (til (* 2 n)) 2)))
(set trades (table [Sym Ts Price] (list tsym ttime price)))
(set quotes (table [Sym Ts Bid Ask] (list bsym btime bid ask)))
"""


def test_asof_join_doc(it):
    # docs queries/joins.md:112-141 — Bid/Ask per trade row, verbatim
    it.eval_str(ASOF_SETUP)
    rows = it.eval_str("(asof-join [Sym Ts] trades quotes)").orderBy("Price").collect()
    assert [(r.Price, r.Bid, r.Ask) for r in rows] == [
        (10, 9, 13), (11, 9, 13), (12, 9, 13), (13, 9, 13),
        (14, 12, 16), (15, 12, 16), (16, 12, 16),
        (17, 15, 19), (18, 15, 19), (19, 15, 19)]


# ---------------------------------------------------------------------------
# window joins (the reference's own tests: ref tests/lang.c:4289-4335)
# ---------------------------------------------------------------------------

WJ_SETUP = """
(set trades (table [Sym Time Price] (list [a a] [10:00:01.000 10:00:05.000] [100 200])))
(set quotes (table [Sym Time Bid] (list [a a a] [10:00:00.000 10:00:02.000 10:00:04.000] [99 100 101])))
(set intervals (map-left + [-2000 2000] (at trades 'Time)))
"""


def test_window_join_prevailing(it):
    # ref tests/lang.c:4289 — "[99 100]": the second window
    # [10:00:03, 10:00:07] returns the PREVAILING quote (100), the kdb wj
    # convention
    it.eval_str(WJ_SETUP)
    r = it.eval_str(
        "(at (window-join [Sym Time] intervals trades quotes"
        " {minBid: (min Bid)}) 'minBid)")
    assert sorted(r) == [99, 100]


def test_window_join1_closed(it):
    # ref tests/lang.c:4297 — "[99 101]": in-window rows only, closed bounds
    it.eval_str(WJ_SETUP)
    r = it.eval_str(
        "(at (window-join1 [Sym Time] intervals trades quotes"
        " {minBid: (min Bid)}) 'minBid)")
    assert sorted(r) == [99, 101]


def test_window_join_raw_column_collects(it):
    # ref tests/lang.c:4305,4313 — raw column agg is a per-window collect
    it.eval_str(WJ_SETUP)
    assert it.eval_str(
        "(count (at (window-join [Sym Time] intervals trades quotes"
        " {bids: Bid}) 'bids))") == 2
    assert it.eval_str(
        "(count (at (window-join1 [Sym Time] intervals trades quotes"
        " {bids: Bid}) 'bids))") == 2


def test_window_join_enum_symbols(it):
    # ref tests/lang.c:4321 — "[99 100 149]" (enum interning is a no-op
    # on Spark: parquet dictionary encoding, COVERAGE.md §2.7)
    it.eval_str("""
    (set sym ['a 'b])
    (set trades (table [s time price]
      (list (enum 'sym ['a 'a 'b]) [10:00:01.000 10:00:05.000 10:00:03.000] [100 200 150])))
    (set quotes (table [s time bid]
      (list (enum 'sym ['a 'a 'a 'b 'b])
            [10:00:00.000 10:00:02.000 10:00:04.000 10:00:01.000 10:00:04.000]
            [99 100 101 149 151])))
    (set intervals (map-left + [-2000 2000] (at trades 'time)))
    """)
    r = it.eval_str(
        "(at (window-join [s time] intervals trades quotes"
        " {minBid: (min bid)}) 'minBid)")
    assert sorted(r) == [99, 100, 149]


def test_window_join_offset_idiom_no_collect(it):
    # inline (map-left + [lo hi] (at left 'time)) compiles to constant
    # offsets — the dataset-scale path (no driver collect of the time col)
    it.eval_str(WJ_SETUP)
    r = it.eval_str(
        "(at (window-join [Sym Time] (map-left + [-2000 2000] (at trades 'Time))"
        " trades quotes {minBid: (min Bid)}) 'minBid)")
    assert sorted(r) == [99, 100]


def test_window_join_wj_avg_sum_count_merge(it):
    # merge rules for decomposed verbs: prevailing row folds into
    # sum/count/avg
    it.eval_str(WJ_SETUP)
    rows = it.eval_str(
        "(window-join [Sym Time] intervals trades quotes"
        " {s: (sum Bid) c: (count Bid) a: (avg Bid)})"
    ).orderBy("Price").collect()
    # window 1 [-1s, +3s]: in-window (lo,hi] = {99,100}, no prevailing
    # window 2 [+3s, +7s]: in-window = {101}, prevailing = 100
    assert (rows[0].s, rows[0].c, rows[0].a) == (199, 2, pytest.approx(99.5))
    assert (rows[1].s, rows[1].c, rows[1].a) == (201, 2, pytest.approx(100.5))


# ---------------------------------------------------------------------------
# value-context verbs
# ---------------------------------------------------------------------------


def test_value_vector_building(it):
    assert it.eval_str("(til 5)") == [0, 1, 2, 3, 4]
    assert it.eval_str("(take 'AAPL 3)") == ["AAPL", "AAPL", "AAPL"]
    assert it.eval_str("(take [1 2] 5)") == [1, 2, 1, 2, 1]
    assert it.eval_str("(concat [1 2] [3])") == [1, 2, 3]
    assert it.eval_str("(+ 1 (til 3))") == [1, 2, 3]
    assert it.eval_str("(/ (* (til 10) 3) 10)") == [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]
    assert it.eval_str("(% (til 5) 2)") == [0, 1, 0, 1, 0]
    assert it.eval_str("(reverse (til 3))") == [2, 1, 0]
    assert it.eval_str("(distinct [1 1 2])") == [1, 2]


def test_value_time_arithmetic(it):
    v = it.eval_str("(+ 09:00:00 (as 'TIME [0 1 2]))")
    assert [int(x) for x in v] == [32400000, 32400001, 32400002]
    assert all(isinstance(x, TimeMs) for x in v)


def test_unknown_verb_raises(it):
    with pytest.raises(RayfallError):
        it.eval_str("(frobnicate 1)")
    with pytest.raises(RayfallError):
        it.eval_str("(select {x: y})")  # no from:


def test_env_scalar_as_column_literal(it):
    it.eval_str("(set factor 2)")
    it.eval_str("(set t (table [v] (list [1 2 3])))")
    rows = it.eval_str("(select {d: (* v factor) from: t})").orderBy("d").collect()
    assert [r.d for r in rows] == [2, 4, 6]


def test_eval_str_oneshot(spark):
    from rayforce_spark.rayfall import eval_str

    df = eval_str(
        "(set t (table [id v] (list [1 1 2] [10 20 30])))"
        "(select {total: (sum v) from: t by: id})",
        spark,
    )
    assert {(r.id, r.total) for r in df.collect()} == {(1, 30), (2, 30)}


# ---------------------------------------------------------------------------
# vector verbs (docs operations/order.md, iterable.md, math.md examples)
# ---------------------------------------------------------------------------


def test_rank_xrank_vectors(it):
    # docs operations/order.md "Ranking Functions" — expected outputs verbatim
    assert it.eval_str("(rank [30 10 20])") == [2, 0, 1]
    assert it.eval_str("(rank [5 3 1 4 2])") == [4, 2, 0, 3, 1]
    assert it.eval_str("(rank [150.25 300.50 125.75])") == [1, 2, 0]
    assert it.eval_str("(xrank [30 10 20 40 50 60] 3)") == [1, 0, 0, 1, 2, 2]
    assert it.eval_str("(xrank [1 2 3 4] 2)") == [0, 0, 1, 1]
    # the doc page shows [1 2 0 2 1] here, but the engine computes
    # rank*n/len (ref core/order.c:589 xrank_worker) = [0 2 0 1 1] — the
    # doc example is stale; follow the code (as operators.order.xrank does)
    assert it.eval_str("(xrank [150.25 300.50 125.75 200.00 175.50] 3)") == [0, 2, 0, 1, 1]


def test_xasc_xdesc_tables(it):
    # docs operations/order.md "Table Sorting Functions"
    it.eval_str("""
    (set trades (table [symbol price quantity]
      (list ['AAPL 'MSFT 'GOOG] [150.25 300.50 125.75] [100 200 150])))
    """)
    rows = it.eval_str("(xasc [price] trades)").collect()
    assert [r.symbol for r in rows] == ["GOOG", "AAPL", "MSFT"]
    rows = it.eval_str("(xdesc [price] trades)").collect()
    assert [r.symbol for r in rows] == ["MSFT", "AAPL", "GOOG"]


def test_set_ops_vectors(it):
    # docs operations/iterable.md "Set Operations" — verbatim
    assert it.eval_str("(except [1 2 3 4 5] [2 4])") == [1, 3, 5]
    assert it.eval_str("(except ['AAPL 'MSFT 'GOOG] ['AAPL 'GOOG])") == ["MSFT"]
    assert it.eval_str("(except [1 2 3 4 5] 3)") == [1, 2, 4, 5]
    assert it.eval_str("(union [1 2 3] [2 3 4])") == [1, 2, 3, 4]
    assert it.eval_str("(sect [1 2 3 4 5] [3 4 5 6 7])") == [3, 4, 5]
    assert it.eval_str("(sect ['AAPL 'MSFT 'GOOG] ['MSFT 'GOOG 'TSLA])") == ["MSFT", "GOOG"]


def test_membership_search_vectors(it):
    # docs operations/iterable.md "Membership and Search" — verbatim
    assert it.eval_str("(in 2 [1 2 3])") is True
    assert it.eval_str("(in 5 [1 2 3])") is False
    assert it.eval_str("(in [1 2] [1 2 3 4 5])") == [True, True]
    assert it.eval_str("(find [1 2 3 4 5] 3)") == 2
    assert it.eval_str("(find [1 2 3 4 5] 6)") is None
    assert it.eval_str("(find ['AAPL 'MSFT 'GOOG] 'MSFT)") == 1
    assert it.eval_str("(filter [1 2 3 4 5] [true false true false true])") == [1, 3, 5]
    assert it.eval_str("(within [5 15 25] [10 20])") == [False, True, False]
    assert it.eval_str("(within [1 2 3] [1 100])") == [True, True, True]


def test_vector_aggregates(it):
    assert it.eval_str("(sum [1 2 3])") == 6
    assert it.eval_str("(avg [1 2 3 4])") == 2.5
    assert it.eval_str("(min [3 1 2])") == 1
    assert it.eval_str("(max [3 1 2])") == 3
    assert it.eval_str("(med [3 1 2])") == 2.0
    assert it.eval_str("(first [7 8])") == 7
    assert it.eval_str("(last [7 8])") == 8
    assert it.eval_str("(neg [1 -2])") == [-1, 2]
    assert it.eval_str("(abs [-3 4])") == [3, 4]


# ---------------------------------------------------------------------------
# round-5 second pass: lang.c-pinned semantics and misc verbs
# ---------------------------------------------------------------------------


def test_take_forms(it):
    # docs operations/iterable.md "Take" — verbatim
    assert it.eval_str("(take [1 2 3 4 5] 3)") == [1, 2, 3]
    assert it.eval_str("(take [1 2 3 4 5] -3)") == [3, 4, 5]
    assert it.eval_str("(take [1 2 3 4 5] [1 2])") == [2, 3]
    assert it.eval_str("(take [1 2 3 4 5] [-2 2])") == [4, 5]
    assert it.eval_str("(take \"hello\" [1 3])") == "ell"
    assert it.eval_str("(take 'a' 2)") == "aa"
    # symbol scalars replicate whole (docs joins.md builds columns so)
    assert it.eval_str("(take 'AAPL 3)") == ["AAPL", "AAPL", "AAPL"]


def test_xbar_value_order(it):
    # reference arg order is (xbar x n) — ref tests/lang.c:2411-2413
    assert it.eval_str("(xbar 17 5)") == 15
    assert it.eval_str("(xbar (- (til 10) 5) 3)") == [-6, -6, -3, -3, -3, 0, 0, 0, 3, 3]
    assert it.eval_str("(xbar [10 11 12 13 14] 3)") == [9, 9, 12, 12, 12]


def test_type_names(it):
    # docs data-types/*.md: scalar lowercase, vector uppercase
    assert it.eval_str("(type true)") == "b8"
    assert it.eval_str("(type [true true])") == "B8"
    assert it.eval_str("(type 1)") == "i64"
    assert it.eval_str("(type [1 2])") == "I64"
    assert it.eval_str("(type 1.5)") == "f64"
    assert it.eval_str("(type 'sym)") == "symbol"
    assert it.eval_str("(type ['a 'b])") == "SYMBOL"
    assert it.eval_str("(type \"chars\")") == "C8"
    assert it.eval_str("(type 2025.01.02)") == "date"
    assert it.eval_str("(type 20:00:00)") == "time"
    assert it.eval_str("(type (as 'i32 1))") == "i32"
    assert it.eval_str("(type (til 3))") == "I64"


def test_date_arithmetic(it):
    import datetime as dt

    assert it.eval_str("(+ 2024.03.20 5)") == dt.date(2024, 3, 25)
    assert it.eval_str("(- 2024.03.20 5)") == dt.date(2024, 3, 15)


def test_map_fold_apply(it):
    # docs operations/iterable.md — verbatim
    assert it.eval_str("(map + 1 [1 2 3])") == [2, 3, 4]
    assert it.eval_str("(map * 2 [1 2 3])") == [2, 4, 6]
    assert it.eval_str("(fold max [150.25 300.50 125.75])") == 300.50
    assert it.eval_str("(fold + [1 2 3])") == 6
    assert it.eval_str("(apply + [1 2 3] [4 5 6])") == [5, 7, 9]


def test_eq_ne_aliases(it):
    # docs operations/logic.md — ==/!= verbatim
    assert it.eval_str("(== 1 1)") is True
    assert it.eval_str("(== [1 2 3] 1)") == [True, False, False]
    assert it.eval_str("(!= [1 2 3] [1 2 4])") == [False, False, True]
    assert it.eval_str("(== \"hello\" \"hello\")") is True


def test_in_place_mutation(it):
    # docs queries/insert.md / update.md "In-Place Modification"
    it.eval_str("(set t (table [name age] (list ['A 'B] [1 2])))")
    it.eval_str("(insert 't (list 'C 3))")
    assert it.eval_str("(count t)") == 3
    it.eval_str("(update {age: (* age 10) from: 't})")
    assert sorted(r.age for r in it.eval_str("(select {age: age from: t})").collect()) == [10, 20, 30]
    # alter: vector at-index, whole-vector, and quoted in-place forms
    assert it.eval_str("(alter [100 200 300] + 1 10)") == [100, 210, 300]
    it.eval_str("(set prices [100 200 300])")
    it.eval_str("(alter 'prices + 10)")
    assert it.eval_str("prices") == [110, 210, 310]


def test_misc_verbs(it):
    assert it.eval_str("(raze (list [1 2] [3]))") == [1, 2, 3]
    assert it.eval_str("(group ['a 'b 'a])") == {"a": [0, 2], "b": [1]}
    assert it.eval_str("(value (dict ['x 'y] [1 2]))") == [1, 2]
    assert it.eval_str("(key [7 8 9])") == [0, 1, 2]
    assert it.eval_str("(nil? (find [1 2] 5))") is True
    assert it.eval_str("(like \"spark\" \"sp*\")") is True
    assert it.eval_str("(format \"x=% y=%\" 1 2)") == "x=1 y=2"
    assert len(it.eval_str("(rand 5 10)")) == 5
    assert len(it.eval_str("(guid 3)")) == 3
    assert it.eval_str("(if (> 2 1) 'yes 'no)") == "yes"


def test_lambda_fib_recursion(it):
    # examples/fib.rfl shape: recursion through the live environment
    assert it.eval_str(
        "(set fib (fn [n] (if (< n 2) n (+ (fib (- n 1)) (fib (- n 2))))))"
        "(fib 10)") == 55


def test_lambda_map_apply_fold(it):
    # examples/table.rfl idiom + docs data-types/functions.md
    assert it.eval_str("(map (fn [x] (as 'C8 x)) (til 3))") == ["0", "1", "2"]
    assert it.eval_str("((fn [x y] (* x y)) 6 7)") == 42
    assert it.eval_str("(apply (fn [a b] (+ a b)) [1 2] [10 20])") == [11, 22]
    assert it.eval_str("(fold (fn [a b] (+ a b)) [1 2 3 4])") == 10
    assert it.eval_str("(pmap (fn [x] (* x x)) (til 4))") == [0, 1, 4, 9]


def test_try_raise(it):
    # docs data-types/functions.md error handling — handler receives the
    # raised value; locals don't leak
    assert it.eval_str('(try (raise "boom") (fn [e] 0))') == 0
    assert it.eval_str("(try (+ 1 2) (fn [e] 0))") == 3
    it.eval_str("(set g (fn [x] (* x 2))) (g 5)")
    with pytest.raises(RayfallError):
        it.eval_str("x")  # the lambda's param did not leak


def test_journal_rfl_verbatim(it, tmp_path, capsys):
    # examples/journal.rfl — write an expression journal, replay it
    it.env["jpath"] = str(tmp_path / "jou.log")
    it.eval_str("""
    (set f (fn [x y] (println "RES: %" (+ x y))))
    (set h (hopen jpath))
    (write h (list 'f 1 2))
    (write h (list 'f 2 3))
    (write h (list 'f 3 4))
    (hclose h)
    (set h (hopen jpath))
    (read h)
    (hclose h)
    (exit 0)
    """)
    assert capsys.readouterr().out.splitlines() == ["RES: 3", "RES: 5", "RES: 7"]
    # the journal holds replayable call forms
    assert open(it.env["jpath"]).read().splitlines() == [
        "(f 1 2)", "(f 2 3)", "(f 3 4)"]


def test_format_placeholders(it):
    assert it.eval_str('(format "x=% y=%" 1 2)') == "x=1 y=2"
    assert it.eval_str('(format "no args %")') == "no args %"


def test_write_read_csv_roundtrip(it, tmp_path):
    # docs data-types/table.md:87-99 — (write-csv path t [sep]) takes the
    # PATH first (regression: the evaluator had the args swapped), and
    # (read-csv types path [sep]) round-trips the table
    it.eval_str(
        '(set t (table [id sym val]'
        ' (list [1 2 3] ["a" "b" "c"] [1.5 2.5 3.5])))'
    )
    p = str(tmp_path / "t.csv")
    it.eval_str(f'(write-csv "{p}" t)')
    rows = it.eval_str(f'(read-csv [I64 STRING F64] "{p}")') \
             .orderBy("id").collect()
    assert [(r.id, r.sym, r.val) for r in rows] == [
        (1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)]
    # custom separator variant
    p2 = str(tmp_path / "t2.csv")
    it.eval_str(f'(write-csv "{p2}" t ";")')
    rows2 = it.eval_str(f'(read-csv [I64 STRING F64] "{p2}" ";")') \
              .orderBy("id").collect()
    assert [(r.id, r.sym, r.val) for r in rows2] == [
        (1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)]


def test_mixed_numeric_vector_literal_promotes_to_f64(spark):
    """[0 1 2.0] is an all-float vector in the reference's reader (the
    r7 fix that closed the last lang.c holdout — tests/lang.c
    test_lang_query's [0 1 2 3 4 5 6.0] Price column)."""
    from rayforce_spark.rayfall import eval_str

    v = eval_str("[0 1 2.5]", spark)
    assert v == [0.0, 1.0, 2.5]
    assert all(type(x) is float for x in v)
    # no promotion without a float, for bools, or for non-numeric mixes
    assert [type(x) for x in eval_str("[0 1 2]", spark)] == [int] * 3
    assert eval_str("[true false]", spark) == [True, False]
    mixed = eval_str('[1 "a"]', spark)
    assert mixed[0] == 1 and type(mixed[0]) is int


# -- live-probed reference semantics (scripts/ref_diff.py, r7) --------------
# pinned here so they hold without the built binary present


def test_distinct_union_numeric_sorted():
    v = Interp(None)
    # (distinct [3 1 2 1]) -> [1 2 3]: numeric distinct SORTS (matches
    # lang.c's u8 fixture [0x10 0x12]; live-probed for i64/bool/date)
    assert v.eval_str("(distinct [3 1 2 1])") == [1, 2, 3]
    assert v.eval_str("(distinct [false true false])") == [False, True]
    assert v.eval_str("(union [3 1] [2 1])") == [1, 2, 3]
    # symbols keep appearance order (intern-id order == appearance)
    assert [str(s) for s in v.eval_str("(distinct ['b 'a 'c 'b])")] == [
        "b", "a", "c"]
    assert [str(s) for s in v.eval_str("(union ['a 'b] ['b 'c])")] == [
        "a", "b", "c"]


def test_sect_preserves_left_duplicates():
    v = Interp(None)
    assert v.eval_str("(sect [5 10 -1 3 5 2] [3 5 0 -1])") == [5, -1, 3, 5]
    assert v.eval_str("(sect [1 2 3] [4 5 6])") == []


def test_xbar_zero_width_null_and_trunc_division():
    v = Interp(None)
    # ref ops.h XBARI64: y==0 -> null; ((x<0)?(x+1-y):x)/y*y, C-trunc
    assert v.eval_str("(xbar 3 (til 7))") == [None, 3, 2, 3, 0, 0, 0]
    assert v.eval_str("(xbar 1 [3 -2 0 10])") == [0, 0, None, 0]
    assert v.eval_str("(xbar (- (til 10) 5) 3)") == [
        -6, -6, -3, -3, -3, 0, 0, 0, 3, 3]


def test_scan_seedless_running_fold():
    v = Interp(None)
    assert v.eval_str("(scan (fn [a x] (+ a x)) [1 2 3])") == [1, 3, 6]
    assert v.eval_str("(scan (fn [a x] (+ a x)) [])") == []
    # the binary's (scan max v) dispatches min/max to the vector form
    assert v.eval_str("(scan max [1 5 2 4])") == 5


def test_fold_empty_returns_empty():
    v = Interp(None)
    assert v.eval_str("(fold (fn [a x] (+ a x)) [])") == []


def test_fold_scan_right_seeded():
    # (fold-right f init xs) / (scan-right f init xs): seeded fold/scan
    # (ref core/env.c:242,245). Expected values live-probed against the
    # binary's builtin-verb path; the lambda cases use the same coherent
    # (acc, element) dispatch — the binary's lambda path misfires
    # (latches init) and is a documented divergence, not mirrored.
    v = Interp(None)
    assert v.eval_str("(fold-right (fn [a x] (- a x)) 0 [1 2 3])") == -6
    assert v.eval_str("(fold-right (fn [a x] (- a x)) 100 [1 2 3])") == 94
    assert v.eval_str("(fold-right + 0 [1 2 3])") == 6
    assert v.eval_str("(scan-right + 0 [1 2 3])") == [0, 1, 3, 6]
    assert v.eval_str("(scan-right (fn [a x] (+ a x)) 0 [])") == []
    assert v.eval_str("(fold-right (fn [a x] (+ a x)) 0 [])") == 0
    assert v.eval_str(
        "(fold-right (fn [a x] (concat (enlist x) a)) [] [1 2 3])"
    ) == [3, 2, 1]


# ---------------------------------------------------------------------------
# r7 parity fixes found by scripts/ref_diff_tables.py (live-binary pinned)
# ---------------------------------------------------------------------------


def _cols(df):
    rows = df.collect()
    return {c: [r[c] for r in rows] for c in df.columns}


@pytest.fixture()
def t4(it):
    it.eval_str("(set t (table [a b g h] (list [3 1 2 1] "
                "[4.0 5.0 6.0 7.0] ['x 'y 'x 'y] [-1 -3 2 0])))")
    return it


def test_update_by_preserves_row_order(t4):
    # the reference broadcasts the group aggregate IN PLACE; rows keep
    # their original order (live-pinned — our window rewrite used to
    # return rows clustered by group)
    out = _cols(t4.eval_str("(update {from: t x: (sum b) by: g})"))
    assert out["a"] == [3, 1, 2, 1]
    assert out["g"] == ["x", "y", "x", "y"]
    assert out["x"] == [10.0, 12.0, 10.0, 12.0]


def test_float_mod_column_context(t4):
    # (% x y) with any float operand is MODF64 (floor-mod, keeps the
    # fraction): live-pinned (% -1 2.5) = 1.5 — the column path used to
    # floor operands into the i64 verb
    out = _cols(t4.eval_str("(select {x: (% h b) from: t})"))
    assert out["x"] == [3.0, 2.0, 2.0, 0.0]
    v = Interp(None)
    assert v.eval_str("(% -1 2.5)") == 1.5
    assert v.eval_str("(% 7 -2)") == -1


def test_xbar_column_width(t4):
    # (xbar x n): BOTH operands vectorize; n==0 -> null (live-pinned
    # (xbar 3 h) with h=[-1 -3 2 0] -> [3 3 2 null])
    out = _cols(t4.eval_str("(update {from: t b: (xbar 3 h)})"))
    assert out["b"] == [3, 3, 2, None]


def test_xasc_table_first_and_keys_first(t4):
    # live reference signature is (xasc TABLE 'key); the docs' keys-first
    # vector form is kept for back-compat with our earlier API
    ref = t4.eval_str("(xasc t 'b)")
    legacy = t4.eval_str("(xasc [b] t)")
    assert _cols(ref)["b"] == [4.0, 5.0, 6.0, 7.0]
    assert _cols(ref) == _cols(legacy)
    desc = _cols(t4.eval_str("(xdesc t 'b)"))
    assert desc["b"] == [7.0, 6.0, 5.0, 4.0]
    assert desc["a"] == [1, 2, 1, 3]


def test_order_verbs_in_query_maps(t4):
    # whole-column semantics zipped by row position, composable —
    # live-pinned shapes from ref_diff_tables
    assert _cols(t4.eval_str("(select {r: (rank b) from: t})"))["r"] == [
        0, 1, 2, 3]
    out = _cols(t4.eval_str(
        "(select {x: (desc b) i: (idesc b) from: t})"))
    assert out["x"] == [7.0, 6.0, 5.0, 4.0]
    assert out["i"] == [3, 2, 1, 0]
    assert _cols(t4.eval_str(
        "(select {x: (+ (asc b) 1) from: t})"))["x"] == [5.0, 6.0, 7.0, 8.0]
    assert _cols(t4.eval_str(
        "(select {s: (sum (asc b)) from: t})"))["s"] == [22.0]
    # where filters BEFORE the order verbs see the vector
    assert _cols(t4.eval_str(
        "(select {x: (asc b) from: t where: (> a 1)})"))["x"] == [4.0, 6.0]
    # rank in update is row-aligned and keeps the original row order
    upd = _cols(t4.eval_str("(update {from: t r: (rank b)})"))
    assert upd["r"] == [0, 1, 2, 3] and upd["a"] == [3, 1, 2, 1]


def test_order_verbs_under_by_rejected(t4):
    with pytest.raises(RayfallError):
        t4.eval_str("(select {r: (rank b) from: t by: g})")


def test_where_only_order_verbs_filter_applies(t4):
    # order verbs appearing ONLY in where: still filter (live-pinned r8:
    # (select {x: a from: t where: (> (rank b) 1)}) -> the two rows whose
    # rank exceeds 1, in original order)
    out = _cols(t4.eval_str("(select {x: a from: t where: (> (rank b) 1)})"))
    assert out["x"] == [2, 1]
    # the map-less form keeps every original column, filtered
    out = _cols(t4.eval_str("(select {from: t where: (> (rank b) 1)})"))
    assert list(out) == ["a", "b", "g", "h"]
    assert out["a"] == [2, 1] and out["b"] == [6.0, 7.0]


def test_staged_agg_take_is_cyclic(t4):
    # take: on a staged aggregate keeps the reference's cyclic
    # positive-n rule (live-pinned r8: one agg row repeats)
    out = _cols(t4.eval_str("(select {s: (sum (asc b)) from: t take: 3})"))
    assert out["s"] == [22.0, 22.0, 22.0]


def test_order_verbs_on_strings_and_zeros(it):
    # desc/idesc compile on symbol/string columns (no numeric negation;
    # live-pinned r8: ['b 'a 'c] -> desc [c b a], idesc [2 0 1]) and
    # idesc ties keep arrival order like values.idesc
    it.eval_str('(set s (table [s] (list (list "b" "a" "c"))))')
    out = _cols(it.eval_str("(select {d: (desc s) i: (idesc s) from: s})"))
    assert out["d"] == ["c", "b", "a"]
    assert out["i"] == [2, 0, 1]
    out = _cols(it.eval_str(
        "(select {z: (idesc a) from: (table [a] (list [5 5 3 5]))})"))
    assert out["z"] == [0, 1, 3, 2]
    # f64 bit order: -0.0 sorts before 0.0 (values._ord_key parity;
    # live-pinned r8 asc [-0.0 0.0] / desc [0.0 -0.0] / idesc [0 1])
    out = _cols(it.eval_str(
        "(select {z: (asc a) w: (desc a) i: (idesc a) "
        "from: (table [a] (list [0.0 -0.0]))})"))
    assert [str(v) for v in out["z"]] == ["-0.0", "0.0"]
    assert [str(v) for v in out["w"]] == ["0.0", "-0.0"]
    assert out["i"] == [0, 1]


def test_join_right_dedup_keeps_first(it):
    # duplicate right keys: the reference's hash index keeps the FIRST
    # right row per key for BOTH join verbs (live-pinned r8:
    # (left-join [k] L R) -> y [100 None]; (inner-join [k] L R) -> one
    # row y 100) — kdb keyed-table rule, not upsert's last-write-wins
    it.eval_str("(set l (table [k x] (list [1 2] [10 20])))")
    it.eval_str("(set r (table [k y] (list [1 1] [100 200])))")
    lj = _cols(it.eval_str("(left-join [k] l r)"))
    assert lj["k"] == [1, 2] and lj["y"] == [100, None]
    ij = _cols(it.eval_str("(inner-join [k] l r)"))
    assert ij["k"] == [1] and ij["x"] == [10] and ij["y"] == [100]


def test_alter_rejects_out_of_range_index(it):
    # the reference rejects negative / out-of-range alter indices with
    # 'index (ref tests/lang.c:5236); python's wrapping negative index
    # silently hit the tail before r8 (live-fuzzed divergence)
    it.eval_str("(set v [1 2 3])")
    for bad in ("(alter 'v set -1 9)", "(alter 'v set 5 9)",
                "(alter 'v remove -1)"):
        with pytest.raises(RayfallError):
            it.eval_str(bad)
    assert it.eval_str("v") == [1, 2, 3]
    assert it.eval_str("(alter 'v set 1 9) v") == [1, 9, 3]


def test_splayed_roundtrip_preserves_row_order(it, tmp_path):
    # the reference's splay preserves row order by file position; our
    # parquet splay has no cross-file row position, so the Rayfall
    # storage verbs persist+restore an __rf_ord ordinal (live-fuzzed r8:
    # 3/3 symbol-column round-trips came back permuted before this)
    d = tmp_path / "sp"
    it.eval_str("(set t (table [a b g] (list [3 1 2] [0.5 -1.5 2.5] "
                "['x 'y 'x])))")
    it.eval_str(f'(set-splayed "{d}/" t)')
    out = _cols(it.eval_str(f'(get-splayed "{d}/")'))
    assert out["a"] == [3, 1, 2]
    assert out["b"] == [0.5, -1.5, 2.5]
    assert out["g"] == ["x", "y", "x"]
    assert "__rf_ord" not in out


def test_parted_per_partition_path_idiom(it, tmp_path):
    # the reference's per-partition write (docs data-types/table.md:76):
    # (set-parted "db/<date>/<name>/" slice) per partition, then
    # (get-parted "db/" 'name) reads the union in partition-dir order
    # with written row order inside each (live-pinned r8)
    root = tmp_path / "db"
    it.eval_str("(set t (table [a b] (list [1 2 3 4] [0.25 -1.5 3.5 2.0])))")
    it.eval_str(f'(set-parted "{root}/2024.01.01/tab/" '
                "(select {from: t take: 2}))")
    it.eval_str(f'(set-parted "{root}/2024.01.02/tab/" '
                "(select {from: t take: -2}))")
    out = _cols(it.eval_str(f"(get-parted \"{root}/\" 'tab)"))
    assert out["a"] == [1, 2, 3, 4]
    assert out["b"] == [0.25, -1.5, 3.5, 2.0]
    # the virtual partition column is directory-derived and prunable
    assert out["date"] == ["2024.01.01", "2024.01.01",
                           "2024.01.02", "2024.01.02"]
    agg = _cols(it.eval_str(
        "(select {s0: (sum a) s1: (count b) from: "
        f"(get-parted \"{root}/\" 'tab)}})"))
    assert agg["s0"] == [10] and agg["s1"] == [4]


def test_order_verbs_null_as_largest(it):
    # live-pinned r8 against the reference (null produced by left-join
    # backfill): null sorts LARGEST — (asc [null 7 8]) -> [7 8 null],
    # (desc) -> [null 8 7], (iasc) -> [1 2 0], (idesc) -> [0 2 1],
    # (rank) -> [2 0 1]. The window path previously collect_list'ed the
    # bare column, which silently DROPS nulls (misaligning every row);
    # the local path raised TypeError comparing None
    it.eval_str("(set t (table [g v] (list ['aa 'bb 'cc] [5 3 4])))")
    it.eval_str("(set u (table [g w] (list ['bb 'cc 'dd] [7 8 9])))")
    it.eval_str("(set j (left-join [g] t u))")
    out = _cols(it.eval_str(
        "(select {a: (asc w) d: (desc w) i: (iasc w) x: (idesc w)"
        " r: (rank w) from: j})"))
    assert out["a"] == [7, 8, None]
    assert out["d"] == [None, 8, 7]
    assert out["i"] == [1, 2, 0]
    assert out["x"] == [0, 2, 1]
    assert out["r"] == [2, 0, 1]
    # local vector path agrees with the window path
    assert it.eval_str("(asc (at j 'w))") == [7, 8, None]
    assert it.eval_str("(desc (at j 'w))") == [None, 8, 7]
    assert it.eval_str("(iasc (at j 'w))") == [1, 2, 0]
    assert it.eval_str("(idesc (at j 'w))") == [0, 2, 1]
    assert it.eval_str("(rank (at j 'w))") == [2, 0, 1]


def test_set_parted_plain_nested_path_still_raises(it, tmp_path):
    # a nested path whose middle segment is NOT partition-shaped must
    # keep raising, not silently write a sibling dir with a bogus
    # partition value (r8 review finding; r9: digit-leading but
    # non-date-shaped segments like "01" also raise — the heuristic
    # requires >=4 leading digits, the reference's dated idiom)
    it.eval_str("(set t (table [a] (list [1 2])))")
    with pytest.raises(RayfallError):
        it.eval_str(f'(set-parted "{tmp_path}/db/trades/" t)')
    with pytest.raises(RayfallError):
        it.eval_str(f'(set-parted "{tmp_path}/db/01/trades/" t)')
    with pytest.raises(RayfallError):
        it.eval_str(f'(set-parted "{tmp_path}/db/123/trades/" t)')
    # date-shaped segments still route to the partition write
    it.eval_str(f'(set-parted "{tmp_path}/db2/2024.01.01/trades/" t)')
    it.eval_str(f'(set-parted "{tmp_path}/db2/2024-02/trades/" t)')
    got = _cols(it.eval_str(f"(get-parted \"{tmp_path}/db2/\" 'trades)"))
    assert got["a"] == [1, 2, 1, 2]
    assert got["date"] == ["2024-02", "2024-02", "2024.01.01", "2024.01.01"]
