"""Run the reference's OWN example scripts (/root/reference/examples/*.rfl)
verbatim through the Rayfall front-end.

Dataset-size knobs: scripts guarding with (if (nil? (resolve 'n)) (set n
BIG)) get a small `n` pre-bound; scripts that hardcode 1e7 rows are out of
scope here (the same shapes run at full scale in scripts/h2o_bench.py).
"""

import os

import pytest

from rayforce_spark.rayfall import Interp

REF = "/root/reference/examples"


def _run(spark, name, env=None):
    it = Interp(spark, env)
    with open(os.path.join(REF, name)) as f:
        return it, it.eval_str(f.read())


def test_insert_rfl(spark):
    it, _ = _run(spark, "insert.rfl")
    t = it.env["t"]
    rows = {r.ID: (r.Name, r.Value) for r in t.collect()}
    assert len(rows) == 20  # 3 seed + 17 inserts (incl. in-place Tom)
    assert rows[14] == ("Nancy", None)      # partial columns -> null
    assert rows[19] == ("Sam", 190.0)       # reordered table insert
    assert rows[20] == ("Tom", 200.0)       # in-place (insert 't ...)


def test_upsert_rfl(spark):
    it, _ = _run(spark, "upsert.rfl")
    t = it.env["t"]
    rows = {r.ID: (r.Name, r.Value) for r in t.collect()}
    assert len(rows) == 17
    assert rows[2] == ("Bobby2", 22.0)      # updated twice, last wins
    assert rows[3] == ("Charlie2", 35.0)    # updated via mixed batch
    assert rows[17] == ("Quinn", 170.0)     # in-place upsert


def test_iter_apply_rfl(spark, capsys):
    _run(spark, "iter.rfl")
    _run(spark, "apply.rfl")
    out = capsys.readouterr().out.splitlines()
    # map-right iterates "asd" as chars with x=1212 bound left;
    # map-left / map / apply iterate chars with y=188 broadcast
    assert "x=1212 y=a" in out and "x=1212 y=d" in out
    assert out.count("x=a y=188") == 3  # map-left, map, apply
    assert out.count("x=d y=188") == 3


def test_fib_rfl(spark):
    # fib.rfl defines fib via the `self` anonymous-recursion idiom
    it, _ = _run(spark, "fib.rfl")
    assert it.eval_str("(fib 10)") == 89  # this fib is 1-based: fib(0)=1


def test_aj_rfl_small_n(spark, capsys):
    # aj.rfl guards with (if (nil? (resolve 'n)) ...) — preset n=10 and
    # the asof result matches the joins.md worked example
    it, _ = _run(spark, "aj.rfl", env={"n": 10})
    rows = it.env["aj"].orderBy("Price").collect()
    assert [(r.Price, r.Bid, r.Ask) for r in rows][:4] == [
        (10, 9, 13), (11, 9, 13), (12, 9, 13), (13, 9, 13)]
    assert "asof 10 time:" in capsys.readouterr().out


def test_wj_rfl_small_n(spark, capsys):
    it, _ = _run(spark, "wj.rfl", env={"n": 1000})
    wj = it.env["wj"]
    assert wj.columns == ["Sym", "Ts", "Price", "bid", "ask"]
    assert wj.count() == 1000
    assert "wj 1000 time:" in capsys.readouterr().out


def test_update_rfl(spark):
    it, _ = _run(spark, "update.rfl")
    # vector alters
    assert it.env["n"][0] == 100 and it.env["n"][4] == 99 and it.env["n"][5] == 99
    # generic list alters: set idx 0&2 -> [192 "asd" 192], concat 88,
    # remove idx 1 -> [192 192 88], remove [0 2] -> [192]
    assert it.env["l"] == [192]
    # the four in-place updates: +1 volume everywhere; lambda-substituted
    # price bump then zero at volume==79; zero where volume>400
    tab = {(r.sym, r.tape): (r.price, r.volume) for r in it.env["tab"].collect()}
    assert tab[("vod", "B")] == (0, 401)
    assert tab[("goog", "C")] == (0, 901)
    assert tab[("mod", "G")] == (0, 79)
    assert tab[("aapl", "D")] == (102, 11)


def test_table_rfl_small_n(spark):
    # table.rfl guards with (if (nil? (resolve 'n)) ...) — preset n=10;
    # exercises guid, lambda map to C8, cyclic takes, TIMESTAMP cast
    it, _ = _run(spark, "table.rfl", env={"n": 10})
    t = it.env["t"]
    assert t.columns == ["OrderId", "Symbol", "Price", "Size", "Tape", "Timestamp"]
    assert t.count() == 10
    r = t.orderBy("Timestamp").collect()[0]
    assert r.Symbol == "AAPL" and r.Size == 1 and len(r.OrderId) == 36
