"""Property-based check: grouped select aggregates (with nulls) vs DuckDB
on random inputs — pins the kdb null-skipping aggregate semantics
(SURVEY §1.2, ref core/ops.h:141-152) beyond the fixed testdata.

One Spark round-trip per example is slow, so a handful of moderately
sized random tables rather than many tiny hypothesis examples."""

import math
import random

import duckdb
import pytest

from rayforce_spark import A, select


def gen_rows(seed, n=120):
    rng = random.Random(seed)
    keys = ["a", "b", "c", None]
    rows = []
    for i in range(n):
        k = rng.choice(keys)
        v = None if rng.random() < 0.15 else round(rng.uniform(-50, 50), 3)
        w = rng.randint(-5, 5)
        rows.append((k, v, w))
    return rows


def test_grouped_aggs_match_duckdb(spark):
    for seed in range(5):
        rows = gen_rows(seed)
        df = spark.createDataFrame(rows, "k string, v double, w long")
        got = {
            r["k"]: (r["s"], r["avg"], r["mn"], r["mx"], r["md"],
                     r["n"], r["nv"])
            for r in select(
                df,
                {
                    "s": A.sum_("v"),
                    "avg": A.avg("v"),
                    "mn": A.min_("v"),
                    "mx": A.max_("v"),
                    "md": A.med("v"),
                    "n": A.count(),
                    "nv": A.count("v"),
                },
                by="k",
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (k VARCHAR, v DOUBLE, w BIGINT)"
        )
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
        want = {
            r[0]: tuple(r[1:])
            for r in con.execute(
                """SELECT k, coalesce(sum(v), 0), avg(v), min(v), max(v), median(v),
                          count(*), count(v)
                   FROM t GROUP BY k"""
            ).fetchall()
        }
        con.close()
        assert set(got) == set(want), (seed, set(got), set(want))
        for k in got:
            for g, w_ in zip(got[k], want[k]):
                if g is None or w_ is None:
                    assert g == w_, (seed, k, got[k], want[k])
                elif isinstance(g, float):
                    assert g == pytest.approx(w_, rel=1e-9, abs=1e-9), (
                        seed, k, got[k], want[k])
                else:
                    assert g == w_, (seed, k, got[k], want[k])
