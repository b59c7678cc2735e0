"""Property-based check: asof_join and window_join vs brute-force Python
reference semantics (ref core/index.c:3194, :3287) on random inputs.

One Spark round-trip per example is slow, so generate a handful of
moderately sized random tables rather than hypothesis' default many tiny
examples."""

import random

from pyspark.sql import functions as F

from rayforce_spark import A, asof_join, window_join


def brute_asof(left, right, strict=False):
    """For each (sym, t) left row: right row with greatest t' <= t
    (< if strict); among equal t' the LAST in right input order wins."""
    out = {}
    for i, (sym, t) in enumerate(left):
        best = None
        for j, (rsym, rt, px) in enumerate(right):
            if rsym != sym:
                continue
            ok = rt < t if strict else rt <= t
            if not ok:
                continue
            if best is None or rt > right[best][1] or (
                rt == right[best][1] and j > best
            ):
                best = j
        out[i] = right[best][2] if best is not None else None
    return out


def gen_case(seed):
    rng = random.Random(seed)
    syms = ["A", "B", "C"]
    left = [
        (rng.choice(syms), rng.randint(0, 30)) for _ in range(rng.randint(1, 40))
    ]
    right = [
        (rng.choice(syms), rng.randint(0, 30), float(i))
        for i in range(rng.randint(0, 60))
    ]
    return left, right


def test_asof_matches_bruteforce(spark):
    for seed in range(6):
        left, right = gen_case(seed)
        ldf = spark.createDataFrame(
            [(s, t, i) for i, (s, t) in enumerate(left)],
            "sym string, t long, lid long",
        )
        rdf = spark.createDataFrame(right, "sym string, t long, px double")
        for strict in (False, True):
            got = {
                r.lid: r.px
                for r in asof_join(
                    ldf, rdf, on="sym", asof="t", strict=strict
                ).collect()
            }
            want = brute_asof(left, right, strict)
            assert got == want, f"seed={seed} strict={strict}"


def test_window_join_matches_bruteforce(spark):
    for seed in range(4):
        left, right = gen_case(seed + 100)
        ldf = spark.createDataFrame(
            [(s, t, i) for i, (s, t) in enumerate(left)],
            "sym string, t long, lid long",
        )
        rdf = spark.createDataFrame(right, "sym string, t long, px double")
        got = {
            r.lid: (r.n, r.mx)
            for r in window_join(
                ldf, rdf, on="sym", time_col="t",
                lo=F.col("t") - 3, hi=F.col("t") + 3,
                aggs={"n": A.count("px"), "mx": A.max_("px")},
            ).collect()
        }
        for i, (sym, t) in enumerate(left):
            in_win = [px for (rs, rt, px) in right
                      if rs == sym and t - 3 <= rt <= t + 3]
            want = (len(in_win), max(in_win) if in_win else None)
            assert got[i] == want, f"seed={seed} lid={i}"
