"""Symbol interning: the reference's SYMBOL type, Spark-first.

The reference interns every symbol string into a global table at parse
time and computes on small integer ids thereafter (ref core/symbols.c:24
sym_intern, core/ops.h:238 TYPE_SYMBOL) — group-bys, joins and shuffles
touch fixed-width ints, never string bytes. Spark has no session-global
intern table (executors are distributed), so the equivalent is a
DETERMINISTIC code: xxhash64 of the string. Encoding is a pure
projection (no dictionary build, no shuffle, no driver state); decoding
joins a broadcast (code -> label) map built once per column.

64-bit collision risk for a corpus of n distinct symbols is
~n^2 / 2^65 — 5e-9 at n = 1e5, 5e-5 at n = 1e7; ``verify=True`` on
``symbol_table`` turns silent collision into a loud error (two distinct
counts, one aggregation).

Scale notes (100 TB): encoded group-by/join keys shrink shuffle rows to
8 bytes and make the aggregate hash map fixed-width (codegen-friendly);
the decode map is value-cardinality-sized, so it broadcasts for any
realistic symbol column. Intern at ingest (write the code column into
the table) to pay the string hash once per row ever, as the reference
pays sym_intern once at CSV parse.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SYM_SUFFIX = "_sym"


def sym(col) -> F.Column:
    """Interned code of a string column (pure expression, usable anywhere
    a key is needed: groupBy, join, repartition)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def symbolize(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Replace each string column with its interned code column
    (``<name>_sym``); drops the string column. The projection is the
    entire cost — no shuffle, no state."""
    out = df
    for c in cols:
        out = out.withColumn(c + SYM_SUFFIX, sym(c)).drop(c)
    return out


def symbol_table(df: DataFrame, col: str, *, verify: bool = False) -> DataFrame:
    """The (code -> label) decode map for one column: distinct labels with
    their codes. Cardinality = distinct symbols, so cache + broadcast it.
    ``verify=True`` raises on a 64-bit collision (one extra aggregation
    over the distinct labels)."""
    t = df.select(F.col(col).alias(col), sym(col).alias(col + SYM_SUFFIX)).distinct()
    if verify:
        n = t.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(col + SYM_SUFFIX).alias("nc"),
        ).head()
        if n["n"] != n["nc"]:
            raise ValueError(
                f"symbol collision in column {col!r}: {n['n']} labels -> "
                f"{n['nc']} codes; use a wider hash or dictionary codes"
            )
    return t


def desymbolize(df: DataFrame, table: DataFrame, col: str) -> DataFrame:
    """Swap a code column back to its label using a (broadcast) symbol
    table — join on ``<col>_sym``, drop the code. Run AFTER aggregation:
    the join touches result-cardinality rows, not input rows."""
    return df.join(F.broadcast(table), col + SYM_SUFFIX).drop(col + SYM_SUFFIX)


def symbol_map(table: DataFrame, col: str) -> dict[int, str]:
    """Collect a symbol table to a driver-side {code: label} dict (the
    closest analog of the reference's in-memory symbol array, ref
    core/symbols.c:24) — for driver-side formatting or tiny static maps.

    NOT a decode fast path: baking the dict into the plan as a literal
    map (desymbolize_lit) re-analyzes a 2x|symbols| expression tree on
    every query — measured ~+110 ms/column at just 100 symbols vs
    ~+40 ms TOTAL for the broadcast-join decode over a cached symbol
    table (H2O gq2, r5). Prefer :func:`desymbolize` at any cardinality
    when the decode runs per query."""
    return {r[col + SYM_SUFFIX]: r[col] for r in table.collect()}


def desymbolize_lit(df: DataFrame, mapping: dict[int, str], col: str) -> DataFrame:
    """Swap a code column back to its label via a literal map expression —
    no join, no broadcast exchange; label lookup happens inside codegen.
    Per-query PLAN-ANALYSIS cost scales with the map size (see
    symbol_map) — use desymbolize unless the plan is built once and
    re-executed many times."""
    items = []
    for k, v in mapping.items():
        items.append(F.lit(k))
        items.append(F.lit(v))
    m = F.create_map(*items)
    return df.withColumn(col, m[F.col(col + SYM_SUFFIX)]).drop(col + SYM_SUFFIX)
