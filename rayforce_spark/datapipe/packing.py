"""Sequence packing for LM training batches, Spark-first.

Two deterministic, engine-portable packings of a document corpus into
fixed token-budget training sequences:

* :func:`pack_offsets` — GPT-style concatenate-and-chunk (Brown et al.
  2020 §2.2: documents are concatenated and the token stream is cut
  into context-length chunks; documents straddle chunk boundaries by
  design). Pure window cumsum — no Python anywhere.
* :func:`pack_greedy` — doc-boundary-respecting first-fit (the common
  SFT/packed-batch loader rule: never split a document; open a new
  pack when the next document would overflow the budget; a document
  longer than the budget gets a pack of its own). A stateful running
  scan, so it runs as one Arrow batch per shard via applyInPandas —
  and replays exactly in SQL as a recursive CTE (the oracle does).

Both shard the corpus first with the Knuth-multiplicative
``sampling.hash_bucket`` (plain bigint arithmetic — identical value in
any engine), order by the id column within each shard, and never
impose a global order: the window/scan is PER SHARD, so the plan is
one hash shuffle + partitioned sort, no single-partition exchange. At
100 TB the shard count is the lever — size shards so one shard's
token stream fits an executor (the packs themselves are independent
across shards by construction, exactly like the loader's data files).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rayforce_spark.datapipe.sampling import hash_bucket
from rayforce_spark.datapipe.text import token_count


def _guard_pack_columns(df: DataFrame, added: list[str],
                        shard_col: str | None) -> None:
    """Both packers ADD fixed output columns — silently overwriting a
    caller's column of the same name corrupts compositions (r9 review:
    pack_greedy clobbered shuffle_epoch's ``shard``). Raise instead;
    callers composing with an upstream sharding pass ``shard_col``."""
    taken = [c for c in added if c in df.columns
             and not (shard_col is not None and c == "shard")]
    if taken:
        raise ValueError(
            f"packing: input already has column(s) {taken}; rename them "
            "first, or pass shard_col=/order_col= to pack ALONG an "
            "existing sharding/order (e.g. shuffle_epoch's shard/pos)")


def pack_offsets(df: DataFrame, text_col: str, id_col: str, *,
                 budget: int, shards: int = 32, salt: int = 0,
                 tokenizer=None, shard_col: str | None = None,
                 order_col: str | None = None) -> DataFrame:
    """Concatenate-and-chunk packing offsets.

    Adds ``shard``, ``n_tok``, ``tok_start`` (exclusive token cumsum in
    ``order_col`` order within the shard — default: id order),
    ``pack_first`` = tok_start // budget and ``pack_last`` =
    (tok_start + max(n_tok-1, 0)) // budget — the first/last training
    chunk this document's tokens land in. A document with pack_first <
    pack_last straddles chunk boundaries, which is the point of this
    packing style.

    Plan: one shuffle on the shard key, one partitioned sort, one
    running-sum window — no global window (each shard is independent),
    no Python. ``tokenizer`` defaults to the whitespace
    :func:`text.token_count`; any integer Column expression works.

    Composition (r9): pass ``shard_col``/``order_col`` to pack along an
    upstream layout instead of re-hashing — e.g. shuffle_epoch's
    ``(shard, pos)`` gives a per-epoch-permuted packing. Pre-existing
    output-name collisions raise instead of silently overwriting.
    """
    _guard_pack_columns(
        df, ["shard", "n_tok", "tok_start", "pack_first", "pack_last"],
        shard_col)
    # null text tokenizes to null — coalesce to 0 so a null row neither
    # shifts the cumsum (SUM skips nulls) nor leaves its own tok_start/
    # pack_* null (ADVICE r8)
    n: Column = F.coalesce((tokenizer or token_count)(F.col(text_col)),
                           F.lit(0))
    order = order_col or id_col
    w = (Window.partitionBy("shard").orderBy(order)
         .rowsBetween(Window.unboundedPreceding, -1))
    shard_expr = (F.col(shard_col) if shard_col is not None
                  else hash_bucket(id_col, shards, salt))
    return (
        df.withColumn("shard", shard_expr)
        .withColumn("n_tok", n)
        .withColumn("tok_start",
                    F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .withColumn("pack_first",
                    F.floor(F.col("tok_start") / F.lit(budget)))
        .withColumn(
            "pack_last",
            F.floor((F.col("tok_start")
                     + F.greatest(F.col("n_tok") - 1, F.lit(0)))
                    / F.lit(budget)))
    )


def pack_greedy(df: DataFrame, text_col: str, id_col: str, *,
                budget: int, shards: int = 32, salt: int = 0,
                max_shard_rows: int | None = 50_000_000,
                shard_col: str | None = None,
                order_col: str | None = None) -> DataFrame:
    """First-fit doc-boundary packing: within each shard, documents in
    ``order_col`` order (default: id order) are appended to the current
    pack until the next document would overflow ``budget``, which opens
    a new pack; an oversized document (n_tok > budget) always gets a
    pack of its own. Adds ``shard``, ``n_tok``, ``pack``.

    The running reset makes this a stateful scan (not a prefix sum), so
    each shard packs inside one Arrow batch (applyInPandas) — and the
    same scan replays in SQL as a recursive CTE, which is how the
    oracle gate verifies it row-for-row.

    Scale shape (r9): the stateful scan only needs ``(id, order,
    n_tok)`` slim columns — ONLY that projection goes through the Arrow
    batch; the pack assignment joins back onto the full rows by id. The
    text column never enters Python (the r8 shape materialized every
    column of the shard in one pandas frame — at 100 TB with the
    default 32 shards that is ~3 TB of text per executor task). The
    residual per-shard slim frame is guarded: a shard wider than
    ``max_shard_rows`` (default 50M rows ≈ 800 MB of pandas) raises
    with the shard count to pass, instead of silently OOMing the
    executor — the same class of guard as text._guard_global_window
    (pass ``max_shard_rows=None`` to disable for driver-scale input).

    Contract: ``id_col`` must be UNIQUE and NON-NULL — the join-back
    keys on it (a null id would drop its row, a duplicated id would
    multiply), and the packing order itself is ill-defined otherwise.

    Composition (r9): pass ``shard_col``/``order_col`` to pack along an
    upstream layout — e.g. shuffle_epoch's ``(shard, pos)`` packs each
    epoch's permutation. Output-name collisions raise (see
    :func:`_guard_pack_columns`)."""
    _guard_pack_columns(df, ["shard", "n_tok", "pack"], shard_col)
    order = order_col or id_col
    shard_expr = (F.col(shard_col) if shard_col is not None
                  else hash_bucket(id_col, shards, salt))
    base = (df.withColumn("shard", shard_expr)
            .withColumn("n_tok",
                        F.coalesce(token_count(F.col(text_col)),
                                   F.lit(0))))
    slim_cols = list(dict.fromkeys([id_col, order, "shard", "n_tok"]))
    slim = base.select(*slim_cols)
    schema = T.StructType([slim.schema[id_col],
                           T.StructField("pack", T.LongType())])
    limit = max_shard_rows

    def _pack(pdf):
        if limit is not None and len(pdf) > limit:
            raise ValueError(
                f"pack_greedy: shard holds {len(pdf)} docs > "
                f"max_shard_rows={limit}; raise shards= (need >= "
                f"~{shards * (len(pdf) + limit - 1) // limit}) or pass "
                "max_shard_rows=None for driver-scale input")
        pdf = pdf.sort_values(order).reset_index(drop=True)
        packs, pack, running = [], 0, 0
        for n in pdf["n_tok"]:
            n = int(n)
            if running > 0 and running + n > budget:
                pack += 1
                running = 0
            packs.append(pack)
            running += n
        pdf["pack"] = packs
        return pdf[[id_col, "pack"]]

    assign = slim.groupBy("shard").applyInPandas(_pack, schema)
    return base.join(assign, id_col)
