"""Bounded-memory heavy hitters: Misra-Gries candidate pruning +
exact verification (the classic 2-pass frequent-items shape).

Why not just groupBy(term).count()?  At 100 TB the term key space is
~vocabulary-of-the-web: the shuffle carries the entire long tail even
though only the ≥ φ·n head is wanted.  Misra-Gries (Misra & Gries
1982; the "frequent" algorithm of Cormode & Hadjieleftheriou's
VLDB'08 survey) bounds executor state to a fixed `capacity`-entry
counter table and GUARANTEES no false negatives: an item absent from
a batch's summary has batch-local count ≤ n_batch/capacity, so an
item absent from EVERY summary has global count ≤ n/capacity — with
capacity ≥ 1/φ every true heavy hitter survives somewhere.  The
second pass computes EXACT counts for the (tiny) candidate union, so
the final answer is exact and independent of batching/order — which
is what makes the operator oracle-checkable against plain SQL.

Scale shape: pass 1 is a pure map (mapInPandas, Arrow batches of
token arrays, zero shuffle, O(capacity) state); the candidate union
is ≤ capacity × batches rows → broadcast.  Pass 2 explodes tokens
map-side, the broadcast semi-join drops the long tail BEFORE the
exchange, and the partial-aggregated shuffle carries ≤ |candidates|
terms per partition.  The Python token loop is the honest MG kernel —
a per-token decrement-all table update no built-in expresses (same
justification as the FFD packer, functions/packing.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.functions.text import tokens


def _mg_kernel(capacity: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counters: dict[str, int] = {}
            for toks in pdf["toks"]:
                for t in toks:
                    if t in counters:
                        counters[t] += 1
                    elif len(counters) < capacity:
                        counters[t] = 1
                    else:
                        dead = []
                        for k in counters:
                            counters[k] -= 1
                            if counters[k] == 0:
                                dead.append(k)
                        for k in dead:
                            del counters[k]
            yield pd.DataFrame({"term": list(counters.keys())})

    return run


def _tok_frame(docs: DataFrame) -> DataFrame:
    # NULL text dropped up front: the MG kernel iterates the token
    # array (None would crash it), and both engines then agree by
    # construction (the oracle carries the same predicate).
    return docs.where(F.col("text").isNotNull()).select(
        tokens("text").alias("toks")
    )


def mg_candidate_terms(docs: DataFrame, capacity: int) -> DataFrame:
    """Pass 1: per-Arrow-batch Misra-Gries summaries over the token
    stream, zero shuffle.  Superset guarantee: contains every term
    with global frequency > n/capacity."""
    return _tok_frame(docs).mapInPandas(
        _mg_kernel(capacity), schema="term string"
    ).distinct()


def frequent_terms(docs: DataFrame, phi: float = 0.005) -> DataFrame:
    """Exact heavy hitters: every term with frequency ≥ φ·n plus its
    exact count and share.  capacity = ⌈2/φ⌉ gives 2× margin over the
    no-false-negative bound."""
    capacity = int(2.0 / phi) + 1
    cand = mg_candidate_terms(docs, capacity)
    toks = _tok_frame(docs)
    n_tok = toks.agg(F.sum(F.size("toks")).alias("n_tok"))
    exact = (
        toks.select(F.explode("toks").alias("term"))
        .join(F.broadcast(cand), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(n_tok))
        .where(F.col("cnt").cast("double") >= F.lit(phi) * F.col("n_tok"))
        .select(
            "term",
            "cnt",
            F.round(
                F.col("cnt").cast("double") / F.col("n_tok").cast("double"), 6
            ).alias("share"),
        )
    )
