"""First-fit-decreasing (FFD) bin packing of documents into fixed
token-capacity context windows — the no-split variant of sequence
packing (plans/training.py's `sequence_packing_stats` is the
concat-and-chunk variant, which slices documents across windows; FFD
keeps every document whole and minimizes padding instead).

FFD is inherently sequential per group (each placement depends on all
previous placements' bin loads), so it is NOT expressible as DataFrame
built-ins or SQL — this is exactly the `applyInPandas` grouped-map
escape hatch the build charter reserves for such operators (cf.
SURVEY.md §2.6: pandas kernels only where built-ins genuinely cannot
express the semantics).  The group key bounds the sequential scope: at
100 TB you pack per (shard, lang) group, thousands of groups running
in parallel, each group's doc list small enough for one task — the
packing itself never needs cross-group state.

Correctness envelope (pinned by tests/test_packing.py):
  * every bin's load ≤ capacity (oversized docs get a solo overflow
    bin, flagged in `n_overflow`);
  * ceil(total_tokens/capacity) ≤ n_bins ≤ n_docs;
  * deterministic: docs placed in (tokens desc, doc_id asc) order with
    first-fit into the lowest-indexed bin.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame

from realtime_data_pipeline_spark.functions import text

PACK_RESULT_SCHEMA = (
    "lang string, n_bins long, n_docs long, total_tokens long, "
    "max_bin_tokens long, n_overflow long"
)


def _ffd_group(pdf: pd.DataFrame, capacity: int) -> pd.DataFrame:
    pdf = pdf.sort_values(["nt", "doc_id"], ascending=[False, True])
    loads: list[int] = []
    n_overflow = 0
    for nt in pdf["nt"].to_numpy():
        nt = int(nt)
        if nt > capacity:
            # an unsplittable doc larger than the window: solo bin
            loads.append(nt)
            n_overflow += 1
            continue
        for i, load in enumerate(loads):
            if load + nt <= capacity:
                loads[i] = load + nt
                break
        else:
            loads.append(nt)
    total = int(pdf["nt"].sum())
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "n_bins": [len(loads)],
            "n_docs": [len(pdf)],
            "total_tokens": [total],
            "max_bin_tokens": [max(loads) if loads else 0],
            "n_overflow": [n_overflow],
        }
    )


def ffd_packing_stats(docs: DataFrame, capacity: int) -> DataFrame:
    """Per-language FFD packing summary via applyInPandas (grouped map,
    Arrow batches — one sequential kernel per group, groups parallel)."""
    sized = docs.select("lang", "doc_id", text.token_count().alias("nt"))
    return sized.groupBy("lang").applyInPandas(
        lambda pdf: _ffd_group(pdf, capacity), schema=PACK_RESULT_SCHEMA
    )


def lower_bound_bins(total_tokens: int, capacity: int) -> int:
    return math.ceil(total_tokens / capacity) if total_tokens else 0
