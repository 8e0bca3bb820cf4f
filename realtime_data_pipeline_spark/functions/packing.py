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
express the semantics).  The group key bounds the sequential scope, so
the group key IS the scale knob: grouping only by `lang` caps
parallelism at the number of languages and forces each language's
whole doc list through one task.  `ffd_packing_stats` therefore packs
per (shard, lang) by default — `shard` is the deterministic md5
selector from operators/writer.with_shard, so n_shards × n_langs
groups run in parallel and each group's pandas frame is 1/n_shards the
size.  Raising n_shards at 100 TB trades a little packing quality
(bins never span shards) for unbounded parallelism; n_shards=0 gives
the exact per-language pack when the corpus is small enough.

Correctness envelope (pinned by tests/test_packing.py):
  * every bin's load ≤ capacity (oversized docs get a solo overflow
    bin, flagged in `n_overflow`);
  * ceil(total_tokens/capacity) ≤ n_bins ≤ n_docs;
  * deterministic: docs placed in (tokens desc, doc_id asc) order with
    first-fit into the lowest-indexed bin;
  * sharded group stats merge to the same n_docs/total_tokens as the
    unsharded pack (bin counts may differ — packing quality, not
    conservation).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.functions import text
from realtime_data_pipeline_spark.operators import writer

_METRIC_SCHEMA = (
    "n_bins long, n_docs long, total_tokens long, "
    "max_bin_tokens long, n_overflow long, overflow_tokens long"
)


def _ffd_group(
    pdf: pd.DataFrame, capacity: int, group_cols: tuple[str, ...] = ("lang",)
) -> pd.DataFrame:
    pdf = pdf.sort_values(["nt", "doc_id"], ascending=[False, True])
    loads: list[int] = []
    n_overflow = 0
    overflow_tokens = 0
    for nt in pdf["nt"].to_numpy():
        nt = int(nt)
        if nt > capacity:
            # an unsplittable doc larger than the window: solo bin
            loads.append(nt)
            n_overflow += 1
            overflow_tokens += nt
            continue
        for i, load in enumerate(loads):
            if load + nt <= capacity:
                loads[i] = load + nt
                break
        else:
            loads.append(nt)
    total = int(pdf["nt"].sum())
    out = {c: [pdf[c].iloc[0]] for c in group_cols}
    out.update(
        {
            "n_bins": [len(loads)],
            "n_docs": [len(pdf)],
            "total_tokens": [total],
            "max_bin_tokens": [max(loads) if loads else 0],
            "n_overflow": [n_overflow],
            "overflow_tokens": [overflow_tokens],
        }
    )
    return pd.DataFrame(out)


def ffd_packing_stats(
    docs: DataFrame,
    capacity: int,
    group_cols: tuple[str, ...] = ("lang",),
    n_shards: int = writer.DEFAULT_SHARDS,
) -> DataFrame:
    """Per-group FFD packing summary via applyInPandas (grouped map,
    Arrow batches — one sequential kernel per group, groups parallel).

    `n_shards` > 0 prepends a deterministic md5 shard id (writer.
    with_shard on doc_id) to `group_cols`, bounding every group to
    ~1/n_shards of its partition — the 100 TB shape.  `n_shards=0`
    packs exactly per `group_cols`.
    """
    if n_shards:
        docs = writer.with_shard(docs, "doc_id", n_shards)
        group_cols = ("shard", *group_cols)
    # coalesce: a NULL-text doc has no tokens — it packs for free as
    # nt=0 (and a NULL would reach pandas as NaN and crash int())
    sized = docs.select(
        *group_cols,
        "doc_id",
        F.coalesce(text.token_count(), F.lit(0)).alias("nt"),
    )
    key_schema = ", ".join(
        f"`{c}` {sized.schema[c].dataType.simpleString()}" for c in group_cols
    )
    return sized.groupBy(*group_cols).applyInPandas(
        lambda pdf: _ffd_group(pdf, capacity, group_cols),
        schema=f"{key_schema}, {_METRIC_SCHEMA}",
    )


def lower_bound_bins(total_tokens: int, capacity: int) -> int:
    return math.ceil(total_tokens / capacity) if total_tokens else 0
