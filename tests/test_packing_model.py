"""Property-based model check for FFD packing: the applyInPandas
kernel's per-group stats must equal a direct python FFD on the same
(tokens desc, doc_id asc) order.  The envelope tests pin bounds; this
pins the exact placement algorithm on random inputs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_data_pipeline_spark.functions.packing import ffd_packing_stats

CAPACITY = 50

# (doc_id unique, token count possibly > capacity for overflow cases)
_docs = st.dictionaries(
    st.integers(0, 30), st.integers(1, 80), min_size=1, max_size=16
)


def _model(items, capacity):
    order = sorted(items.items(), key=lambda kv: (-kv[1], kv[0]))
    loads, overflow = [], 0
    for _, nt in order:
        if nt > capacity:
            loads.append(nt)
            overflow += 1
            continue
        for i, load in enumerate(loads):
            if load + nt <= capacity:
                loads[i] = load + nt
                break
        else:
            loads.append(nt)
    return {
        "n_bins": len(loads),
        "n_docs": len(items),
        "total_tokens": sum(items.values()),
        "max_bin_tokens": max(loads) if loads else 0,
        "n_overflow": overflow,
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(items=_docs)
def test_ffd_stats_match_python_model(spark, items):
    # single group ("xx") and n_shards=0 → the kernel sees exactly the
    # model's input in one pandas frame
    rows = [(doc_id, "w " * nt, "xx") for doc_id, nt in items.items()]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = ffd_packing_stats(docs, CAPACITY, n_shards=0).collect()
    assert len(got) == 1
    r = got[0]
    want = _model(items, CAPACITY)
    assert {
        "n_bins": r["n_bins"],
        "n_docs": r["n_docs"],
        "total_tokens": r["total_tokens"],
        "max_bin_tokens": r["max_bin_tokens"],
        "n_overflow": r["n_overflow"],
    } == want
