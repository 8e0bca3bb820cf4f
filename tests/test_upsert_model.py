"""Property-based model check for the keyed-upsert sink: any sequence
of merges must leave the table equal to a last-write-wins dict, with
vacuum keeping the on-disk layout bounded.  Complements the targeted
tests (idempotent replay, untouched buckets, churn soak) with
adversarial sequences hypothesis finds — e.g. re-merging an old key
into a bucket whose version is far behind the manifest's.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_data_pipeline_spark.streaming.sinks import UpsertTable

# a batch: 1-6 unique keys from a small key space so sequences collide
# ACROSS batches (collisions are where upsert bugs live).  Unique keys
# within a batch because dropDuplicates keeps an arbitrary row per key
# — an intra-batch duplicate has no defined model value.
_batch = st.dictionaries(
    st.integers(0, 12), st.integers(0, 10**6), min_size=1, max_size=6
)
_sequences = st.lists(_batch, min_size=1, max_size=6)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=_sequences)
def test_merge_sequence_matches_dict_model(spark, tmp_path_factory, seq):
    path = str(tmp_path_factory.mktemp("upsert_model"))
    table = UpsertTable(spark, path, ["k"], n_buckets=4)
    model: dict[int, int] = {}
    for batch in seq:
        model.update(batch)
        table.merge(
            spark.createDataFrame(list(batch.items()), "k int, v int")
        )

    got = {r.k: r.v for r in table.read().collect()}
    assert got == model

    versions = [d for d in os.listdir(path) if d.startswith("v=")]
    assert len(versions) <= 4 + 1, versions


# Fast-append mode model check: batches carry a window value that
# sometimes advances (append path) and sometimes repeats or goes back
# (rewrite path); the table must equal the same last-write-wins dict
# regardless of which path each merge took.
_mono_batch = st.tuples(
    st.integers(0, 8),  # window delta bucket: 0 -> repeat, else advance
    st.dictionaries(
        st.integers(0, 6), st.integers(0, 10**6), min_size=1, max_size=4
    ),
)
_mono_sequences = st.lists(_mono_batch, min_size=1, max_size=6)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=_mono_sequences)
def test_monotone_merge_sequence_matches_dict_model(
    spark, tmp_path_factory, seq
):
    path = str(tmp_path_factory.mktemp("upsert_mono_model"))
    table = UpsertTable(
        spark, path, ["w", "k"], n_buckets=4, monotone_col="w", stack_max=3
    )
    model: dict[tuple[int, int], int] = {}
    w = 0
    for delta, batch in seq:
        w += delta  # delta 0 = same window again (forces rewrite path)
        for k, v in batch.items():
            model[(w, k)] = v
        table.merge(
            spark.createDataFrame(
                [(w, k, v) for k, v in batch.items()], "w int, k int, v int"
            )
        )
    got = {(r.w, r.k): r.v for r in table.read().collect()}
    assert got == model
    # layout bound: every bucket's stack is capped by stack_max
    import json as _json

    with open(os.path.join(path, "_CURRENT")) as f:
        m = _json.load(f)
    for entry in m["buckets"].values():
        assert len(entry if isinstance(entry, list) else [entry]) <= 3
