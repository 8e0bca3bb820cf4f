"""Misra-Gries heavy hitters (functions/sketches.py): the candidate
superset guarantee under hostile key distributions, and exactness of
the 2-pass result vs a brute-force count.  Cross-engine parity is
covered by the registry oracle (frequent_terms_report)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from realtime_data_pipeline_spark.functions import sketches


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_candidates_are_superset_of_true_heavy_hitters(spark):
    # long-tail corpus: 3 genuinely frequent terms buried in a sea of
    # singletons, shuffled so batches interleave head and tail
    rng = random.Random(7)
    toks = ["hot_a"] * 400 + ["hot_b"] * 300 + ["hot_c"] * 200
    toks += [f"tail{i}" for i in range(2000)]
    rng.shuffle(toks)
    # 30 tokens per doc -> ~97 docs
    texts = [" ".join(toks[i : i + 30]) for i in range(0, len(toks), 30)]
    docs = _docs(spark, texts)
    phi = 0.05  # n=2900 -> threshold 145: hot_a/b/c qualify
    capacity = int(2.0 / phi) + 1
    cand = {
        r["term"]
        for r in sketches.mg_candidate_terms(docs, capacity).collect()
    }
    assert {"hot_a", "hot_b", "hot_c"} <= cand
    result = sketches.frequent_terms(docs, phi=phi).collect()
    got = {r["term"]: r["cnt"] for r in result}
    assert got == {"hot_a": 400, "hot_b": 300, "hot_c": 200}


def test_two_pass_matches_bruteforce_groupby(spark):
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(rng.choices(vocab, k=rng.randint(5, 40))) for _ in range(80)
    ]
    docs = _docs(spark, texts)
    phi = 0.02
    fast = {
        (r["term"], r["cnt"])
        for r in sketches.frequent_terms(docs, phi=phi).collect()
    }
    tok = docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
    n = tok.count()
    brute = {
        (r["t"], r["cnt"])
        for r in tok.groupBy("t").agg(F.count("*").alias("cnt")).collect()
        if r["cnt"] >= phi * n
    }
    assert fast == brute


def test_mg_kernel_bounded_state_and_decrement_path(spark):
    # capacity 2 with 3 distinct heavy streams forces the
    # decrement-all branch; the 2-pass result stays exact because
    # verification recounts
    docs = _docs(spark, ["a a a b b c"] * 20)
    out = sketches.frequent_terms(docs, phi=0.3).collect()
    got = {r["term"]: r["cnt"] for r in out}
    # n=120, threshold 36: a(60) and b(40) qualify, c(20) does not
    assert got == {"a": 60, "b": 40}


def test_null_text_rows_do_not_crash_the_mg_kernel(spark):
    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, None), (2, "a b b")],
        "doc_id long, text string",
    )
    out = sketches.frequent_terms(docs, phi=0.3).collect()
    got = {r["term"]: r["cnt"] for r in out}
    assert got == {"a": 4, "b": 3}


# ---------------------------------------------------------------------------
# Property-based model check of the MG kernel itself (no Spark):
# the no-false-negative guarantee must hold for ANY stream and ANY
# batch split — an item absent from every batch summary has global
# count <= n/capacity, so anything above that bound must survive.
# ---------------------------------------------------------------------------

from collections import Counter

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_data_pipeline_spark.functions.sketches import _mg_kernel

_token_lists = st.lists(
    st.lists(
        st.integers(0, 15).map(lambda i: f"w{i}"), min_size=0, max_size=40
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=60, deadline=None)
@given(docs=_token_lists, capacity=st.integers(2, 8), split=st.integers(0, 25))
def test_mg_superset_guarantee_any_stream_any_split(docs, capacity, split):
    split = min(split, len(docs))
    batches = [
        pd.DataFrame({"toks": part})
        for part in (docs[:split], docs[split:])
        if part
    ]
    union: set[str] = set()
    for out in _mg_kernel(capacity)(iter(batches)):
        union |= set(out["term"])
    cnt = Counter(t for d in docs for t in d)
    n = sum(cnt.values())
    for t, c in cnt.items():
        if c > n / capacity:
            assert t in union, (t, c, n, capacity)
