"""Property-based model check for the 2-pass Misra-Gries exact heavy
hitters: the sketch pass may only affect WHICH candidates reach the
verification pass (no-false-negative guarantee), so the final output
must EQUAL the brute-force answer — every term with count >= phi * N,
with its exact count and share — for any phi and any skew profile.
Hypothesis draws Zipf-ish corpora (a few hot words, a long tail) plus
degenerate ones (all-identical, all-distinct, empty docs) where the
MG decrement path and the threshold boundary (cnt == phi*N exactly)
are actually reached.
"""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_data_pipeline_spark.functions import sketches

# hot words repeat via sampled_from weights: short list → heavy
# collisions; "u%d" tail words are near-unique
_token = st.one_of(
    st.sampled_from(["hot", "warm", "the"]),
    st.integers(0, 50).map(lambda i: f"u{i}"),
)
_docs_strategy = st.lists(
    st.lists(_token, min_size=0, max_size=30), min_size=1, max_size=8
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docs_strategy, phi=st.sampled_from([0.005, 0.05, 0.2, 0.5]))
def test_frequent_terms_equals_bruteforce(spark, docs, phi):
    rows = [(i, " ".join(toks), "en") for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    got = {
        r["term"]: (r["cnt"], r["share"])
        for r in sketches.frequent_terms(df, phi=phi).collect()
    }

    counts = Counter()
    for _, text, _ in rows:
        counts.update(re.split(r"\s+", text.strip()))
    n = sum(counts.values())

    def round6_half_up(x: float) -> float:
        # Spark F.round is HALF_UP on the shortest-repr decimal;
        # Python's round is banker's — they genuinely differ here:
        # n=128 (power of two) makes cnt/n exact in binary, so odd
        # cnt lands a REAL .5 tie at the 6th decimal
        from decimal import ROUND_HALF_UP, Decimal

        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    want = {
        term: (cnt, round6_half_up(cnt / n))
        for term, cnt in counts.items()
        if cnt >= phi * n
    }
    assert got == want, (phi, n)
