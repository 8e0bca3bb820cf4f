"""Property-based model check for the lexicon language-ID heuristic:
per-language hit counts (with multiplicity) and the deterministic
argmax with ALPHABETICAL tie-break must match a Python fold, on token
draws mixing lexicon words that overlap ACROSS languages (de/fr share
'un'/'est', es 'de'/'en' collide with language names, en 'a'/'is'
collide with es/de entries) — the tie and cross-lexicon cases the
fixture corpus rarely exercises.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_data_pipeline_spark.functions import text as T
from realtime_data_pipeline_spark.functions.text import LANG_LEXICONS

# deliberately tie-prone: overlapping words + a non-lexicon filler
_WORDS = sorted({w for lex in LANG_LEXICONS.values() for w in lex})[:20] + [
    "xyzzy"
]

_docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docs_strategy)
def test_language_id_matches_python_model(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scored = df.select(
        "doc_id", *T.language_scores()
    ).withColumn("predicted_lang", T.predicted_lang_expr())
    got = {
        r["doc_id"]: (
            tuple(r[f"{lang}_hits"] for lang in sorted(LANG_LEXICONS)),
            r["predicted_lang"],
        )
        for r in scored.collect()
    }

    want = {}
    for i, txt in rows:
        toks = re.split(r"\s+", txt.strip())
        hits = tuple(
            sum(1 for t in toks if t in LANG_LEXICONS[lang])
            for lang in sorted(LANG_LEXICONS)
        )
        # argmax, alphabetical tie-break == first index achieving max
        best = sorted(LANG_LEXICONS)[hits.index(max(hits))]
        want[i] = (hits, best)
    assert got == want
