"""FFD packing correctness envelope: capacity respected, bin-count
bounds, determinism, and a hand-computed case."""

from __future__ import annotations

import pandas as pd

from realtime_data_pipeline_spark.functions import packing

from conftest import SF_DIR


def test_hand_case():
    pdf = pd.DataFrame(
        {
            "lang": ["en"] * 5,
            "doc_id": [1, 2, 3, 4, 5],
            "nt": [60, 50, 40, 30, 20],
        }
    )
    out = packing._ffd_group(pdf, capacity=100)
    # FFD order: 60,50,40,30,20 → bins [60+40],[50+30+20] = 2 bins
    assert out.iloc[0]["n_bins"] == 2
    assert out.iloc[0]["max_bin_tokens"] == 100
    assert out.iloc[0]["n_overflow"] == 0


def test_oversized_doc_gets_solo_bin():
    pdf = pd.DataFrame(
        {"lang": ["en"] * 2, "doc_id": [1, 2], "nt": [500, 10]}
    )
    out = packing._ffd_group(pdf, capacity=100)
    assert out.iloc[0]["n_bins"] == 2
    assert out.iloc[0]["n_overflow"] == 1
    assert out.iloc[0]["max_bin_tokens"] == 500


def test_envelope_on_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cap = 256
    rows = {
        r.lang: r
        for r in packing.ffd_packing_stats(docs, cap).collect()
    }
    assert rows
    for lang, r in rows.items():
        assert r.n_bins >= packing.lower_bound_bins(r.total_tokens, cap), lang
        assert r.n_bins <= r.n_docs, lang
        if r.n_overflow == 0:
            assert r.max_bin_tokens <= cap, lang
    # deterministic across runs
    again = {
        r.lang: r for r in packing.ffd_packing_stats(docs, cap).collect()
    }
    assert rows == again
