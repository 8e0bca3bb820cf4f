"""Property-based model check for the MinHash-LSH pipeline — THE
100 TB near-dup shape.  The oracle already mirrors the SQL in DuckDB;
this pins the semantics themselves against an independent pure-Python
reimplementation of the same bit-exact integer pipeline:

  per-token md5 -> rolling polynomial shingle hash -> affine
  permutations -> banded bucket grouping (BAND_R=2 signature rows per
  band) -> i<j pair generation with signature-agreement estimate.

Hypothesis draws documents from a small vocabulary so shared shingles
(and identical docs, est_jaccard = 1.0) are common, and includes
sub-3-token docs (excluded by both implementations).
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_data_pipeline_spark.functions import dedup
from realtime_data_pipeline_spark.functions.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    N_PERMS,
    SHINGLE_B,
)

_VOCAB = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far", "naïve"]

_docs_strategy = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8),
    min_size=1,
    max_size=10,
)


def _py_signature(text: str) -> list[int] | None:
    toks = re.split(r"\s+", text.strip())
    if len(toks) < 3:
        return None
    th = [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) for t in toks]
    sh = [
        ((th[i] * SHINGLE_B + th[i + 1]) % MINHASH_P * SHINGLE_B + th[i + 2])
        % MINHASH_P
        for i in range(len(th) - 2)
    ]
    return [
        min((MINHASH_A[j] * h + MINHASH_B[j]) % MINHASH_P for h in sh)
        for j in range(N_PERMS)
    ]


def _py_candidates(sigs: dict[int, list[int]]) -> dict[tuple[int, int], float]:
    pairs: dict[tuple[int, int], float] = {}
    for j in range(dedup.N_BANDS):
        buckets: dict[tuple[int, int], list[int]] = {}
        for doc_id, sig in sigs.items():
            key = (sig[dedup.BAND_R * j], sig[dedup.BAND_R * j + 1])
            buckets.setdefault(key, []).append(doc_id)
        for members in buckets.values():
            members.sort()
            for i, a in enumerate(members):
                for b in members[i + 1 :]:
                    agree = sum(
                        1
                        for x, y in zip(sigs[a], sigs[b])
                        if x == y
                    )
                    pairs[(a, b)] = round(agree / N_PERMS, 4)
    return pairs


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docs_strategy)
def test_minhash_pipeline_matches_python_model(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got_sigs = {
        r["doc_id"]: list(r["sigs"])
        for r in dedup.minhash_signatures(df).collect()
    }
    want_sigs = {
        i: sig
        for i, (_, text) in enumerate(rows)
        if (sig := _py_signature(text)) is not None
    }
    assert got_sigs == want_sigs

    got_pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup.minhash_candidates(df, limit=None).collect()
    }
    assert got_pairs == _py_candidates(want_sigs)


def _py_simhash(text: str) -> int:
    toks = re.split(r"\s+", text.strip())
    th = [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16) for t in toks]
    sig = 0
    for b in range(dedup.SIMHASH_BITS):
        vote = sum(((c >> b) & 1) * 2 - 1 for c in th)
        if vote > 0:
            sig |= 1 << b
    return sig


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docs_strategy, max_hamming=st.integers(1, 12))
def test_simhash_pipeline_matches_python_model(spark, docs, max_hamming):
    """SimHash signatures must equal the Python per-bit majority vote,
    and the pigeonhole chunk join must find EXACTLY the pairs within
    the Hamming radius (recall 1.0 by construction — d differing bits
    cannot touch all d+1 chunks — and the exact distance filter
    removes chunk-collision false positives)."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got_sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signatures(df).collect()
    }
    want_sigs = {i: _py_simhash(text) for i, text in rows}
    assert got_sigs == want_sigs

    got_pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming_dist"]
        for r in dedup.simhash_near_pairs(
            df, max_hamming=max_hamming, limit=10_000
        ).collect()
    }
    # signature-0 degenerates are excluded from pairing (the engine's
    # degenerate-doc guard — cannot occur with this vocab strategy, but
    # the model mirrors the contract exactly)
    want_pairs = {
        (a, b): bin(want_sigs[a] ^ want_sigs[b]).count("1")
        for a in want_sigs
        for b in want_sigs
        if a < b
        and want_sigs[a] != 0
        and want_sigs[b] != 0
        and bin(want_sigs[a] ^ want_sigs[b]).count("1") <= max_hamming
    }
    assert got_pairs == want_pairs


def _py_shingles(text: str) -> set[int]:
    toks = re.split(r"\s+", text.strip())
    if len(toks) < 3:
        return set()
    th = [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) for t in toks]
    return {
        ((th[i] * SHINGLE_B + th[i + 1]) % MINHASH_P * SHINGLE_B + th[i + 2])
        % MINHASH_P
        for i in range(len(th) - 2)
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docs_strategy)
def test_ngram_jaccard_matches_python_model(spark, docs):
    """Exact 3-gram Jaccard over the LSH candidate set must equal the
    Python model: candidates = the banded-bucket pairs the MinHash
    model already derives (same signatures, same BAND_R=2 grouping),
    jaccard = set-based Jaccard over the FULL distinct shingle sets —
    completing the model coverage of the third dedup family (MinHash
    estimates it, SimHash approximates it in Hamming space, this
    computes it exactly on LSH candidates — the round-10 re-scope onto
    the only generator that measured sublinear on open vocabularies)."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, min_jaccard=0.0, limit=10_000
        ).collect()
    }
    sigs = {
        i: sig
        for i, (_, text) in enumerate(rows)
        if (sig := _py_signature(text)) is not None
    }
    sets = {i: _py_shingles(text) for i, text in rows}
    want = {}
    for a, b in _py_candidates(sigs):
        both = sets[a] & sets[b]
        want[(a, b)] = round(
            len(both) / (len(sets[a]) + len(sets[b]) - len(both)), 4
        )
    assert got == want


def test_ngram_jaccard_bucket_cap_drops_boilerplate_cliques(spark):
    """The generation guard after the round-10 re-scope: 200 docs
    sharing only a 3-token boilerplate prefix are NOT near-duplicates
    (J ≈ 1/9), so the S-curve keeps the 19,900-pair clique out of the
    candidate set almost entirely, while a genuine near-dup pair
    (45 of 47 shared trigrams) pairs with its jaccard computed over
    the FULL sets.  Also pins the emitted set == the Python model's
    LSH-candidate ∩ exact-jaccard derivation, and candidate pairs ==
    minhash_candidates' (same banding, same bucket cap)."""
    # each doc: shared 3-token boilerplate prefix + 20 unique tokens
    # -> 21 shingles, 1 shared, pair J = 1/41; the S-curve admits
    # ~6·J² ≈ 0.36% of the clique
    uniq = " ".join(f"u{{i}}x{k}" for k in range(20))
    boiler = [
        (i, f"call me now {uniq}".format(i=i)) for i in range(200)
    ]
    organic = [
        (1000, "the quick brown fox jumps over the lazy dog today"),
        (1001, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    rows = boiler + organic
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, min_jaccard=0.0, limit=None
        ).collect()
    }
    sigs = {i: _py_signature(text) for i, text in rows}
    sets = {i: _py_shingles(text) for i, text in rows}
    want = {}
    for a, b in _py_candidates(sigs):
        both = sets[a] & sets[b]
        want[(a, b)] = round(
            len(both) / (len(sets[a]) + len(sets[b]) - len(both)), 4
        )
    assert got == want
    # the near-dup pair IS found, with exact (not estimated) jaccard
    sa, sb = sets[1000], sets[1001]
    inter = len(sa & sb)
    assert got[(1000, 1001)] == round(
        inter / (len(sa) + len(sb) - inter), 4
    )
    # the boilerplate clique generates (almost) nothing: every emitted
    # boilerplate pair is an S-curve sample (expected ~6·J² ≈ 0.36%
    # of the 19,900-pair clique at J = 1/41) — the quadratic term the
    # old df-cap plan materialized in full
    clique_pairs = [p for p in got if p[0] < 1000 and p[1] < 1000]
    assert len(clique_pairs) < 500
    # candidate generation is the minhash banding exactly
    mh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidates(df, limit=None).collect()
    }
    assert set(got) == mh


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docs_strategy, bench_cut=st.integers(0, 9))
def test_benchmark_contamination_matches_python_model(
    spark, docs, bench_cut
):
    """Decontamination must equal the Python set model: per corpus doc,
    n_overlap = |doc's DISTINCT shingles ∩ bench shingle union| (each
    distinct shingle counted ONCE however often it appears in the
    bench), ratio over the doc's own distinct-shingle count, 5%
    threshold.  bench_cut draws the eval/corpus split point so empty
    benches and empty corpora both occur."""
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from pyspark.sql import functions as F

    got = {
        r["doc_id"]: (r["n_shingles"], r["n_overlap"], r["overlap_ratio"])
        for r in dedup.benchmark_contamination(
            df, F.col("doc_id") < bench_cut
        ).collect()
    }

    sets = {i: _py_shingles(text) for i, text in rows}
    bench_union = set().union(
        *[s for i, s in sets.items() if i < bench_cut]
    ) if any(i < bench_cut for i in sets) else set()
    want = {}
    for i, s in sets.items():
        if i < bench_cut or not s:
            continue
        n_overlap = len(s & bench_union)
        if n_overlap:
            ratio = round(n_overlap / len(s), 4)
            if ratio >= 0.05:
                want[i] = (len(s), n_overlap, ratio)
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=150),
    min_size=1,
    max_size=6,
))
def test_doc_chunks_match_python_model(spark, docs):
    """RAG chunking is boundary arithmetic all the way down — overlap
    stride, a final short chunk, single-token and empty docs — so pin
    the emitted (chunk_idx, n_chunk_tokens, rolling-hash fingerprint)
    rows against a Python model over the same md5 token hashes.  Doc
    lengths up to 150 tokens cross several 48-stride boundaries and
    land chunks of every possible tail length."""
    from realtime_data_pipeline_spark.functions.text import (
        FINGERPRINT_BASE,
        FINGERPRINT_MOD,
    )
    from realtime_data_pipeline_spark.plans.northstar import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )
    from realtime_data_pipeline_spark.plans.registry import REGISTRY

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile

    d = tempfile.mkdtemp(prefix="chunks_")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["t"] * len(rows), pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        f"{d}/documents.parquet",
    )
    got = sorted(
        tuple(r)
        for r in REGISTRY["doc_chunks"].fn(spark, d).collect()
    )

    want = []
    for i, text in rows:
        toks = re.split(r"\s+", text.strip())
        th = [
            int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
            for t in toks
        ]
        n = len(th)
        for s in range(1, n + 1, CHUNK_STRIDE):
            window = th[s - 1 : s - 1 + CHUNK_TOKENS]
            fp = 0
            for x in window:
                fp = (fp * FINGERPRINT_BASE + x) % FINGERPRINT_MOD
            want.append(
                (
                    i,
                    (s - 1) // CHUNK_STRIDE,
                    min(CHUNK_TOKENS, n - s + 1),
                    fp,
                )
            )
    assert got == sorted(want)


def _round4_half_up(x: float) -> float:
    """Spark's F.round on a double: BigDecimal.valueOf (shortest
    round-trip repr) then HALF_UP — NOT Python's banker's round."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12),
    min_size=1,
    max_size=10,
))
def test_corpus_curation_matches_python_model(spark, docs):
    """END-TO-END model of the flagship curation pipeline: exact dedup
    (min doc_id per identical text) -> MinHash-LSH near-dup clusters
    (est >= 0.5, min-label components, drop non-canonical members) ->
    quality filter (>= 0.5 on the HALF_UP-rounded score) -> per-lang
    rollup with the decimal-sum average.  Every stage reuses this
    file's verified per-stage models plus a union-find; hypothesis
    draws small-vocab docs so exact dups, near-dups, and sub-threshold
    docs all occur together — the stage INTERACTIONS (an exact dup
    that is also a near-dup member, a near-dup canonical that fails
    quality) are what this pins."""
    from decimal import Decimal

    from realtime_data_pipeline_spark.functions.text import LANG_LEXICONS
    from realtime_data_pipeline_spark.plans.registry import REGISTRY
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    langs = ["en", "de"]
    d = tempfile.mkdtemp(prefix="curation_")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(
                    [langs[i % 2] for i, _ in rows], pa.string()
                ),
                "source": pa.array(["t"] * len(rows), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    got = sorted(
        tuple(r)
        for r in REGISTRY["corpus_curation_stats"].fn(spark, d).collect()
    )

    # --- Python model -----------------------------------------------
    sigs = {
        i: sig
        for i, (_, text) in enumerate(rows)
        if (sig := _py_signature(text)) is not None
    }
    strong = {
        p for p, est in _py_candidates(sigs).items() if est >= 0.5
    }
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in strong:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    near_dupe_nodes = {
        n for p in strong for n in p if find(n) != n
    }

    by_text = {}
    for i, text in rows:
        by_text.setdefault(text, []).append(i)
    kept = {
        min(ids) for ids in by_text.values()
    } - near_dupe_nodes

    all_stop = {w for lex in LANG_LEXICONS.values() for w in lex}
    per_lang = {}
    for i in kept:
        text = rows[i][1]
        toks = re.split(r"\s+", text.strip())
        n = len(toks)
        stop = sum(1 for t in toks if t in all_stop)
        sumlen = sum(len(t) for t in toks)
        q = _round4_half_up(
            0.4 * min(n / 100.0, 1.0)
            + 0.4 * (1.0 - stop / n)
            + 0.2 * min((sumlen / n) / 8.0, 1.0)
        )
        if q >= 0.5:
            lang = langs[i % 2]
            agg = per_lang.setdefault(lang, [0, 0, Decimal(0)])
            agg[0] += 1
            agg[1] += n
            agg[2] += Decimal(str(q)).quantize(Decimal("0.0001"))
    want = sorted(
        (lang, c, t, _round4_half_up(float(qs) / c))
        for lang, (c, t, qs) in per_lang.items()
    )
    assert got == want


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


_fuzzy_docs = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["en", "de"])),
        st.lists(st.sampled_from(["the", "teh", "cat", "cot", "sat"]),
                 min_size=0, max_size=4),
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_fuzzy_docs)
def test_fuzzy_prefix_dups_match_python_model(spark, docs):
    """Fifth dedup family: the two-bucket-family (lang, token1) ∪
    (lang, token2) candidate generation plus bounded-prefix
    levenshtein must equal a Python model — including NULL-lang
    exclusion, single-token docs (absent from the token2 family), and
    typo'd first tokens pairing through token 2."""
    from realtime_data_pipeline_spark.functions.dedup import (
        FUZZY_MAX_DIST,
        FUZZY_PREFIX_LEN,
    )

    rows = [(i, lang, " ".join(toks)) for i, (lang, toks) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    got = {
        (r["doc_a"], r["doc_b"]): r["edit_distance"]
        for r in dedup.fuzzy_prefix_dups(df, limit=None).collect()
    }

    feats = {}
    for i, lang, text in rows:
        if lang is None:
            continue
        t = text.strip()
        toks = re.split(r"\s+", t)
        feats[i] = (
            lang,
            t[:FUZZY_PREFIX_LEN],
            toks[0],                              # '' for empty text
            toks[1] if len(toks) > 1 else None,
        )
    want = {}
    for fam in (2, 3):  # t1, t2 feature positions
        buckets: dict[tuple, list[int]] = {}
        for i, f in feats.items():
            if f[fam] is not None:
                buckets.setdefault((f[0], f[fam]), []).append(i)
        for members in buckets.values():
            members.sort()
            for x, a in enumerate(members):
                for b in members[x + 1 :]:
                    dist = _py_levenshtein(feats[a][1], feats[b][1])
                    if dist <= FUZZY_MAX_DIST:
                        want[(a, b)] = dist
    assert got == want


def test_minhash_bucket_width_cap_drops_boilerplate(spark):
    """The skew guard: 200 identical docs form one 200-wide bucket per
    band — beyond max_bucket_width=128, so the degenerate boilerplate
    emits ZERO pairs (no B^2/2 blowup), while two near-identical
    organic docs in the same frame still pair through their own
    buckets."""
    boiler = [(i, "spam spam spam spam ham") for i in range(200)]
    organic = [
        (1000, "the quick brown fox jumps over the lazy dog today"),
        (1001, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    df = spark.createDataFrame(boiler + organic, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_candidates(df, limit=None).collect()
    }
    assert pairs == {(1000, 1001)}
    # and with the guard disabled the boilerplate floods back in
    uncapped = dedup.minhash_candidates(
        df, limit=None, max_bucket_width=None
    ).count()
    assert uncapped == 200 * 199 // 2 + 1


def test_simhash_degenerate_docs_never_pair(spark):
    """The degenerate-doc guard (ADVICE r7): NULL-text docs all carry
    signature 0 and would collide on every chunk-pair combo — k of
    them must emit ZERO pairs (no C(c,2)*k^2/2 blowup), while genuine
    near-identical docs in the same frame still pair.  The DuckDB
    oracle mirrors the simhash <> 0 exclusion."""
    degenerate = [(i, None) for i in range(50)]
    organic = [
        (1000, "the quick brown fox jumps over the lazy dog today"),
        (1001, "the quick brown fox jumps over the lazy dog today"),
    ]
    df = spark.createDataFrame(
        degenerate + organic, "doc_id long, text string"
    )
    # signatures still report the degenerates (as 0)...
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signatures(df).collect()
    }
    assert all(sigs[i] == 0 for i in range(50))
    # ...but pairing excludes them entirely
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_near_pairs(df, limit=10_000).collect()
    }
    assert pairs == {(1000, 1001)}
