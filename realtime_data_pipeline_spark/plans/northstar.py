"""North-star registry queries: text analysis, dedup, similarity,
multimodal — each Spark query paired with DuckDB SQL generated from the
SAME Python constants (lexicons, hash widths, thresholds), so the two
sides cannot drift.

Cross-engine determinism relies on: md5 (identical hex in both
engines), integer arithmetic (exact), and sequential left-folds for
double sums (aggregate/zip_with ≙ list_reduce/list_prepend — both
start from 0.0 and fold left, giving bit-identical IEEE results).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_data_pipeline_spark.functions import dedup, multimodal, similarity, text
from realtime_data_pipeline_spark.functions.text import (
    BPE_REGEX,
    FINGERPRINT_BASE,
    FINGERPRINT_MOD,
    LANG_LEXICONS,
)
from realtime_data_pipeline_spark.plans.registry import _t, register

# ---------------------------------------------------------------------------
# Shared DuckDB fragments (mirrors of functions/text.py + dedup.py)
# ---------------------------------------------------------------------------

D_TOKS = "string_split_regex(trim(text), '\\s+')"
D_HASH32 = "(('0x' || substr(md5({t}), 1, 8))::BIGINT)"


def _d_lex(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_LEXICONS[lang])
    return f"[{words}]"


_ALL_STOP = ", ".join(
    f"'{w}'" for lex in LANG_LEXICONS.values() for w in lex
)

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_metrics",
    f"""
    SELECT doc_id, lang,
           len(toks) AS n_tokens,
           len(regexp_extract_all(text, '{BPE_REGEX}')) AS n_bpe_tokens,
           round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                 / len(toks), 4) AS avg_token_len,
           round(CAST(len(list_filter(toks, t -> list_contains([{_ALL_STOP}], t))) AS DOUBLE)
                 / len(toks), 4) AS stopword_ratio,
           round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
                 / length(text), 4) AS alpha_ratio,
           round(0.4 * least(len(toks) / 100.0, 1.0)
                 + 0.4 * (1.0 - CAST(len(list_filter(toks, t -> list_contains([{_ALL_STOP}], t))) AS DOUBLE)
                                / CAST(len(toks) AS DOUBLE))
                 + 0.2 * least((CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                                / CAST(len(toks) AS DOUBLE)) / 8.0, 1.0),
                 4) AS quality_score
    FROM (SELECT *, {D_TOKS} AS toks FROM documents)
    """,
    doc="token counting (whitespace + BPE-ish regex), length/stopword/charset "
    "ratios, composite quality score — all JVM-side built-ins",
    bench=True,
)
def q_text_metrics(spark, sf_dir):
    # widen="cpu" (r14): six tokenize/regex metrics per row make the
    # map side CPU-bound; the single-row-group test parquet otherwise
    # runs it all in ONE task (0.75 s serial vs 0.52 s widened at
    # sf0.1).  No-op at real scan parallelism and below the floor.
    docs = _t(spark, sf_dir, "documents", widen="cpu")
    return docs.select(
        "doc_id",
        "lang",
        text.token_count().alias("n_tokens"),
        text.bpe_token_count().alias("n_bpe_tokens"),
        text.avg_token_len().alias("avg_token_len"),
        text.stopword_ratio().alias("stopword_ratio"),
        text.char_class_ratio("text", "a-z").alias("alpha_ratio"),
        text.quality_score().alias("quality_score"),
    )


_D_LANG_HITS = ",\n           ".join(
    f"len(list_filter(toks, t -> list_contains({_d_lex(lang)}, t))) AS {lang}_hits"
    for lang in sorted(LANG_LEXICONS)
)


def _d_lang_case() -> str:
    langs = sorted(LANG_LEXICONS)
    branches = []
    for i, lang in enumerate(langs[:-1]):
        rest = ", ".join(f"{l}_hits" for l in langs[i + 1 :])
        greatest = f"greatest({rest})" if "," in rest else rest
        branches.append(f"WHEN {lang}_hits >= {greatest} THEN '{lang}'")
    return "CASE " + " ".join(branches) + f" ELSE '{langs[-1]}' END"


@register(
    "language_id",
    f"""
    SELECT doc_id, lang, {', '.join(f'{l}_hits' for l in sorted(LANG_LEXICONS))},
           {_d_lang_case()} AS predicted_lang
    FROM (SELECT doc_id, lang,
           {_D_LANG_HITS}
          FROM (SELECT *, {D_TOKS} AS toks FROM documents))
    """,
    doc="n-gram/stopword-lexicon language ID heuristic with deterministic "
    "argmax (alphabetical tie-break)",
)
def q_language_id(spark, sf_dir):
    # widen="cpu" (r14): five per-lexicon tokenize+filter passes per
    # row — the text_metrics serial-scan fix applies identically.
    docs = _t(spark, sf_dir, "documents", widen="cpu")
    scored = docs.select("doc_id", "lang", *text.language_scores())
    return scored.withColumn("predicted_lang", text.predicted_lang_expr())


@register(
    "langid_confusion_matrix",
    f"""
    WITH p AS (SELECT lang, {_d_lang_case()} AS predicted_lang
               FROM (SELECT lang,
                     {_D_LANG_HITS}
                     FROM (SELECT *, {D_TOKS} AS toks FROM documents)))
    SELECT lang AS actual_lang, predicted_lang, count(*) AS n_docs
    FROM p GROUP BY 1, 2
    """,
    doc="classifier evaluation for the lexicon language-ID heuristic: "
    "the (actual label × predicted) confusion matrix — WHICH languages "
    "the heuristic confuses, not just how often (per-class precision/"
    "recall fall out of the row/column marginals).  Shares the "
    "prediction expression with language_id verbatim, so the eval can "
    "never drift from the classifier it evaluates; one "
    "|langs|²-group rollup over the map-side scoring pass",
)
def q_langid_confusion_matrix(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select("lang", *text.language_scores())
    return (
        scored.select(
            F.col("lang").alias("actual_lang"),
            text.predicted_lang_expr().alias("predicted_lang"),
        )
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "doc_fingerprints",
    f"""
    SELECT doc_id,
           len(toks) AS n_tokens,
           -- CASE: DuckDB's list_prepend(0, NULL) yields [0] (fingerprint
           -- 0) where Spark's aggregate(NULL, ...) yields NULL — a NULL
           -- doc must fingerprint NULL in both engines
           CASE WHEN toks IS NULL THEN NULL ELSE
           list_reduce(
               list_prepend(0::BIGINT,
                   list_transform(toks, t -> {D_HASH32.format(t='t')})),
               (acc, c) -> (acc * {FINGERPRINT_BASE} + c) % {FINGERPRINT_MOD}
           ) END AS fingerprint
    FROM (SELECT *, {D_TOKS} AS toks FROM documents)
    """,
    doc="order-sensitive rolling polynomial fingerprint over token hashes",
)
def q_doc_fingerprints(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count().alias("n_tokens"),
        text.doc_fingerprint().alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


@register(
    "exact_dedup_groups",
    """
    SELECT md5(text) AS text_hash,
           count(*) AS n_copies,
           min(doc_id) AS canonical_doc_id
    FROM documents GROUP BY 1
    """,
    doc="exact dedup via content-hash groupBy (one shuffle on md5)",
)
def q_exact_dedup_groups(spark, sf_dir):
    return dedup.exact_dedup_groups(_t(spark, sf_dir, "documents"))


# Mirrors dedup.minhash_signatures: one 32-bit md5 base hash per shingle
# (column `sh.h`), then per-permutation affine transforms — exact int64
# arithmetic, bit-identical across engines.
_SIG_COLS = ",\n        ".join(
    f"list_min(list_transform(h, x -> ({dedup.MINHASH_A[j]} * x"
    f" + {dedup.MINHASH_B[j]}) % {dedup.MINHASH_P})) AS sig{j}"
    for j in range(dedup.N_PERMS)
)
# banded LSH, BAND_R=2 rows per band (mirrors dedup.lsh_band_rows):
# band j's bucket key is the PAIR (sig_{2j}, sig_{2j+1}), carried as
# two columns so bucket equality is exact tuple equality
_B1_CASE = "CASE j.band " + " ".join(
    f"WHEN {j} THEN sig{dedup.BAND_R * j}" for j in range(dedup.N_BANDS)
) + " END"
_B2_CASE = "CASE j.band " + " ".join(
    f"WHEN {j} THEN sig{dedup.BAND_R * j + 1}" for j in range(dedup.N_BANDS)
) + " END"
_BAND_VALUES = ", ".join(f"({j})" for j in range(dedup.N_BANDS))
_AGREE = " + ".join(
    f"(CASE WHEN x.sig{j} = y.sig{j} THEN 1 ELSE 0 END)"
    for j in range(dedup.N_PERMS)
)


# Shared CTE chain: documents → per-token md5 hashes → polynomial
# shingle hashes → minhash signatures → banded buckets → candidate
# pairs with agreement estimate.  Mirrors dedup.minhash_signatures
# step for step (same constants); reused by the candidates query and
# the clustering query.
_MINHASH_CTES = f"""t AS (SELECT doc_id, {D_TOKS} AS toks FROM documents),
    tk AS (SELECT doc_id,
                  list_transform(toks, t -> {D_HASH32.format(t='t')}) AS th
           FROM t WHERE len(toks) >= 3),
    sh AS (SELECT doc_id,
                  list_transform(range(1, len(th) - 1),
                      i -> (((th[i] * {dedup.SHINGLE_B} + th[i + 1])
                             % {dedup.MINHASH_P}) * {dedup.SHINGLE_B} + th[i + 2])
                           % {dedup.MINHASH_P}) AS h
           FROM tk),
    sig AS (SELECT doc_id,
        {_SIG_COLS}
        FROM sh),
    bk0 AS (SELECT doc_id, j.band, {_B1_CASE} AS b1, {_B2_CASE} AS b2
            FROM sig, (VALUES {_BAND_VALUES}) j(band)),
    -- skew guard, mirroring dedup.minhash_candidates: buckets wider
    -- than MAX_BUCKET_WIDTH are boilerplate and join nothing
    bk AS (SELECT bk0.* FROM bk0
           WHERE NOT EXISTS (
               SELECT 1 FROM bk0 h
               WHERE h.band = bk0.band AND h.b1 = bk0.b1 AND h.b2 = bk0.b2
               GROUP BY h.band, h.b1, h.b2
               HAVING count(*) > {dedup.MAX_BUCKET_WIDTH})),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bk a JOIN bk b
             ON a.band = b.band AND a.b1 = b.b1 AND a.b2 = b.b2
             AND a.doc_id < b.doc_id),
    pairs AS (SELECT doc_a, doc_b,
                     round(({_AGREE}) / {float(dedup.N_PERMS)}, 4) AS est_jaccard
              FROM cand
              JOIN sig x ON x.doc_id = doc_a
              JOIN sig y ON y.doc_id = doc_b)"""


@register(
    "minhash_dedup_candidates",
    f"""
    WITH {_MINHASH_CTES}
    SELECT doc_a, doc_b, est_jaccard FROM pairs
    ORDER BY est_jaccard DESC, doc_a, doc_b
    LIMIT 1000
    """,
    doc="MinHash-LSH near-dup candidates: shingle→12 minhash perms→banded "
    "bucket equi-join (cost ∝ collisions, not n²) + signature-agreement "
    "jaccard estimate",
    bench=True,
)
def q_minhash_dedup_candidates(spark, sf_dir):
    return dedup.minhash_candidates(_t(spark, sf_dir, "documents"))


CLUSTER_MIN_EST = 0.5


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_MINHASH_CTES},
    strong AS (SELECT doc_a, doc_b FROM pairs WHERE est_jaccard >= {CLUSTER_MIN_EST}),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM strong
              UNION SELECT doc_b, doc_a FROM strong),
    reach(node, label) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.v, r.label FROM reach r JOIN edges e
        ON e.u = r.node WHERE r.label < e.v
    )
    SELECT node AS doc_id, min(label) AS component
    FROM reach GROUP BY node
    """,
    doc="iterative dedup clustering: strong MinHash pairs (est >= "
    f"{CLUSTER_MIN_EST}) → connected components by distributed min-label "
    "propagation (operators/graph.py; oracle = recursive CTE) — near-dup "
    "PAIRS become duplicate GROUPS with a canonical min-doc_id label",
    tags=("iterative",),
)
def q_dedup_clusters(spark, sf_dir):
    from realtime_data_pipeline_spark.operators.graph import connected_components

    edges = dedup.minhash_candidates(
        _t(spark, sf_dir, "documents"), limit=None, min_est_jaccard=CLUSTER_MIN_EST
    )
    cc = connected_components(edges, "doc_a", "doc_b")
    return cc.select(F.col("node").alias("doc_id"), "component")


@register(
    "simhash_near_dups",
    f"""
    WITH t AS (SELECT doc_id, {D_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id,
          CAST(list_sum(list_transform(range(0, {dedup.SIMHASH_BITS}),
               b -> CASE WHEN list_sum(list_transform(toks,
                             tk -> ((('0x' || substr(md5(tk), 1, 15))::BIGINT >> b) & 1) * 2 - 1)) > 0
                    THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS simhash
          FROM t)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming_dist
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    -- signature-0 (NULL-text) degenerates are excluded from pairing in
    -- BOTH engines (see simhash_near_pairs' degenerate-doc guard)
    WHERE a.simhash <> 0 AND b.simhash <> 0
      AND bit_count(xor(a.simhash, b.simhash)) <= {dedup.SIMHASH_MAX_HAMMING}
    ORDER BY hamming_dist, doc_a, doc_b
    LIMIT 1000
    """,
    doc="SimHash near-dups: 60-bit frequency-weighted signatures, pairs "
    f"within Hamming distance {dedup.SIMHASH_MAX_HAMMING} (the WWW'07 "
    "operating point) via generalized-pigeonhole chunk-PAIR bucketing — "
    "d differing bits leave >=2 of d+2 chunks untouched, so a 24-bit "
    "2-chunk combo key gives recall 1.0 with 2^-24 random collision, "
    "never all-pairs (the oracle brute-forces; the engine may not)",
)
def q_simhash_near_dups(spark, sf_dir):
    df = dedup.simhash_near_pairs(_t(spark, sf_dir, "documents"))
    return df.withColumn("hamming_dist", F.col("hamming_dist").cast("int"))


@register(
    "ngram_jaccard_pairs",
    f"""
    WITH {_MINHASH_CTES},
    -- exact verify stage: distinct shingle sets per doc (same `sh`
    -- hash chain the signatures derive from), intersected per LSH
    -- candidate pair
    ss AS (SELECT doc_id, list_distinct(h) AS s FROM sh),
    sz AS (SELECT doc_id, s, len(s) AS n FROM ss),
    jp AS (SELECT c.doc_a, c.doc_b,
                  len(list_intersect(x.s, y.s)) AS shared,
                  x.n AS na, y.n AS nb
           FROM cand c
           JOIN sz x ON x.doc_id = c.doc_a
           JOIN sz y ON y.doc_id = c.doc_b)
    SELECT doc_a, doc_b,
           round(CAST(shared AS DOUBLE) / (na + nb - shared), 4) AS jaccard
    FROM jp
    WHERE round(CAST(shared AS DOUBLE) / (na + nb - shared), 4) >= 0.02
    ORDER BY jaccard DESC, doc_a, doc_b
    LIMIT 1000
    """,
    doc="EXACT n-gram Jaccard over MinHash-LSH candidate pairs — the "
    "verify stage on the sublinear generator (r=2×6 banded buckets, "
    "width-capped).  Re-scoped in round 10: the previous shared-rare-"
    "shingle generation (posting df <= 128) measured 15.75x time on a "
    "4x doc step on Heaps-law vocabularies (SOAK_r09_ngram4x.json) — "
    "Σ C(df,2) candidate mass is ~quadratic in corpus size there, so "
    "that operator cannot exist at 100 TB.  Jaccard is exact over the "
    "FULL distinct shingle sets (int64 polynomial token-hashes), never "
    "the signature estimate; recall follows the MMDS S-curve "
    "(J=0.8 -> ~99.8%, J=0.1 -> ~6%)",
)
def q_ngram_jaccard_pairs(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_D_DOT = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
)
_D_NORM = (
    "sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))), (x, y) -> x + y))"
)
_D_E = f"SELECT vec_id, label, embedding, {_D_NORM.format(a='embedding')} AS nrm FROM embeddings"
_D_COS = (
    _D_DOT.format(a="q.embedding", b="c.embedding") + " / (q.nrm * c.nrm)"
)


@register(
    "ann_bruteforce_topk",
    f"""
    WITH e AS ({_D_E}),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_D_COS} AS cs
          FROM e q JOIN e c ON q.vec_id < 8 AND c.vec_id != q.vec_id)
    SELECT query_id, neighbor_id, rnk, round(cs, 6) AS cos_sim
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cs DESC, neighbor_id) AS rnk
          FROM p)
    WHERE rnk <= 10
    """,
    doc="exact cosine top-10: broadcast query set × all candidates, "
    "bit-identical sequential-fold arithmetic in both engines",
    bench=True,
)
def q_ann_bruteforce_topk(spark, sf_dir):
    return similarity.brute_force_topk(
        _t(spark, sf_dir, "embeddings"), F.col("vec_id") < 8, k=10
    )


@register(
    "ann_ivf_assigned_topk",
    f"""
    WITH e AS ({_D_E}),
    cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb, nrm AS cent_nrm
              FROM e WHERE vec_id >= 8 AND vec_id < 16),
    scored AS (SELECT v.vec_id, c.cent_id,
                      round({_D_DOT.format(a='v.embedding', b='c.cent_emb')}
                            / (v.nrm * c.cent_nrm), 6) AS cc
               FROM e v, cents c),
    asg AS (SELECT vec_id, cent_id AS cell
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                               ORDER BY cc DESC, cent_id) AS rn
                  FROM scored)
            WHERE rn = 1),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 qa.cell, {_D_COS} AS cs
          FROM e q JOIN asg qa ON qa.vec_id = q.vec_id
          JOIN asg ca ON ca.cell = qa.cell
          JOIN e c ON c.vec_id = ca.vec_id AND c.vec_id != q.vec_id
          WHERE q.vec_id < 8)
    SELECT query_id, neighbor_id, cell, rnk, round(cs, 6) AS cos_sim
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cs DESC, neighbor_id) AS rnk
          FROM p)
    WHERE rnk <= 5
    """,
    doc="IVF with REAL centroid assignment: vectors 8-15 form the codebook "
    "(stand-in for offline k-means), every vector argmax-assigns to its "
    "nearest centroid over a BROADCAST codebook (max_by on rounded "
    "cosine, centroid-id tie-break — deterministic cross-engine), then "
    "the ANN probe equi-joins on the assigned cell and reranks exactly — "
    "closes the ann_ivf_topk_by_label gap where `label` was precomputed",
)
def q_ann_ivf_assigned_topk(spark, sf_dir):
    return similarity.ivf_assigned_topk(
        _t(spark, sf_dir, "embeddings"),
        F.col("vec_id") < 8,
        (F.col("vec_id") >= 8) & (F.col("vec_id") < 16),
        k=5,
    )


IVF_NPROBE = 3


def _ivf_cent_pred():
    return (F.col("vec_id") >= 8) & (F.col("vec_id") < 16)


# shared CTE stack for the nprobe oracle (also embedded in
# ann_recall_report): centroid scores → argmax cell per vector →
# top-nprobe probe cells per query
_D_IVF_CTES = f"""cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb,
                     nrm AS cent_nrm
              FROM e WHERE vec_id >= 8 AND vec_id < 16),
    iscored AS (SELECT v.vec_id, c.cent_id,
                       round({_D_DOT.format(a='v.embedding', b='c.cent_emb')}
                             / (v.nrm * c.cent_nrm), 6) AS cc
                FROM e v, cents c),
    iasg AS (SELECT vec_id, cent_id AS cell
             FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                                ORDER BY cc DESC, cent_id) AS rn
                   FROM iscored)
             WHERE rn = 1),
    iqp AS (SELECT vec_id, cent_id AS probe_cell
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                               ORDER BY cc DESC, cent_id) AS rn
                  FROM iscored WHERE vec_id < 8)
            WHERE rn <= {IVF_NPROBE}),
    ivfc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    {{cos}} AS cs
             FROM e q JOIN iqp ON iqp.vec_id = q.vec_id
             JOIN iasg ca ON ca.cell = iqp.probe_cell
             JOIN e c ON c.vec_id = ca.vec_id AND c.vec_id != q.vec_id)"""


@register(
    "ann_ivf_multiprobe_topk",
    f"""
    WITH e AS ({_D_E}),
    {_D_IVF_CTES.format(cos=_D_COS)}
    SELECT query_id, neighbor_id, rnk, round(cs, 6) AS cos_sim
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cs DESC, neighbor_id) AS rnk
          FROM ivfc)
    WHERE rnk <= 5
    """,
    doc=f"IVF with nprobe={IVF_NPROBE} (the faiss recall lever): each "
    "query probes its top-3 nearest cells instead of only the argmax "
    "cell, recovering neighbors that sit just across a cell boundary. "
    "Index side unchanged (one argmax cell per vector, broadcast "
    "codebook); only the tiny query side fans out x3, and the probe "
    "stays a bounded cell equi-join + exact rerank",
)
def q_ann_ivf_multiprobe_topk(spark, sf_dir):
    return similarity.ivf_multiprobe_topk(
        _t(spark, sf_dir, "embeddings"),
        F.col("vec_id") < 8,
        _ivf_cent_pred(),
        k=5,
        nprobe=IVF_NPROBE,
    )


_D_PLANE = (
    "(('0x' || substr(md5('hp_' || p || '_' || d), 1, 15))::BIGINT"
    " / CAST(576460752303423488 AS DOUBLE) - 1.0)"
)
_D_BUCKET = f"""CAST(list_sum(list_transform(range(0, {similarity.N_PLANES}),
    p -> CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
                  list_transform(range(1, {similarity.DIM + 1}),
                      d -> CAST(embedding[d] AS DOUBLE) * {_D_PLANE})),
                  (a, x) -> a + x) > 0
         THEN (1::BIGINT << p) ELSE 0::BIGINT END)) AS BIGINT)"""


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@register(
    "multimodal_byte_histogram",
    # BYTE-exact oracle (late r7; the old form counted CHARACTERS via
    # regexp classes — correct only for ASCII payloads, diverging on
    # the unicode fixture): hex(encode(text)) lays the UTF-8 bytes out
    # as hex pairs, the high nibble at odd position p IS the byte's
    # bucket (>> 6), so each bucket is a nibble-membership count.
    """
    WITH h AS (SELECT lang, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS nb
               FROM documents),
    d AS (SELECT lang,
                 coalesce(list_sum(list_transform(range(1, 2*nb, 2),
                     p -> CASE WHEN substr(hx, p, 1) IN ('0','1','2','3')
                               THEN 1 ELSE 0 END)), 0) AS b0,
                 coalesce(list_sum(list_transform(range(1, 2*nb, 2),
                     p -> CASE WHEN substr(hx, p, 1) IN ('4','5','6','7')
                               THEN 1 ELSE 0 END)), 0) AS b1,
                 coalesce(list_sum(list_transform(range(1, 2*nb, 2),
                     p -> CASE WHEN substr(hx, p, 1) IN ('8','9','A','B')
                               THEN 1 ELSE 0 END)), 0) AS b2,
                 coalesce(list_sum(list_transform(range(1, 2*nb, 2),
                     p -> CASE WHEN substr(hx, p, 1) IN ('C','D','E','F')
                               THEN 1 ELSE 0 END)), 0) AS b3
          FROM h)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(b0) AS BIGINT) AS b0, CAST(sum(b1) AS BIGINT) AS b1,
           CAST(sum(b2) AS BIGINT) AS b2, CAST(sum(b3) AS BIGINT) AS b3
    FROM d GROUP BY lang
    """,
    doc="multimodal plumbing: opaque binary payload + metadata struct, "
    "Arrow-batched mapInPandas feature extraction (byte-bucket histogram), "
    "rollup by metadata — decode stubbed (no codecs in container), "
    "oracle recomputes the histogram over the payload's UTF-8 BYTES "
    "(hex-pair nibble counts), exact for any unicode payload",
)
def q_multimodal_byte_histogram(spark, sf_dir):
    docs = multimodal.attach_media(_t(spark, sf_dir, "documents"))
    return multimodal.byte_histogram_by_lang(docs)


@register(
    "multimodal_frame_stats",
    # BYTE-exact oracle (late r7): frame geometry and energy over the
    # UTF-8 byte stream via hex pairs — byte i lives at hex position
    # 2i+1 — replacing the old per-CHARACTER ord() form that was exact
    # only for ASCII payloads.
    f"""
    WITH h AS (SELECT lang, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS nb
               FROM documents),
    d AS (SELECT lang,
                 (coalesce(nb, 0) + {multimodal.FRAME_STRIDE - 1})
                     // {multimodal.FRAME_STRIDE} AS n_frames,
                 coalesce(list_sum(list_transform(range(0, nb),
                     i -> CASE WHEN (i % {multimodal.FRAME_STRIDE})
                                    < {multimodal.FRAME_BYTES}
                               THEN ('0x' || substr(hx, 2*i + 1, 2))::BIGINT
                               ELSE 0 END)), 0) AS energy
          FROM h)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_frames) AS BIGINT) AS total_frames,
           CAST(sum(energy) AS BIGINT) AS total_energy
    FROM d GROUP BY lang
    """,
    doc="multimodal frame-sampling plumbing: strided fixed-width windows "
    "over the binary payload (every 64 bytes, sample 32) in an Arrow "
    "mapInPandas kernel — the video-frame-extraction shape with a "
    "codec-free deterministic kernel; rollup by metadata lang",
)
def q_multimodal_frame_stats(spark, sf_dir):
    docs = multimodal.attach_media(_t(spark, sf_dir, "documents"))
    return multimodal.frame_stats_by_lang(docs)


@register(
    "multimodal_audio_stats",
    # BYTE-exact oracle (late r7): PCM amplitudes from the UTF-8 byte
    # stream via hex pairs, not per-character ord() — exact for any
    # unicode payload.
    f"""
    WITH hh AS (
        SELECT lang, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents WHERE text IS NOT NULL),
    s AS (
        SELECT lang, n,
               list_transform(range(0, n),
                   i -> ('0x' || substr(hx, 2*i + 1, 2))
                            ::BIGINT - {multimodal.PCM_CENTER})
                   AS a
        FROM hh),
    d AS (
        SELECT lang, n,
               coalesce(list_sum(list_transform(a, x -> x * x)), 0) AS pw,
               coalesce(list_sum(list_transform(range(1, n),
                   p -> CASE WHEN (a[p] < 0) != (a[p + 1] < 0)
                             THEN 1 ELSE 0 END)), 0) AS zc
        FROM s)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_samples,
           CAST(sum(pw) AS BIGINT) AS total_sq_power,
           CAST(sum(zc) AS BIGINT) AS total_zero_crossings,
           CASE WHEN sum(n) > 0
                THEN round(CAST(sum(pw) AS DOUBLE) / sum(n), 4)
           END AS mean_sq_power
    FROM d GROUP BY lang
    """,
    doc="audio-DSP plumbing with a codec-free kernel "
    "(functions/multimodal.audio_signal_stats): the binary payload "
    "read as PCM samples (amplitude = byte - PCM_CENTER), exact "
    "integer squared-power sums and zero-crossing counts per payload "
    "via vectorized numpy in mapInPandas, rolled up per language — "
    "the signal-statistics complement to the strided frame sampler.  "
    "All outputs are integer sums (hash-exact) except one rounded "
    "mean division; a real deployment swaps the kernel for a "
    "soundfile/librosa decode in the same Arrow slot",
)
def q_multimodal_audio_stats(spark, sf_dir):
    docs = multimodal.attach_media(
        _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    )
    return multimodal.audio_stats_by_lang(docs)


@register(
    "multimodal_decode_stats",
    # The REAL-decoder hash row (r11 verdict #3): payloads are
    # synthesized from planted integer formulas (functions/multimodal
    # planted_* — the SAME constants interpolated below), encoded with
    # the spec-level encoders into genuine WAV/P6/BMP/y4m bytes that
    # cross an Arrow binary-column boundary, then decoded with
    # decode_wav/decode_ppm/decode_bmp/sample_frames; every output is
    # computed from the DECODED arrays.  The oracle recomputes the
    # stats from the planted formulas directly — a decoder bug (wrong
    # stride, missed row flip, bad plane size, chunk misparse) breaks
    # the value hash.  Position-weighted checksums (value * (index+1))
    # catch permutation bugs plain sums cannot.  doc_id >= 0 keeps
    # Python % and DuckDB % in agreement on hostile fixtures.
    f"""
    WITH d AS (SELECT doc_id,
                      16 + doc_id % 32 AS wav_n,
                      (4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS ppm_len,
                      (3 + doc_id % 4) * (2 + doc_id % 3) * 3 AS bmp_len,
                      3 + doc_id % 3 AS nf,
                      (4 + 2*(doc_id % 3)) * (2 + 2*(doc_id % 2)) AS wh,
                      (5 + doc_id % 4) * (3 + doc_id % 3) * 3 AS qoi_len,
                      6 + doc_id % 5 AS png_w,
                      (4 + doc_id % 3) * (6 + doc_id % 5) * 3 AS png_len
               FROM documents
               WHERE doc_id IS NOT NULL AND doc_id >= 0)
    SELECT doc_id,
           CAST({multimodal.WAV_RATE_BASE} + {multimodal.WAV_RATE_STEP}
                * (doc_id % 7) AS BIGINT) AS wav_rate,
           CAST(1 AS BIGINT) AS wav_channels,
           CAST(wav_n AS BIGINT) AS wav_n,
           CAST(list_sum(list_transform(range(0, wav_n),
               i -> ((doc_id*{multimodal.WAV_MUL_A} + i*{multimodal.WAV_MUL_B})
                     % 65536 - 32768) * (i+1))) AS BIGINT) AS wav_wsum,
           CAST(list_sum(list_transform(range(0, ppm_len),
               j -> ((doc_id*{multimodal.PPM_MUL_A} + j*{multimodal.PPM_MUL_B})
                     % 256) * (j+1))) AS BIGINT) AS ppm_wsum,
           CAST(list_sum(list_transform(range(0, bmp_len),
               j -> ((doc_id*{multimodal.BMP_MUL_A} + j*{multimodal.BMP_MUL_B})
                     % 256) * (j+1))) AS BIGINT) AS bmp_wsum,
           CAST((nf + {multimodal.Y4M_EVERY_N - 1})
                // {multimodal.Y4M_EVERY_N} AS BIGINT) AS y4m_frames,
           CAST(list_sum(list_transform(range(0, nf),
               f -> CASE WHEN f % {multimodal.Y4M_EVERY_N} = 0 THEN
                      list_sum(list_transform(range(0, wh),
                          p -> ((doc_id*{multimodal.Y4M_MUL_A}
                                 + f*{multimodal.Y4M_MUL_B}
                                 + p*{multimodal.Y4M_MUL_C}) % 256) * (p+1)))
                    ELSE 0 END)) AS BIGINT) AS y4m_wsum,
           CAST(list_sum(list_transform(range(0, qoi_len),
               j -> ((doc_id*{multimodal.QOI_MUL_A}
                      + (j // 9)*{multimodal.QOI_MUL_B}
                      + (j % 3)*{multimodal.QOI_MUL_C}) % 256)
                    * (j+1))) AS BIGINT) AS qoi_wsum,
           CAST(list_sum(list_transform(range(0, png_len),
               j -> ((doc_id*{multimodal.PNG_MUL_A}
                      + (j // (3*png_w))*{multimodal.PNG_MUL_B}
                      + ((j // 3) % png_w)*{multimodal.PNG_MUL_C}
                      + (j % 3)*{multimodal.PNG_MUL_D}) % 256)
                    * (j+1))) AS BIGINT) AS png_wsum
    FROM d
    """,
    doc="decode round-trip hash row: planted payloads encoded to real "
    "WAV PCM / netpbm P6 / 24-bit BMP / YUV4MPEG2 / QOI / PNG bytes, "
    "shipped as Arrow binary columns, decoded by the pure-numpy "
    "decoders, stats computed from the decoded arrays (functions/"
    "multimodal.py decode_wav/decode_ppm/decode_bmp/sample_frames/"
    "decode_qoi/decode_png) — the DuckDB hash now proves the "
    "decoders, not just pytest.  The QOI leg (r13) put a genuinely "
    "COMPRESSED format under the hash; the PNG leg (r14) puts an "
    "ENTROPY-CODED one there: stdlib zlib inflation + per-row "
    "None/Sub/Up/Average/Paeth unfiltering chosen by the real "
    "min-abs-sum heuristic over planted gradients, so the hash "
    "proves the unfilter state machine and the chunk/CRC walk. "
    "0 shuffles: two chained mapInPandas stages, partition-parallel, "
    "no aggregation",
)
def q_multimodal_decode_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull() & (F.col("doc_id") >= 0)
    )
    return multimodal.decode_media_stats(
        multimodal.synthesize_media_payloads(docs)
    )


@register(
    "ann_pandas_topk",
    f"""
    WITH e AS ({_D_E}),
    p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round({_D_COS}, 6) AS cos_sim
          FROM e q JOIN e c ON q.vec_id < 8 AND c.vec_id != q.vec_id)
    SELECT query_id, neighbor_id, rnk, cos_sim
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM p)
    WHERE rnk <= 10
    """,
    doc="the Arrow/pandas-UDF scoring path: same join/rank plan as "
    "ann_bruteforce_topk but the cosine kernel is vectorized numpy over "
    "Arrow batches — the pattern for metrics built-ins can't express; "
    "ranking on the rounded score keeps cross-engine determinism",
)
def q_ann_pandas_topk(spark, sf_dir):
    return similarity.pandas_topk(
        _t(spark, sf_dir, "embeddings"), F.col("vec_id") < 8, k=10
    )


# NULL-label/embedding rows dropped on both sides, mirroring
# similarity._labeled_pairs — Spark groupBy buckets NULL keys, a SQL
# equi-join drops them; filtering up front keeps both engines agreeing
# by construction even if a regenerated fixture gains such rows.
_D_LP = f"""
    e0 AS ({_D_E}),
    e AS (SELECT * FROM e0
          WHERE label IS NOT NULL AND embedding IS NOT NULL),
    lp AS (SELECT q.vec_id AS query_id, q.label AS true_label,
                  c.vec_id AS neighbor_id, c.label AS n_label, {_D_COS} AS cs
           FROM e q JOIN e c ON q.vec_id < 64 AND c.vec_id != q.vec_id)"""


@register(
    "knn_label_consistency",
    f"""
    WITH {_D_LP},
    nn AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                              ORDER BY cs DESC, neighbor_id) AS rnk
                          FROM lp) WHERE rnk <= 5),
    v AS (SELECT query_id, true_label, n_label, count(*) AS n_votes
          FROM nn GROUP BY 1, 2, 3)
    SELECT query_id, true_label, n_label AS predicted_label, n_votes,
           CAST(CASE WHEN n_label = true_label THEN 1 ELSE 0 END AS INT)
               AS consistent
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY n_votes DESC, n_label) AS rn FROM v)
    WHERE rn = 1
    """,
    doc="embedding-quality audit: 5-NN majority-vote label vs actual per "
    "query vector — broadcast query batch, ONE corpus scan, every "
    "post-broadcast exchange clustered by query_id (rank window, vote "
    "rollup, winner window reuse one partitioning); deterministic ties "
    "(cs DESC, neighbor_id) / (votes DESC, label)",
)
def q_knn_label_consistency(spark, sf_dir):
    return similarity.knn_label_votes(
        _t(spark, sf_dir, "embeddings"), F.col("vec_id") < 64, k=5
    )


@register(
    "hard_negative_report",
    f"""
    WITH {_D_LP},
    r AS (SELECT *, row_number() OVER (
              PARTITION BY query_id, (n_label = true_label)
              ORDER BY cs DESC, neighbor_id) AS rn
          FROM lp),
    pos AS (SELECT query_id, neighbor_id AS pos_id, cs AS cs_pos
            FROM r WHERE n_label = true_label AND rn = 1),
    neg AS (SELECT query_id, neighbor_id AS neg_id, cs AS cs_neg
            FROM r WHERE n_label != true_label AND rn = 1),
    base AS (SELECT DISTINCT query_id, true_label AS label FROM lp)
    SELECT b.query_id, b.label, p.pos_id, n.neg_id,
           round(p.cs_pos, 6) AS cos_pos, round(n.cs_neg, 6) AS cos_neg,
           round(p.cs_pos - n.cs_neg, 6) AS margin,
           CAST(CASE WHEN n.cs_neg > p.cs_pos THEN 1 ELSE 0 END AS INT)
               AS violation
    FROM base b
    LEFT JOIN pos p ON p.query_id = b.query_id
    LEFT JOIN neg n ON n.query_id = b.query_id
    """,
    doc="contrastive-training triplet mining: per anchor the nearest "
    "same-label positive, the hardest other-label negative, and the "
    "margin; violation=1 anchors are the triplets a trainer mines and "
    "the rows a label auditor reads first.  One broadcast pair pass + "
    "one groupBy with conditional struct-max argmax (map-side partial; "
    "the exchange carries 2 structs/anchor, never the pair set)",
)
def q_hard_negative_report(spark, sf_dir):
    return similarity.hard_negative_margins(
        _t(spark, sf_dir, "embeddings"), F.col("vec_id") < 64
    )


@register(
    "corpus_curation_stats",
    f"""
    WITH RECURSIVE {_MINHASH_CTES},
    strong AS (SELECT doc_a, doc_b FROM pairs WHERE est_jaccard >= {CLUSTER_MIN_EST}),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM strong
              UNION SELECT doc_b, doc_a FROM strong),
    reach(node, label) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.v, r.label FROM reach r JOIN edges e
        ON e.u = r.node WHERE r.label < e.v
    ),
    cc AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
    near_dupes AS (SELECT node FROM cc WHERE component != node),
    exact_canon AS (
        SELECT doc_id,
               doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canon
        FROM documents
    ),
    kept AS (
        SELECT d.doc_id, d.lang, d.text, {D_TOKS} AS toks
        FROM documents d
        JOIN exact_canon e ON e.doc_id = d.doc_id AND e.is_canon
        LEFT JOIN near_dupes nd ON nd.node = d.doc_id
        WHERE nd.node IS NULL
    ),
    scored AS (
        SELECT lang, len(toks) AS n_tokens,
               round(0.4 * least(len(toks) / 100.0, 1.0)
                     + 0.4 * (1.0 - CAST(len(list_filter(toks, t -> list_contains([{_ALL_STOP}], t))) AS DOUBLE)
                                    / CAST(len(toks) AS DOUBLE))
                     + 0.2 * least((CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                                    / CAST(len(toks) AS DOUBLE)) / 8.0, 1.0),
                     4) AS quality
        FROM kept
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(sum(CAST(quality AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*), 4) AS avg_quality
    FROM scored
    WHERE quality >= 0.5
    GROUP BY lang
    """,
    doc="the LLM training-data curation pipeline END TO END: exact dedup "
    "(keep min-doc_id per content hash) → near-dup removal (MinHash-LSH "
    "pairs → connected components, drop non-canonical members) → quality "
    "filter (score >= 0.5) → per-language corpus stats.  One query "
    "composing dedup.py + graph.py + text.py, fully oracle-checked",
    bench=True,
    tags=("pipeline",),
)
def q_corpus_curation_stats(spark, sf_dir):
    from pyspark.sql import Window

    from realtime_data_pipeline_spark.operators.graph import connected_components

    # widen="cpu" (r14): the content hash AND the quality metrics are
    # heavyweight per-row map work — spread the serialized test scan
    # (no-op at real scan parallelism; minhash_candidates' own keyed
    # repartition collapses over it downstream).
    docs = _t(spark, sf_dir, "documents", widen="cpu")

    # Near-dup removal: every cluster member except the canonical
    # (min-doc_id) node.
    strong = dedup.minhash_candidates(
        docs, limit=None, min_est_jaccard=CLUSTER_MIN_EST
    )
    cc = connected_components(strong, "doc_a", "doc_b")
    near_dupes = cc.where(F.col("component") != F.col("node")).select(
        F.col("node").alias("doc_id")
    )

    # r14: compute the content hash AND the quality metrics MAP-SIDE,
    # before the exact-dedup window exchange — the shuffle then
    # carries (doc_id, lang, hash, n_tokens, quality) instead of full
    # document text (guide §2.3 "project before the exchange"), and
    # the scoring runs at scan parallelism instead of inside the
    # post-shuffle (AQE-coalesced) window stage.  Values are
    # identical: quality per row does not depend on which rows
    # survive dedup.
    pre = docs.select(
        "doc_id",
        "lang",
        F.md5(F.col("text").cast("binary")).alias("__h"),
        text.token_count().alias("n_tokens"),
        text.quality_score().alias("quality"),
    )

    # Exact dedup: keep the min doc_id of each identical-text group.
    w = Window.partitionBy("__h")
    kept = (
        pre.withColumn("is_canon", F.col("doc_id") == F.min("doc_id").over(w))
        .where("is_canon")
        .join(near_dupes, "doc_id", "left_anti")
    )

    scored = kept.select("lang", "n_tokens", "quality")
    return (
        scored.where(F.col("quality") >= 0.5)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            # quality is round(·,4) per row → the decimal(18,4) cast is
            # exact; decimal-sum/count is partition-order independent,
            # avg(double) is not.
            F.round(
                F.sum(F.col("quality").cast("decimal(18,4)")).cast("double")
                / F.count("*"),
                4,
            ).alias("avg_quality"),
        )
    )


@register(
    "embedding_near_dups_lsh",
    f"""
    WITH e AS (SELECT vec_id, embedding,
                      {_D_NORM.format(a='embedding')} AS nrm,
                      {_D_BUCKET} AS bucket
               FROM embeddings),
    -- Spark runs this as a multi-probe EQUI-join (probe = bucket ^ one
    -- bit); candidate-set semantics are exactly "signatures within
    -- Hamming distance 1", which the oracle states directly.
    p AS (SELECT q.vec_id AS vec_a, c.vec_id AS vec_b,
                 round({_D_COS}, 6) AS cos_sim
          FROM e q JOIN e c
          ON bit_count(xor(q.bucket, c.bucket)) <= 1 AND q.vec_id < c.vec_id)
    SELECT vec_a, vec_b, cos_sim FROM p
    WHERE cos_sim >= 0.45
    ORDER BY cos_sim DESC, vec_a, vec_b
    LIMIT 500
    """,
    doc="embedding near-dups at the 100 TB shuffle shape: pair join is an "
    "equi-join on the LSH sign bucket (cost ∝ Σ bucket², never n²); "
    "recall traded for scalability vs embedding_near_dups",
)
def q_embedding_near_dups_lsh(spark, sf_dir):
    return similarity.near_dup_pairs_lsh(
        _t(spark, sf_dir, "embeddings"), min_cosine=0.45
    )


_D_PROBES = ", ".join(["(-1)"] + [f"({p})" for p in range(similarity.N_PLANES)])


@register(
    "tfidf_top_terms",
    f"""
    WITH tok AS (SELECT doc_id, unnest({D_TOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf
           FROM tok GROUP BY doc_id, token),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 4)
                   AS tfidf
        FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    )
    SELECT doc_id, token, rnk, tfidf
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, token) AS rnk
          FROM scored)
    WHERE rnk <= 3
    """,
    doc="TF-IDF top-3 terms per document: term counts → document "
    "frequency (one shuffle each) → smoothed-idf score → per-doc rank. "
    "Ranking uses the ROUNDED score + token tie-break so cross-engine "
    "1-ulp ln() differences cannot flip ranks",
)
def q_tfidf_top_terms(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    # persist: tf feeds BOTH the document-frequency rollup and the
    # score join — without it the tokenize+explode+count subtree (the
    # expensive part: one row per token occurrence) executes twice.
    # At 100 TB this is a materialized term-frequency table.
    # Lifecycle: the returned plan is lazy, so this can't be eagerly
    # unpersisted here; repeated callers in one session rely on LRU
    # block eviction (bench.py clearCache()s between timed runs).
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf")).persist()
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    # MERGE hint (r7 broadcast audit): the df map is VOCAB-scaled and
    # its static size estimate is explode-derived garbage — on a real
    # corpus (billions of distinct tokens) a mis-planned broadcast is
    # a driver OOM; the 1-row n_docs broadcast stays explicit.
    scored = (
        tf.join(df.hint("merge"), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
                    )
                    + 1.0
                ),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "token", "rnk", "tfidf")
    )


_FREQ_PHI = 0.005


@register(
    "frequent_terms_report",
    f"""
    WITH t AS (SELECT unnest({D_TOKS}) AS term FROM documents
               WHERE text IS NOT NULL),
    n AS (SELECT count(*) AS n_tok FROM t),
    c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1)
    SELECT term, cnt,
           round(CAST(cnt AS DOUBLE) / CAST(n_tok AS DOUBLE), 6) AS share
    FROM c, n
    WHERE CAST(cnt AS DOUBLE) >= {_FREQ_PHI} * n_tok
    """,
    doc="exact heavy hitters (frequency >= 0.5% of all tokens) via the "
    "2-pass Misra-Gries shape (functions/sketches.py): pass 1 is a "
    "zero-shuffle Arrow-batch MG sketch (O(capacity) executor state, "
    "no-false-negative guarantee), pass 2 broadcast-semi-joins the "
    "candidate union so the count shuffle carries only head terms, "
    "never the long tail — the 100 TB alternative to shuffling the "
    "full vocabulary; final counts exact, so batching never shows",
)
def q_frequent_terms_report(spark, sf_dir):
    from realtime_data_pipeline_spark.functions import sketches

    return sketches.frequent_terms(
        _t(spark, sf_dir, "documents"), phi=_FREQ_PHI
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: sequence bucketing, decontamination,
# quality-aware canonical selection
# ---------------------------------------------------------------------------


@register(
    "doc_length_buckets",
    f"""
    WITH t AS (SELECT doc_id, len({D_TOKS}) AS n FROM documents),
    b AS (SELECT n, length(bin(n)) - 1 AS bucket FROM t WHERE n > 0)
    SELECT bucket,
           CAST(1::BIGINT << bucket AS BIGINT) AS min_tokens,
           CAST((1::BIGINT << (bucket + 1)) - 1 AS BIGINT) AS max_tokens,
           count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens
    FROM b GROUP BY bucket
    """,
    doc="sequence-length bucketing (training-batch packing shape): docs "
    "binned into power-of-2 token-count buckets.  The bucket index is "
    "length(bin(n))-1 — pure INTEGER bit arithmetic, deliberately not "
    "floor(log2(n)), whose float rounding can disagree across engines "
    "exactly at the power-of-2 boundaries",
)
def q_doc_length_buckets(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    b = (
        docs.select(text.token_count().alias("n"))
        .where(F.col("n") > 0)
        .withColumn("bucket", F.length(F.bin("n")).cast("int") - 1)
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_tokens"),
        )
        .select(
            "bucket",
            F.expr("cast(shiftleft(1L, bucket) as bigint)").alias("min_tokens"),
            F.expr("cast(shiftleft(1L, bucket + 1) - 1 as bigint)").alias(
                "max_tokens"
            ),
            "n_docs",
            "total_tokens",
        )
    )


CONTAMINATION_BENCH_MAX_ID = 10  # docs below this id play the eval set
CONTAMINATION_MIN_RATIO = 0.05


@register(
    "benchmark_contamination",
    f"""
    WITH t AS (SELECT doc_id, {D_TOKS} AS toks FROM documents),
    tk AS (SELECT doc_id,
                  list_transform(toks, t -> {D_HASH32.format(t='t')}) AS th
           FROM t WHERE len(toks) >= 3),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(range(1, len(th) - 1),
                      i -> (((th[i] * {dedup.SHINGLE_B} + th[i + 1])
                             % {dedup.MINHASH_P}) * {dedup.SHINGLE_B} + th[i + 2])
                           % {dedup.MINHASH_P})) AS s
           FROM tk),
    bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sh
              WHERE doc_id < {CONTAMINATION_BENCH_MAX_ID}),
    ex AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh
           WHERE doc_id >= {CONTAMINATION_BENCH_MAX_ID}),
    hits AS (SELECT doc_id, n_sh, count(*) AS n_overlap
             FROM ex JOIN bench USING (shingle) GROUP BY 1, 2)
    SELECT doc_id, n_sh AS n_shingles, n_overlap,
           round(CAST(n_overlap AS DOUBLE) / n_sh, 4) AS overlap_ratio
    FROM hits
    WHERE round(CAST(n_overlap AS DOUBLE) / n_sh, 4) >= {CONTAMINATION_MIN_RATIO}
    ORDER BY overlap_ratio DESC, doc_id
    """,
    doc="decontamination: corpus docs sharing 3-gram shingles with the "
    "benchmark set (doc_id < 10 stands in for an eval suite).  The "
    "benchmark's distinct shingle hashes broadcast (eval sets are tiny "
    "vs the corpus), overlap counted via broadcast equi-join + one "
    "doc_id shuffle — the standard pre-training leakage check, never a "
    "pair join",
    bench=True,
)
def q_benchmark_contamination(spark, sf_dir):
    return dedup.benchmark_contamination(
        _t(spark, sf_dir, "documents"),
        F.col("doc_id") < CONTAMINATION_BENCH_MAX_ID,
        min_overlap_ratio=CONTAMINATION_MIN_RATIO,
    )


_D_QUALITY = f"""round(0.4 * least(len(toks) / 100.0, 1.0)
      + 0.4 * (1.0 - CAST(len(list_filter(toks, t -> list_contains([{_ALL_STOP}], t))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE))
      + 0.2 * least((CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE)) / 8.0, 1.0),
      4)"""


@register(
    "curation_keep_best",
    f"""
    WITH RECURSIVE {_MINHASH_CTES},
    strong AS (SELECT doc_a, doc_b FROM pairs WHERE est_jaccard >= {CLUSTER_MIN_EST}),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM strong
              UNION SELECT doc_b, doc_a FROM strong),
    reach(node, label) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.v, r.label FROM reach r JOIN edges e
        ON e.u = r.node WHERE r.label < e.v
    ),
    cc AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
    q AS (SELECT doc_id, {_D_QUALITY} AS quality
          FROM (SELECT doc_id, {D_TOKS} AS toks FROM documents)),
    m AS (SELECT component, node, quality
          FROM cc JOIN q ON q.doc_id = cc.node),
    r AS (SELECT component, node, quality,
                 count(*) OVER (PARTITION BY component) AS n_members,
                 row_number() OVER (PARTITION BY component
                                    ORDER BY quality DESC, node ASC) AS rn
          FROM m)
    SELECT component, n_members, node AS keep_doc_id, quality AS keep_quality
    FROM r WHERE rn = 1
    """,
    doc="quality-aware canonical selection: near-dup clusters (MinHash "
    "pairs → connected components) keep their HIGHEST-QUALITY member "
    "(argmax on rounded quality, smaller doc_id tie-break) instead of "
    "the arbitrary min-id — what a production curation pass actually "
    "does before dropping duplicates",
    tags=("pipeline",),
)
def q_curation_keep_best(spark, sf_dir):
    from realtime_data_pipeline_spark.operators.graph import connected_components

    # widen="cpu" (r14): the per-doc quality score is heavyweight
    # tokenize work — spread the serialized test scan (text_metrics
    # convention; no-op at real scan parallelism).
    docs = _t(spark, sf_dir, "documents", widen="cpu")
    strong = dedup.minhash_candidates(
        docs, limit=None, min_est_jaccard=CLUSTER_MIN_EST
    )
    cc = connected_components(strong, "doc_a", "doc_b")
    quality = docs.select("doc_id", text.quality_score().alias("quality"))
    m = cc.join(quality, cc.node == quality.doc_id)
    order = F.struct(F.col("quality"), (-F.col("node")).alias("nid"))
    return m.groupBy("component").agg(
        F.count("*").alias("n_members"),
        F.max_by("node", order).alias("keep_doc_id"),
        F.max_by("quality", order).alias("keep_quality"),
    )


@register(
    "embedding_dedup_clusters",
    f"""
    WITH RECURSIVE e AS (SELECT vec_id, embedding,
                      {_D_NORM.format(a='embedding')} AS nrm,
                      {_D_BUCKET} AS bucket
               FROM embeddings),
    p AS (SELECT q.vec_id AS vec_a, c.vec_id AS vec_b
          FROM e q JOIN e c
          ON bit_count(xor(q.bucket, c.bucket)) <= 1 AND q.vec_id < c.vec_id
          WHERE round({_D_COS}, 6) >= 0.3),
    edges AS (SELECT vec_a AS u, vec_b AS v FROM p
              UNION SELECT vec_b, vec_a FROM p),
    reach(node, label) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT ed.v, r.label FROM reach r JOIN edges ed
        ON ed.u = r.node WHERE r.label < ed.v
    )
    SELECT node AS vec_id, min(label) AS component
    FROM reach GROUP BY node
    """,
    doc="dedup clustering generalized to the EMBEDDING modality: "
    "multi-probe LSH near-dup pairs (Hamming<=1 equi-join, cos >= 0.3) "
    "become duplicate groups via the same distributed min-label "
    "connected components the document pipeline uses — one clustering "
    "operator, two modalities",
    tags=("iterative",),
)
def q_embedding_dedup_clusters(spark, sf_dir):
    from realtime_data_pipeline_spark.operators.graph import connected_components

    pairs = similarity.near_dup_pairs_lsh(
        _t(spark, sf_dir, "embeddings"), min_cosine=0.3, limit=None
    ).select("vec_a", "vec_b")
    cc = connected_components(pairs, "vec_a", "vec_b")
    return cc.select(F.col("node").alias("vec_id"), "component")


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48

_SPARK_TH = (
    "transform(split(trim(text), '\\\\s+'), "
    "t -> cast(conv(substr(md5(t), 1, 8), 16, 10) as bigint))"
)


@register(
    "doc_chunks",
    f"""
    WITH t AS (SELECT doc_id, {D_TOKS} AS toks FROM documents),
    tk AS (SELECT doc_id, len(toks) AS n,
                  list_transform(toks, t -> {D_HASH32.format(t='t')}) AS th
           FROM t),
    c AS (SELECT doc_id, n, th, unnest(range(1, n + 1, {CHUNK_STRIDE})) AS s
          FROM tk)
    SELECT doc_id,
           CAST((s - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(least({CHUNK_TOKENS}, n - s + 1) AS BIGINT) AS n_chunk_tokens,
           list_reduce(
               list_prepend(0::BIGINT,
                   list_slice(th, s, least(s + {CHUNK_TOKENS} - 1, n))),
               (acc, x) -> (acc * {FINGERPRINT_BASE} + x) % {FINGERPRINT_MOD}
           ) AS chunk_fingerprint
    FROM c
    """,
    doc="RAG-style document chunking: overlapping token windows "
    f"({CHUNK_TOKENS} tokens, stride {CHUNK_STRIDE}) emitted one row per "
    "chunk with a rolling-hash fingerprint — pure higher-order "
    "expressions (sequence → explode → slice → fold), no UDF, scales as "
    "a map-only stage",
)
def q_doc_chunks(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # build the start-index list then explode; the fingerprint folds
    # over the token hashes of each slice
    return (
        docs.select(
            "doc_id",
            F.expr(_SPARK_TH).alias("th"),
        )
        .withColumn("n", F.size("th"))
        .select(
            "doc_id",
            "n",
            "th",
            F.explode(F.expr(f"sequence(1, n, {CHUNK_STRIDE})")).alias("s"),
        )
        .select(
            "doc_id",
            ((F.col("s") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
            F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("s") + 1)
            .cast("bigint")
            .alias("n_chunk_tokens"),
            F.expr(
                f"aggregate(slice(th, s, {CHUNK_TOKENS}), cast(0 as bigint), "
                f"(acc, x) -> (acc * {FINGERPRINT_BASE} + x) % {FINGERPRINT_MOD})"
            ).alias("chunk_fingerprint"),
        )
    )


@register(
    "shared_chunk_report",
    # composes doc_chunks' oracle verbatim as a CTE — the chunking
    # definition can never drift between the two queries
    None,  # attached immediately below (needs the registered string)
    doc="cross-document boilerplate detection at sub-document "
    "granularity (the CCNet-style complement to the intra-doc "
    "doc_repetition_scores): chunk fingerprints appearing in >= 2 "
    "distinct documents, top-100 by spread.  Map-only chunking → one "
    "(fingerprint, doc) distinct rollup → fingerprint rollup → "
    "TakeOrdered top-k; the shuffle carries fingerprint partials, "
    "never chunk text — at 100 TB this is the repeated-template "
    "killer that doc-level dedup cannot see",
)
def q_shared_chunk_report(spark, sf_dir):
    chunks = q_doc_chunks(spark, sf_dir)
    per_doc = (
        chunks.groupBy("chunk_fingerprint", "doc_id")
        .agg(F.count("*").alias("c"))
    )
    return (
        per_doc.groupBy("chunk_fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("c").cast("bigint").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.asc("chunk_fingerprint"))
        .limit(100)
    )


def _attach_shared_chunk_oracle() -> None:
    from dataclasses import replace

    from realtime_data_pipeline_spark.plans.registry import REGISTRY

    sql = f"""
    WITH chunks AS ({REGISTRY['doc_chunks'].oracle}),
    per_doc AS (SELECT chunk_fingerprint, doc_id, count(*) AS c
                FROM chunks GROUP BY 1, 2)
    SELECT chunk_fingerprint, count(*) AS n_docs,
           CAST(sum(c) AS BIGINT) AS n_occurrences
    FROM per_doc
    GROUP BY 1
    HAVING count(*) >= 2
    ORDER BY n_docs DESC, chunk_fingerprint
    LIMIT 100
    """
    REGISTRY["shared_chunk_report"] = replace(
        REGISTRY["shared_chunk_report"], oracle=sql
    )


_attach_shared_chunk_oracle()


@register(
    "doc_repetition_scores",
    f"""
    WITH t AS (SELECT doc_id, {D_TOKS} AS toks FROM documents),
    tk AS (SELECT doc_id,
                  list_transform(toks, t -> {D_HASH32.format(t='t')}) AS th
           FROM t WHERE len(toks) >= 3),
    sh AS (SELECT doc_id,
                  list_transform(range(1, len(th) - 1),
                      i -> (((th[i] * {dedup.SHINGLE_B} + th[i + 1])
                             % {dedup.MINHASH_P}) * {dedup.SHINGLE_B} + th[i + 2])
                           % {dedup.MINHASH_P}) AS h
           FROM tk),
    ex AS (SELECT doc_id, unnest(h) AS shingle FROM sh),
    per AS (SELECT doc_id, shingle, count(*) AS c FROM ex GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_shingles,
           CAST(max(c) AS BIGINT) AS top_shingle_count,
           round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS repetition_ratio
    FROM per GROUP BY doc_id
    """,
    doc="repetition/boilerplate detector (the C4/Gopher-style quality "
    "rule): per document, the most frequent 3-gram's share of all "
    "3-grams — high ratio = template/repeated text.  Shingles WITH "
    "multiplicity (unlike the dedup set variant); explode → count → max, "
    "two keyed shuffles, no UDF",
)
def q_doc_repetition_scores(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # persist the token-hash arrays before exploding: Generate merges
    # its input expression past projections, so an un-materialized th
    # is re-inlined at every element_at site inside the shingle HOF
    # and the md5 token map re-executes per shingle (the same
    # pathology measured at 50 s in shingle_sets — see its docstring).
    # Bound th ⇒ one md5 pass; LRU eviction reclaims the cache.
    n = spark.sparkContext.defaultParallelism
    th = (
        docs.repartition(n, "doc_id")
        .select("doc_id", F.expr(_SPARK_TH).alias("th"))
        .where(F.size("th") >= 3)
        .persist()
    )
    sh = th.select(
        "doc_id",
        F.explode(F.expr(dedup.SHINGLE_HASHES_EXPR)).alias("shingle"),
    )
    per = sh.groupBy("doc_id", "shingle").agg(F.count("*").alias("c"))
    return per.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_shingles"),
        F.max("c").cast("bigint").alias("top_shingle_count"),
        F.round(F.max("c").cast("double") / F.sum("c"), 4).alias(
            "repetition_ratio"
        ),
    )




# One list drives BOTH sides of ann_recall_report: (method label,
# oracle top-k CTE, oracle candidate CTE, Spark top-k impl, Spark
# candidate impl).  Adding an ANN method = one row here plus its two
# CTEs — the UNION ALL and the Spark loop can't drift apart.
def _ivf_mp_topk(vectors, query_pred, k=5):
    return similarity.ivf_multiprobe_topk(
        vectors, query_pred, _ivf_cent_pred(), k=k, nprobe=IVF_NPROBE
    )


def _ivf_mp_cands(vectors, query_pred):
    return similarity.ivf_probe_candidates(
        vectors, query_pred, _ivf_cent_pred(), nprobe=IVF_NPROBE
    )


_ANN_METHODS = (
    ("lsh", "lsh", "lshc", similarity.lsh_topk, similarity.lsh_candidates),
    (
        "lsh_multiprobe", "mp", "mpc",
        similarity.lsh_multiprobe_topk, similarity.multiprobe_candidates,
    ),
    (
        "lsh_multitable", "mt", "mtc",
        similarity.lsh_multitable_topk, similarity.multitable_candidates,
    ),
    (
        "lsh_multitable_multiprobe", "mtmp", "mtmpc",
        similarity.lsh_multitable_multiprobe_topk,
        similarity.multitable_multiprobe_candidates,
    ),
    (f"ivf_nprobe{IVF_NPROBE}", "ivf", "ivfc", _ivf_mp_topk, _ivf_mp_cands),
)

_D_ANN_HITS = "\n        UNION ALL\n        ".join(
    f"SELECT '{name}' AS method,\n"
    f"               (SELECT count(*) FROM {cte} JOIN ex"
    f" USING (query_id, neighbor_id)) AS n_hits,\n"
    f"               (SELECT count(*) FROM {cte}) AS n_returned,\n"
    f"               (SELECT count(*) FROM {cand}) AS n_candidates"
    for name, cte, cand, _, _ in _ANN_METHODS
)


def _d_table_bucket(t: int, ppt: int = similarity.PLANES_PER_TABLE) -> str:
    """DuckDB twin of similarity._table_bucket_expr(t): sign bucket over
    table t's own hyperplane family (global plane index t*ppt + p)."""
    lo = t * ppt
    plane = _D_PLANE.replace("md5('hp_' || p", f"md5('hp_' || ({lo} + p)")
    return f"""CAST(list_sum(list_transform(range(0, {ppt}),
    p -> CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
                  list_transform(range(1, {similarity.DIM + 1}),
                      d -> CAST(embedding[d] AS DOUBLE) * {plane})),
                  (a, x) -> a + x) > 0
         THEN (1::BIGINT << p) ELSE 0::BIGINT END)) AS BIGINT)"""


_D_MT_TB = "\n          UNION ALL ".join(
    f"SELECT vec_id, embedding, nrm, {t} AS t, {_d_table_bucket(t)} AS bucket FROM e"
    for t in range(similarity.N_TABLES)
)

# per-table Hamming-1 probe offsets: -1 = the bucket itself, 0..ppt-1 =
# one flipped plane (the multi-table twin of _D_PROBES)
_D_MT_PROBES = ", ".join(
    ["(-1)"] + [f"({p})" for p in range(similarity.PLANES_PER_TABLE)]
)


@register(
    "ann_recall_report",
    f"""
    WITH e AS (SELECT vec_id, embedding,
                      {_D_NORM.format(a='embedding')} AS nrm,
                      {_D_BUCKET} AS bucket
               FROM embeddings),
    ex AS (SELECT query_id, neighbor_id
           FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                        row_number() OVER (
                            PARTITION BY q.vec_id
                            ORDER BY {_D_COS} DESC, c.vec_id) AS rnk
                 FROM e q JOIN e c
                 ON q.vec_id < 8 AND c.vec_id != q.vec_id)
           WHERE rnk <= 5),
    nex AS (SELECT count(*) AS n_exact FROM ex),
    lshc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    {_D_COS} AS cs
             FROM e q JOIN e c
             ON q.vec_id < 8 AND q.bucket = c.bucket
                AND c.vec_id != q.vec_id),
    lsh AS (SELECT query_id, neighbor_id
            FROM (SELECT query_id, neighbor_id,
                         row_number() OVER (
                             PARTITION BY query_id
                             ORDER BY cs DESC, neighbor_id) AS rnk
                  FROM lshc)
            WHERE rnk <= 5),
    probes AS (SELECT vec_id, embedding, nrm,
                      CASE WHEN pb.b = -1 THEN bucket
                           ELSE xor(bucket, (1::BIGINT << pb.b)) END AS probe
               FROM e, (VALUES {_D_PROBES}) pb(b)
               WHERE vec_id < 8),
    mpc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {_D_COS} AS cs
            FROM probes q JOIN e c
            ON q.probe = c.bucket AND c.vec_id != q.vec_id),
    mp AS (SELECT query_id, neighbor_id
           FROM (SELECT query_id, neighbor_id,
                        row_number() OVER (
                            PARTITION BY query_id
                            ORDER BY cs DESC, neighbor_id) AS rnk
                 FROM mpc)
           WHERE rnk <= 5),
    tb AS ({_D_MT_TB}),
    mtc AS (SELECT DISTINCT q.vec_id AS query_id,
                   c.vec_id AS neighbor_id, {_D_COS} AS cs
            FROM tb q JOIN tb c
            ON q.vec_id < 8 AND q.t = c.t AND q.bucket = c.bucket
               AND c.vec_id != q.vec_id),
    mt AS (SELECT query_id, neighbor_id
           FROM (SELECT query_id, neighbor_id,
                        row_number() OVER (
                            PARTITION BY query_id
                            ORDER BY cs DESC, neighbor_id) AS rnk
                 FROM mtc)
           WHERE rnk <= 5),
    mtprobes AS (SELECT vec_id, embedding, nrm, t,
                        CASE WHEN pb.b = -1 THEN bucket
                             ELSE xor(bucket, (1::BIGINT << pb.b)) END AS probe
                 FROM tb, (VALUES {_D_MT_PROBES}) pb(b)
                 WHERE vec_id < 8),
    mtmpc AS (SELECT DISTINCT q.vec_id AS query_id,
                     c.vec_id AS neighbor_id, {_D_COS} AS cs
              FROM mtprobes q JOIN tb c
              ON q.t = c.t AND q.probe = c.bucket
                 AND c.vec_id != q.vec_id),
    mtmp AS (SELECT query_id, neighbor_id
             FROM (SELECT query_id, neighbor_id,
                          row_number() OVER (
                              PARTITION BY query_id
                              ORDER BY cs DESC, neighbor_id) AS rnk
                   FROM mtmpc)
             WHERE rnk <= 5),
    {_D_IVF_CTES.format(cos=_D_COS)},
    ivf AS (SELECT query_id, neighbor_id
            FROM (SELECT query_id, neighbor_id,
                         row_number() OVER (
                             PARTITION BY query_id
                             ORDER BY cs DESC, neighbor_id) AS rnk
                  FROM ivfc)
            WHERE rnk <= 5),
    hits AS (
        {_D_ANN_HITS}
    )
    SELECT method, n_hits, n_returned, n_candidates, n_exact,
           CAST(round(CAST(n_hits AS DOUBLE) / n_exact, 4) AS DOUBLE)
               AS recall_at_5
    FROM hits CROSS JOIN nex
    """,
    doc="self-measuring ANN quality gate: recall@5 AND candidate count "
    "of every registered ANN method (single-probe LSH, multi-probe "
    "LSH, multi-table LSH, multi-table+multi-probe LSH — the "
    "_ANN_METHODS list drives both this query and its oracle) against "
    "the exact brute-force top-5, computed in-engine (semi-join hit "
    "counts over the SAME deterministic result sets the individual "
    "queries emit — exact integer counts, one division at the end). "
    "n_candidates is the scored-pair count each method pays for its "
    "recall — THE trade the 100 TB operator tunes: at sf0.01, "
    "multi-table (L=10 x 4 planes) gives 0.825, and composing "
    "Hamming-1 probes into each table (mtmp) lifts recall past 0.9 "
    "while candidates stay far below the n^2 brute-force pair count "
    "(the fraction falls with n at fixed bucket granularity; "
    "planes-per-table holds per-bucket width at scale)",
)
def q_ann_recall_report(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") < 8
    # persist: the exact top-5 is the ground truth every method is
    # scored against (|queries|·5 rows) — without it the brute-force
    # subtree re-executes once per method plus once for n_exact.
    # Lazy return ⇒ no eager unpersist; repeat callers rely on LRU
    # eviction (bench.py clearCache()s between timed runs).
    exact5 = (
        similarity.brute_force_topk(emb, pred, k=5)
        .select("query_id", "neighbor_id")
        .persist()
    )
    n_exact = exact5.agg(F.count("*").alias("n_exact"))
    reports = []
    for name, _, _, fn, cand_fn in _ANN_METHODS:
        res = fn(emb, pred, k=5).select("query_id", "neighbor_id")
        # one pass per method: a left join against the ground truth
        # yields n_returned (all rows) and n_hits (matched rows) from
        # the same aggregate — the candidate-generation subtree used to
        # execute twice (semi-join count + returned count).
        marked = res.join(
            exact5.withColumn("hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        counts = marked.agg(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
            F.count("*").alias("n_returned"),
        )
        # the cost side of the trade: how many scored pairs this
        # method's candidate generation paid for the recall above
        ncand = cand_fn(emb, pred).agg(
            F.count("*").alias("n_candidates")
        )
        reports.append(
            counts.crossJoin(F.broadcast(ncand)).select(
                F.lit(name).alias("method"),
                "n_hits",
                "n_returned",
                "n_candidates",
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.crossJoin(F.broadcast(n_exact)).select(
        "method",
        "n_hits",
        "n_returned",
        "n_candidates",
        "n_exact",
        F.round(F.col("n_hits").cast("double") / F.col("n_exact"), 4).alias(
            "recall_at_5"
        ),
    )


@register(
    "kmeans_codebook_report",
    # Invariant oracle (the codebook itself is engine-float-specific,
    # like HLL sketch bytes): assignment must cover every embedding
    # exactly once, and Lloyd's guarantees must hold on the measured
    # objective history.  The booleans come out of REAL training; the
    # oracle pins what must always be true of a correct implementation.
    # n_assigned counts exactly the rows kmeans.normalized_points
    # keeps: nonzero-norm embeddings with no NULL element.  Spark's
    # aggregate-of-squares fold propagates a NULL ELEMENT to a NULL
    # norm (row dropped), but DuckDB's list_sum SKIPS NULL elements
    # like SQL SUM (element-NULL harness, r7) — the oracle needs the
    # explicit all-elements-present predicate; a whole-NULL embedding
    # is NULL > 0 = false in both engines either way.
    """
    SELECT CAST(8 AS INTEGER) AS k,
           count(*) FILTER (
               WHERE list_sum(list_transform(embedding, x -> x * x)) > 0
                 AND list_aggregate(embedding, 'count') = len(embedding)
           ) AS n_assigned,
           TRUE AS monotone_objective,
           TRUE AS improved_over_init
    FROM embeddings
    """,
    doc="spherical k-means codebook training for the IVF family "
    "(functions/kmeans.py): literal-broadcast codebook, map-side argmax "
    "assignment (zero shuffle), partial-agg recentroid (k x dim "
    "exchange rows).  Reports coverage (every nonzero-norm vector "
    "assigned exactly once) and the Lloyd invariants measured over 4 "
    "iterations on the embeddings table",
)
def q_kmeans_codebook_report(spark, sf_dir):
    from realtime_data_pipeline_spark.functions import kmeans

    emb = _t(spark, sf_dir, "embeddings")
    cents, history = kmeans.kmeans_fit(emb, k=8, n_iters=4)
    assigned = kmeans.assign_cells(kmeans.normalized_points(emb), cents)
    n_assigned = assigned.where(F.col("cell") >= 0).count()
    monotone = all(b >= a - 1e-9 for a, b in zip(history, history[1:]))
    improved = history[-1] >= history[0] - 1e-9
    return spark.createDataFrame(
        [(8, n_assigned, bool(monotone), bool(improved))],
        "k int, n_assigned long, monotone_objective boolean, "
        "improved_over_init boolean",
    )


@register(
    "fuzzy_prefix_dups",
    f"""
    WITH d AS (SELECT doc_id, lang,
                      substr(trim(text), 1, {dedup.FUZZY_PREFIX_LEN}) AS p,
                      string_split_regex(trim(text), '\\s+')[1] AS t1,
                      string_split_regex(trim(text), '\\s+')[2] AS t2
               FROM documents WHERE lang IS NOT NULL),
    ok1 AS (SELECT lang, t1 FROM d WHERE t1 IS NOT NULL GROUP BY lang, t1
            HAVING count(*) BETWEEN 2 AND {dedup.MAX_BUCKET_WIDTH}),
    ok2 AS (SELECT lang, t2 FROM d WHERE t2 IS NOT NULL GROUP BY lang, t2
            HAVING count(*) BETWEEN 2 AND {dedup.MAX_BUCKET_WIDTH}),
    pairs AS (SELECT DISTINCT doc_a, doc_b, edit_distance FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(a.p, b.p) AS edit_distance
        FROM d a JOIN d b
          ON a.lang = b.lang AND a.t1 = b.t1 AND a.doc_id < b.doc_id
        JOIN ok1 ON ok1.lang = a.lang AND ok1.t1 = a.t1
        UNION ALL
        SELECT a.doc_id, b.doc_id, levenshtein(a.p, b.p)
        FROM d a JOIN d b
          ON a.lang = b.lang AND a.t2 = b.t2 AND a.doc_id < b.doc_id
        JOIN ok2 ON ok2.lang = a.lang AND ok2.t2 = a.t2))
    SELECT doc_a, doc_b, edit_distance FROM pairs
    WHERE edit_distance <= {dedup.FUZZY_MAX_DIST}
    ORDER BY edit_distance, doc_a, doc_b
    LIMIT 500
    """,
    doc="character-level fuzzy near-dups: two bucket families — (lang, "
    "token 1) and (lang, token 2) — so an edit anywhere in the prefix, "
    "INCLUDING the first word, still lands the pair in a shared bucket; "
    "bucket-local pair generation with the MinHash-style width cap per "
    "family, union + dedup, bounded-prefix levenshtein kernel on "
    "candidate pairs only — the edit-distance modality (typo fixes, "
    "stamp suffixes) alongside shingle, simhash, and embedding dedup",
)
def q_fuzzy_prefix_dups(spark, sf_dir):
    return dedup.fuzzy_prefix_dups(_t(spark, sf_dir, "documents"))
