"""Corpus / behavioral analytics operators (round 5 additions).

North-star extensions past the reference's surface (the reference's
whole analytics layer is ~40 lines of pandas in
reporting/reporting.py:94-191): n-gram language-model counts,
deterministic stratified sampling, range-frame rolling aggregates,
activity outlier scoring, cross-source corpus overlap, and
gaps-and-islands run detection.  Spark-first: every operator is JVM
built-ins only (no Python UDFs), shuffles are keyed partial
aggregations, and every query carries a byte-exact DuckDB oracle.

Cross-engine determinism notes
  * ratios are single double divisions of exact integer/decimal
    aggregates, rounded to 4 digits in both engines;
  * ordering keys for top-k are exact-integer expressions (never a
    rounded double), with unique-key tie-breaks;
  * money goes through DECIMAL(18,2) sums (order-independent),
    rendered round(·,2)::double (plans/relational.py contract).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.functions import dedup
from realtime_data_pipeline_spark.plans.northstar import (
    _MINHASH_CTES,
    D_HASH32,
    D_TOKS,
)
from realtime_data_pipeline_spark.plans.registry import _events, _t, register

# ---------------------------------------------------------------------------
# Bigram language-model counts
# ---------------------------------------------------------------------------


@register(
    "bigram_lm_report",
    f"""
    WITH toks AS (
        SELECT lang, {D_TOKS} AS t
        FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
    bi AS (
        SELECT lang, u[1] AS w1, u[2] AS w2
        FROM (SELECT lang,
                     unnest(list_zip(t[1:len(t) - 1], t[2:len(t)])) AS u
              FROM toks WHERE len(t) >= 2)),
    c AS (SELECT lang, w1, w2, count(*) AS n FROM bi GROUP BY 1, 2, 3),
    w AS (SELECT lang, w1, w2, n,
                 round(CAST(n AS DOUBLE)
                       / sum(n) OVER (PARTITION BY lang, w1), 4) AS p,
                 CAST(row_number() OVER (PARTITION BY lang
                      ORDER BY n DESC, w1, w2) AS INT) AS rk
          FROM c)
    SELECT lang, w1, w2, n, p, rk FROM w WHERE rk <= 10
    """,
    doc="bigram language-model counts: top-10 bigrams per language with "
    "the conditional probability P(w2|w1) = n(w1,w2)/n(w1,·).  The "
    "bigram stream is zip_with over adjacent token slices — pure JVM "
    "HOFs — materialized (repartition + persist barrier, the "
    "shingle_sets Generate-pathology fix) before the explode; counts "
    "are one (lang,w1,w2) partial-agg shuffle, the w1 normalizer and "
    "per-lang top-k are windows over the COUNT relation (vocabulary-"
    "sized, orders of magnitude below corpus size at 100 TB)",
)
def q_bigram_lm_report(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    n = spark.sparkContext.defaultParallelism
    toks = F.split(F.trim(F.col("text")), r"\s+")
    bi = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    # Persist = materialization barrier: a live Generate over the
    # interpreted zip_with/slice chain re-evaluates it per output
    # element (see dedup.shingle_sets docstring for the measurement).
    pairs = (
        docs.where(F.col("lang").isNotNull() & F.col("text").isNotNull())
        .repartition(n)
        .select("lang", bi.alias("bi"))
        .where(F.size("bi") >= 1)
        .persist()
    )
    ex = pairs.select("lang", F.explode("bi").alias("b")).select(
        "lang", "b.w1", "b.w2"
    )
    counts = ex.groupBy("lang", "w1", "w2").agg(F.count("*").alias("n"))
    w1_tot = Window.partitionBy("lang", "w1")
    top = Window.partitionBy("lang").orderBy(
        F.desc("n"), F.asc("w1"), F.asc("w2")
    )
    return (
        counts.withColumn(
            "p", F.round(F.col("n").cast("double") / F.sum("n").over(w1_tot), 4)
        )
        .withColumn("rk", F.row_number().over(top))
        .where(F.col("rk") <= 10)
    )


# ---------------------------------------------------------------------------
# LM-probability quality scoring (perplexity-proxy corpus filtering)
# ---------------------------------------------------------------------------


@register(
    "doc_lm_scores",
    f"""
    WITH toks AS (
        SELECT doc_id, {D_TOKS} AS t
        FROM documents WHERE text IS NOT NULL),
    bi AS (
        SELECT doc_id, u[1] AS w1, u[2] AS w2
        FROM (SELECT doc_id,
                     unnest(list_zip(t[1:len(t) - 1], t[2:len(t)])) AS u
              FROM toks WHERE len(t) >= 2)),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
    s AS (SELECT doc_id, CAST(c12.c12 AS DOUBLE) / c1.c1 AS p
          FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1)),
    a AS (SELECT doc_id, list_sort(list(p)) AS ps FROM s GROUP BY doc_id)
    SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_bigrams,
           round(list_reduce(ps, (a, b) -> a + b) / len(ps), 4)
               AS mean_bigram_p,
           round(ps[1], 4) AS min_bigram_p
    FROM a
    """,
    doc="LM-based quality scoring (the perplexity-proxy corpus filter, "
    "CCNet-style, self-trained): score every document by the mean and "
    "minimum corpus-bigram probability P(w2|w1) = c(w1,w2)/c(w1,·) of "
    "its bigrams — low scores flag disfluent/outlier text for removal. "
    "Deliberately NO log-space math: Spark's log2 (JVM Math.log) and "
    "DuckDB's (libm) can differ by 1 ulp, so the score is built only "
    "from exact-integer divisions summed in SORTED sequential order "
    "(F.aggregate / list_reduce, both strictly left-to-right) — "
    "bit-identical cross-engine.  The bigram LM table is "
    "vocabulary-sized: broadcast at test scale, a plain equi-join at "
    "100 TB; per-doc state is doc-length-bounded",
)
def q_doc_lm_scores(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    n = spark.sparkContext.defaultParallelism
    toks = F.split(F.trim(F.col("text")), r"\s+")
    bi = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = (
        docs.where(F.col("text").isNotNull())
        .repartition(n)
        .select("doc_id", bi.alias("bi"))
        .where(F.size("bi") >= 1)
        .persist()  # Generate-pathology barrier (dedup.shingle_sets)
    )
    ex = pairs.select("doc_id", F.explode("bi").alias("b")).select(
        "doc_id", "b.w1", "b.w2"
    )
    c12 = ex.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # MERGE hints (r7 broadcast audit): the LM tables are observed-
    # bigram/vocab-scaled (100M+ rows on a real corpus) and their
    # static size estimates are explode-derived garbage — the r6
    # assumption that the unhinted plan "degrades to a keyed
    # equi-join" was DISPROVED by the ngram probe OOM (the planner
    # broadcast a mis-estimated explode-derived side, and AQE does
    # not demote a statically-planned broadcast).  SMJ spills; a
    # broadcast build does not.
    scored = (
        ex.join(c12.hint("merge"), ["w1", "w2"])
        .join(c1.hint("merge"), ["w1"])
        .select(
            "doc_id",
            (F.col("c12").cast("double") / F.col("c1")).alias("p"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("p")).alias("ps")
    )
    seq_sum = F.aggregate(
        F.col("ps"), F.lit(0.0), lambda acc, x: acc + x
    )
    return per_doc.select(
        "doc_id",
        F.size("ps").cast("bigint").alias("n_bigrams"),
        F.round(seq_sum / F.size("ps"), 4).alias("mean_bigram_p"),
        F.round(F.element_at("ps", 1), 4).alias("min_bigram_p"),
    )


# ---------------------------------------------------------------------------
# Inverted-index build (bounded posting heads)
# ---------------------------------------------------------------------------


@register(
    "term_postings_stats",
    f"""
    WITH ex AS (
        SELECT doc_id, unnest({D_TOKS}) AS term
        FROM documents WHERE text IS NOT NULL),
    d AS (SELECT DISTINCT doc_id, term FROM ex),
    df AS (SELECT term, count(*) AS df FROM d GROUP BY 1),
    cf AS (SELECT term, count(*) AS cf FROM ex GROUP BY 1),
    r AS (SELECT term, doc_id,
                 row_number() OVER (PARTITION BY term ORDER BY doc_id)
                     AS pr
          FROM d),
    heads AS (SELECT term,
                     array_to_string(list_sort(list(doc_id)), ',')
                         AS posting_head
              FROM r WHERE pr <= 5 GROUP BY term)
    SELECT term, df.df AS df, cf.cf AS cf, posting_head
    FROM df JOIN cf USING (term) JOIN heads USING (term)
    ORDER BY df.df DESC, term LIMIT 100
    """,
    doc="inverted-index build: per term, document frequency, collection "
    "frequency, and the first-5 posting-list head (doc_ids ascending, "
    "rendered as a comma-joined string — driver-window outputs must be "
    "scalar-only: the driver's pandas canonicalization cannot sort an "
    "array<> column), top-100 terms by df.  The posting head is "
    "BOUNDED before any collect — a per-term row_number keeps ≤5 docs, "
    "so executor state is O(5), never O(df) (an unbounded collect_list "
    "per term is the classic index-build OOM at 100 TB); the top-100 "
    "render is TakeOrderedAndProject, no global sort",
)
def q_term_postings_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    n = spark.sparkContext.defaultParallelism
    toks_arr = (
        docs.where(F.col("text").isNotNull())
        .repartition(n)
        .select(
            "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
        )
        .persist()  # Generate-pathology barrier
    )
    ex = toks_arr.select("doc_id", F.explode("t").alias("term"))
    d = ex.distinct()
    # df and the bounded posting head come from ONE pass over the
    # distinct postings: the term-partitioned window and the term
    # rollup share the same exchange, and collect_list over the
    # pr<=5 conditional keeps O(5) state per term (NULLs are skipped)
    # — one fewer vocab-scaled join than the r5 three-relation form.
    w = Window.partitionBy("term").orderBy("doc_id")
    dfh = (
        d.withColumn("pr", F.row_number().over(w))
        .groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("pr") <= 5, F.col("doc_id"))
                )
            ).alias("posting_head"),
        )
    )
    cf_t = ex.groupBy("term").agg(F.count("*").alias("cf"))
    # MERGE hint (r7 broadcast audit): both sides are VOCAB-scaled
    # with explode-derived static estimates — never a broadcast.
    return (
        dfh.join(cf_t.hint("merge"), "term")
        .select(
            "term",
            "df",
            "cf",
            # Scalar render of the (already sorted, already O(5))
            # head: the driver's pandas canon crashes sorting
            # array cells, so the contract is scalar-only output.
            F.array_join(
                F.transform(
                    "posting_head", lambda x: x.cast("string")
                ),
                ",",
            ).alias("posting_head"),
        )
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------


@register(
    "stratified_doc_sample",
    """
    WITH r AS (
        SELECT lang, n_chars,
               row_number() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents WHERE lang IS NOT NULL)
    SELECT lang, count(*) AS n_sampled,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars
    FROM r WHERE rk <= 20 GROUP BY lang
    """,
    doc="deterministic stratified sample: per language stratum, the 20 "
    "docs ranked first by md5(doc_id) (a reproducible engine-neutral "
    "pseudo-shuffle — same family as the train/val/test selector), with "
    "per-stratum size/char stats.  One (lang) exchange; the rollup "
    "reuses the window's partitioning, so ONE shuffle total.  At 100 TB "
    "pre-filter by an md5 threshold slightly above k/N before ranking "
    "so the per-stratum sort never sees the full stratum",
)
def q_stratified_doc_sample(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.where(F.col("lang").isNotNull())
        .select("lang", "n_chars", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 20)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.count("*"), 4
            ).alias("avg_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Range-frame rolling aggregate
# ---------------------------------------------------------------------------


@register(
    "rolling_daily_revenue",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1)
    SELECT CAST(d AS TIMESTAMP) AS order_day,
           CAST(round(rev, 2) AS DOUBLE) AS day_revenue,
           CAST(round(sum(rev) OVER (
               ORDER BY date_diff('day', DATE '1970-01-01', d)
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
               AS revenue_7d
    FROM daily
    """,
    doc="trailing-7-day rolling revenue: daily DECIMAL rollup of orders "
    "(one shuffle over the fact table), then a RANGE frame over "
    "days-since-epoch — a true value-range window, so calendar gaps "
    "shorten the frame instead of silently widening it (ROWS BETWEEN "
    "would be wrong on sparse days).  The unpartitioned window runs on "
    "the POST-AGGREGATION relation, bounded by calendar days (≤36.5k "
    "rows per century) regardless of fact volume — O(days), never "
    "O(data); decimal partials keep the rolling sums exact",
)
def q_rolling_daily_revenue(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
        .withColumn(
            "dayn", F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
        )
    )
    w = Window.orderBy("dayn").rangeBetween(-6, 0)
    return daily.select(
        F.col("d").cast("timestamp_ntz").alias("order_day"),
        F.round(F.col("rev"), 2).cast("double").alias("day_revenue"),
        F.round(F.sum("rev").over(w), 2).cast("double").alias("revenue_7d"),
    )


# ---------------------------------------------------------------------------
# Activity outlier scoring
# ---------------------------------------------------------------------------


@register(
    "user_activity_zscores",
    """
    WITH per AS (SELECT user_id, count(*) AS n_events
                 FROM events GROUP BY 1),
    st AS (SELECT count(*) AS cnt, sum(n_events) AS s1,
                  sum(n_events * n_events) AS s2 FROM per),
    z AS (SELECT user_id, n_events,
                 round((n_events - CAST(s1 AS DOUBLE) / cnt)
                       / sqrt(CAST(s2 AS DOUBLE) / cnt
                              - (CAST(s1 AS DOUBLE) / cnt)
                                * (CAST(s1 AS DOUBLE) / cnt)), 4) AS z,
                 abs(n_events * cnt - s1) AS ok
          FROM per, st)
    SELECT user_id, n_events, z FROM z
    ORDER BY ok DESC, user_id LIMIT 20
    """,
    doc="per-user activity z-scores (population moments from EXACT "
    "integer sums: mean = s1/cnt, var = s2/cnt - mean² — single double "
    "ops on exact aggregates, bit-identical cross-engine, unlike "
    "engine-native stddev whose summation order varies), top-20 "
    "outliers.  The ORDER BY key is the exact integer |n·cnt - s1| "
    "(∝ |n - mean|), never the rounded double.  One user_id shuffle + "
    "a 1-row scalar broadcast join; the top-k is "
    "TakeOrderedAndProject",
)
def q_user_activity_zscores(spark, sf_dir):
    ev = _events(spark, sf_dir)
    per = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    stats = per.agg(
        F.count("*").alias("cnt"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    j = per.crossJoin(F.broadcast(stats))
    mean = F.col("s1").cast("double") / F.col("cnt")
    var = F.col("s2").cast("double") / F.col("cnt") - mean * mean
    return (
        j.select(
            "user_id",
            "n_events",
            F.round((F.col("n_events") - mean) / F.sqrt(var), 4).alias("z"),
            F.abs(
                F.col("n_events") * F.col("cnt") - F.col("s1")
            ).alias("ok"),
        )
        .orderBy(F.desc("ok"), F.asc("user_id"))
        .limit(20)
        .drop("ok")
    )


# ---------------------------------------------------------------------------
# Cross-source corpus overlap
# ---------------------------------------------------------------------------


@register(
    "source_overlap_matrix",
    f"""
    WITH t AS (SELECT source, {D_TOKS} AS toks
               FROM documents WHERE source IS NOT NULL),
    tk AS (SELECT source,
                  list_transform(toks, t -> {D_HASH32.format(t='t')}) AS th
           FROM t WHERE len(toks) >= 3),
    sh AS (SELECT DISTINCT source, s FROM (
               SELECT source,
                      unnest(list_distinct(list_transform(
                          range(1, len(th) - 1),
                          i -> (((th[i] * {dedup.SHINGLE_B} + th[i + 1])
                                 % {dedup.MINHASH_P}) * {dedup.SHINGLE_B}
                                + th[i + 2]) % {dedup.MINHASH_P}))) AS s
               FROM tk)),
    per AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
    p AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
          FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
          GROUP BY 1, 2)
    SELECT src_a, src_b, n_shared,
           round(CAST(n_shared AS DOUBLE)
                 / (pa.n_sh + pb.n_sh - n_shared), 4) AS jaccard
    FROM p
    JOIN per pa ON p.src_a = pa.source
    JOIN per pb ON p.src_b = pb.source
    """,
    doc="cross-source corpus overlap: Jaccard similarity of the distinct "
    "3-gram shingle-hash sets of every source pair — the corpus-level "
    "audit (which feeds duplicate which?) a multi-source 100 TB corpus "
    "build runs before mixing.  Same int64 polynomial shingles as "
    "MinHash (8-byte shuffle keys); pairs come from SHINGLE-local "
    "source-set expansion (collect_set per shingle, bounded by "
    "#sources, then i<j expansion — the minhash bucket-local pattern), "
    "never a doc- or shingle-level self-join; per-source set sizes "
    "broadcast back onto the pair counts",
)
def q_source_overlap_matrix(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    n = spark.sparkContext.defaultParallelism
    # Shingle map with `source` carried through (no doc_id join-back);
    # persist = Generate-pathology barrier, as in dedup.shingle_sets.
    sh_arrays = (
        docs.where(F.col("source").isNotNull())
        .repartition(n, "doc_id")
        .withColumn("toks", F.expr(dedup.TOKENS_EXPR))
        .where(F.size("toks") >= 3)
        .withColumn(
            "th",
            F.expr(
                "transform(toks, t -> "
                "cast(conv(substr(md5(t), 1, 8), 16, 10) as bigint))"
            ),
        )
        .select(
            "source",
            F.array_distinct(F.expr(dedup.SHINGLE_HASHES_EXPR)).alias("sh"),
        )
        .persist()
    )
    # Persisted: three consumers (per-source sizes, shingle-local
    # source sets) would otherwise re-run the explode+distinct.
    sh = (
        sh_arrays.select("source", F.explode("sh").alias("s"))
        .distinct()
        .persist()
    )
    per = sh.groupBy("source").agg(F.count("*").alias("n_sh"))
    srcs = (
        sh.groupBy("s")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .where(F.size("srcs") >= 2)
    )
    pairs = srcs.select(
        F.explode(
            F.expr(
                "flatten(transform(srcs, (a, i) -> "
                "transform(slice(srcs, i + 2, size(srcs)), "
                "b -> struct(a AS src_a, b AS src_b))))"
            )
        ).alias("p")
    ).select("p.src_a", "p.src_b")
    shared = pairs.groupBy("src_a", "src_b").agg(
        F.count("*").alias("n_shared")
    )
    pa = per.select(
        F.col("source").alias("src_a"), F.col("n_sh").alias("na")
    )
    pb = per.select(
        F.col("source").alias("src_b"), F.col("n_sh").alias("nb")
    )
    return (
        shared.join(F.broadcast(pa), "src_a")
        .join(F.broadcast(pb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_shared")),
                4,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Exact distributed Pearson correlation
# ---------------------------------------------------------------------------


@register(
    "lexical_diversity_correlation",
    f"""
    WITH t AS (
        SELECT lang,
               len({D_TOKS}) AS x,
               len(list_distinct({D_TOKS})) AS y
        FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
    s AS (SELECT lang, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
          FROM t GROUP BY 1)
    SELECT lang, CAST(n AS BIGINT) AS n_docs,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r
    FROM s WHERE n >= 2
    """,
    doc="exact distributed Pearson correlation of document length "
    "(token count) vs lexical diversity (distinct-token count) per "
    "language — the corpus-quality signal behind repetitive-text "
    "filters, and the template for ANY feature-pair correlation audit "
    "at 100 TB: five EXACT int64 moment sums in one partial-agg'd "
    "rollup, then r = (nΣxy−ΣxΣy)/√((nΣxx−(Σx)²)(nΣyy−(Σy)²)) as "
    "single double ops — bit-identical cross-engine, never "
    "engine-native corr() whose summation order varies.  One shuffle",
)
def q_lexical_diversity_correlation(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    t = docs.where(
        F.col("lang").isNotNull() & F.col("text").isNotNull()
    ).select(
        "lang",
        F.size(toks).alias("x"),
        F.size(F.array_distinct(toks)).alias("y"),
    )
    s = t.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return s.where(F.col("n") >= 2).select(
        "lang",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(num / den, 6).alias("r"),
    )


# ---------------------------------------------------------------------------
# Binned two-sample Kolmogorov-Smirnov drift report
# ---------------------------------------------------------------------------


@register(
    "ks_drift_report",
    """
    WITH e AS (
        SELECT CAST(least(floor(value / 2), 499) AS INT) AS bin,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
        FROM events
        WHERE value IS NOT NULL AND value >= 0
          AND event_type IN ('click', 'error')),
    b AS (SELECT bin,
                 sum(is_a) AS na_bin,
                 sum(1 - is_a) AS nb_bin
          FROM e GROUP BY 1),
    c AS (SELECT bin,
                 sum(na_bin) OVER (ORDER BY bin) AS ca,
                 sum(nb_bin) OVER (ORDER BY bin) AS cb,
                 sum(na_bin) OVER () AS na,
                 sum(nb_bin) OVER () AS nb
          FROM b)
    SELECT CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b,
           round(max(abs(CAST(ca AS DOUBLE) / na
                         - CAST(cb AS DOUBLE) / nb)), 6) AS d_stat
    FROM c
    """,
    doc="distribution-drift audit: binned two-sample Kolmogorov-"
    "Smirnov D statistic between the click and error value "
    "distributions — the feature-drift gate a production pipeline "
    "runs between data vintages.  One pass bins both samples "
    "(map-side integer binning, fixed 500-bin grid), the CDF "
    "difference is a cumulative window over the BIN relation "
    "(bounded by the grid, never by data volume), D = max of "
    "per-bin exact-count ratios — order-independent, bit-identical "
    "cross-engine.  Exact-value KS needs a global sort; the fixed "
    "grid is the scale-correct estimator (error ≤ bin width)",
)
def q_ks_drift_report(spark, sf_dir):
    ev = _events(spark, sf_dir)
    e = ev.where(
        F.col("value").isNotNull()
        & (F.col("value") >= 0)
        & F.col("event_type").isin("click", "error")
    ).select(
        F.least(F.floor(F.col("value") / 2), F.lit(499))
        .cast("int")
        .alias("bin"),
        (F.col("event_type") == "click").cast("int").alias("is_a"),
    )
    b = e.groupBy("bin").agg(
        F.sum("is_a").alias("na_bin"),
        F.sum(1 - F.col("is_a")).alias("nb_bin"),
    )
    cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    c = b.select(
        F.sum("na_bin").over(cum).alias("ca"),
        F.sum("nb_bin").over(cum).alias("cb"),
        F.sum("na_bin").over(tot).alias("na"),
        F.sum("nb_bin").over(tot).alias("nb"),
    )
    return c.agg(
        F.max("na").cast("bigint").alias("n_a"),
        F.max("nb").cast("bigint").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("ca").cast("double") / F.col("na")
                    - F.col("cb").cast("double") / F.col("nb")
                )
            ),
            6,
        ).alias("d_stat"),
    )


# ---------------------------------------------------------------------------
# Gini-Simpson lexical diversity per source
# ---------------------------------------------------------------------------


@register(
    "source_diversity_report",
    f"""
    WITH ex AS (
        SELECT source, unnest({D_TOKS}) AS term
        FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
    ts AS (SELECT source, term, count(*) AS n FROM ex GROUP BY 1, 2),
    s AS (SELECT source,
                 count(*) AS vocab,
                 sum(n) AS total,
                 sum(n * n) AS sum_sq,
                 max(n) AS top_n
          FROM ts GROUP BY 1)
    SELECT source, CAST(vocab AS BIGINT) AS vocab,
           CAST(total AS BIGINT) AS n_tokens,
           round(1 - CAST(sum_sq AS DOUBLE) / (CAST(total AS DOUBLE)
                 * total), 6) AS gini_simpson,
           round(CAST(top_n AS DOUBLE) / total, 6) AS top_term_share
    FROM s
    """,
    doc="lexical diversity per source via the Gini-Simpson index "
    "1 − Σpᵢ² — the entropy-style repetitiveness signal computed "
    "WITHOUT log() (engine log ulp hazard): Σnᵢ² is an exact int64 "
    "sum over the (source,term) contingency rollup, the index single "
    "double ops.  Low diversity or a high top-term share flags "
    "boilerplate-dominated sources before they enter a 100 TB mix.  "
    "Two partial-agg'd shuffles",
)
def q_source_diversity_report(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    n = spark.sparkContext.defaultParallelism
    toks_arr = (
        docs.where(
            F.col("text").isNotNull() & F.col("source").isNotNull()
        )
        .repartition(n)
        .select(
            "source", F.split(F.trim(F.col("text")), r"\s+").alias("t")
        )
        .persist()  # Generate-pathology barrier
    )
    ts = (
        toks_arr.select("source", F.explode("t").alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("n"))
    )
    s = ts.groupBy("source").agg(
        F.count("*").alias("vocab"),
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
        F.max("n").alias("top_n"),
    )
    return s.select(
        "source",
        F.col("vocab").cast("bigint").alias("vocab"),
        F.col("total").cast("bigint").alias("n_tokens"),
        F.round(
            1
            - F.col("sum_sq").cast("double")
            / (F.col("total").cast("double") * F.col("total")),
            6,
        ).alias("gini_simpson"),
        F.round(
            F.col("top_n").cast("double") / F.col("total"), 6
        ).alias("top_term_share"),
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over event types
# ---------------------------------------------------------------------------


@register(
    "event_transition_matrix",
    """
    WITH o AS (SELECT user_id, event_type, ts, event_id,
                      lead(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS nxt
               FROM events WHERE ts IS NOT NULL),
    t AS (SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
          FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY from_type), 4) AS p
    FROM t
    """,
    doc="first-order Markov transition matrix over per-user event "
    "sequences: lead() under the unique (ts, event_id) order, "
    "transition counts, and row-normalized probabilities P(to|from) — "
    "the normalizer a window over the |types|² COUNT relation, not "
    "the event stream.  One user_id exchange feeds the lead window "
    "AND the transition rollup (subset-key clustering); the behavior "
    "model behind next-action prediction features and bot detection "
    "(improbable transition chains)",
)
def q_event_transition_matrix(spark, sf_dir):
    # NULL ts has no sequence position, and NULLable window ORDER BY
    # diverges across engines (Spark NULLS FIRST, DuckDB NULLS LAST)
    ev = _events(spark, sf_dir).where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lead("event_type").over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("nxt").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    row_tot = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(row_tot), 4
        ).alias("p"),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------


@register(
    "rfm_segments",
    """
    WITH c AS (
        SELECT o_custkey, count(*) AS f,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS m,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m_dec,
               max(CAST(o_orderdate AS DATE)) AS last_d
        FROM orders GROUP BY 1),
    g AS (SELECT max(last_d) AS ref FROM c),
    cr AS (SELECT o_custkey, f, m, m_dec,
                  date_diff('day', last_d, g.ref) AS r
           FROM c CROSS JOIN g),
    q AS (SELECT quantile_cont(r, 0.25) AS r1, quantile_cont(r, 0.5) AS r2,
                 quantile_cont(r, 0.75) AS r3,
                 quantile_cont(f, 0.25) AS f1, quantile_cont(f, 0.5) AS f2,
                 quantile_cont(f, 0.75) AS f3,
                 quantile_cont(m, 0.25) AS m1, quantile_cont(m, 0.5) AS m2,
                 quantile_cont(m, 0.75) AS m3
          FROM cr),
    s AS (SELECT o_custkey, m_dec,
                 CAST(1 + (CASE WHEN r < r1 THEN 1 ELSE 0 END)
                        + (CASE WHEN r < r2 THEN 1 ELSE 0 END)
                        + (CASE WHEN r < r3 THEN 1 ELSE 0 END) AS INT)
                     AS r_score,
                 CAST(1 + (CASE WHEN f > f1 THEN 1 ELSE 0 END)
                        + (CASE WHEN f > f2 THEN 1 ELSE 0 END)
                        + (CASE WHEN f > f3 THEN 1 ELSE 0 END) AS INT)
                     AS f_score,
                 CAST(1 + (CASE WHEN m > m1 THEN 1 ELSE 0 END)
                        + (CASE WHEN m > m2 THEN 1 ELSE 0 END)
                        + (CASE WHEN m > m3 THEN 1 ELSE 0 END) AS INT)
                     AS m_score
          FROM cr CROSS JOIN q)
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           CAST(round(sum(m_dec), 2) AS DOUBLE) AS total_monetary
    FROM s GROUP BY 1, 2, 3
    """,
    doc="RFM segmentation: per customer recency (days since their last "
    "order vs the corpus max date), frequency, monetary (exact DECIMAL "
    "sum), quartile-scored 1-4 against interpolated percentile "
    "boundaries (Spark percentile ≙ DuckDB quantile_cont — identical "
    "sort-based interpolation), cell rollup with exact decimal "
    "monetary totals.  Boundary scoring is a broadcast of ONE 9-value "
    "row onto a map-side CASE chain — no per-customer rank, no "
    "window; the exact percentile is the test-exactness path, "
    "approx_percentile the documented 100 TB swap (same call shape, "
    "mergeable sketch)",
)
def q_rfm_segments(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.count("*").alias("f"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
        )
        .cast("double")
        .alias("m"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("m_dec"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
    )
    ref = c.agg(F.max("last_d").alias("ref"))
    cr = c.crossJoin(F.broadcast(ref)).withColumn(
        "r", F.datediff(F.col("ref"), F.col("last_d"))
    )
    q = cr.agg(
        *[
            F.expr(f"percentile({col}, {p})").alias(f"{col}{i}")
            for col in ("r", "f", "m")
            for i, p in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )
    s = cr.crossJoin(F.broadcast(q))
    r_score = (
        1
        + (F.col("r") < F.col("r1")).cast("int")
        + (F.col("r") < F.col("r2")).cast("int")
        + (F.col("r") < F.col("r3")).cast("int")
    ).cast("int")
    f_score = (
        1
        + (F.col("f") > F.col("f1")).cast("int")
        + (F.col("f") > F.col("f2")).cast("int")
        + (F.col("f") > F.col("f3")).cast("int")
    ).cast("int")
    m_score = (
        1
        + (F.col("m") > F.col("m1")).cast("int")
        + (F.col("m") > F.col("m2")).cast("int")
        + (F.col("m") > F.col("m3")).cast("int")
    ).cast("int")
    return (
        s.select(
            r_score.alias("r_score"),
            f_score.alias("f_score"),
            m_score.alias("m_score"),
            "m_dec",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("m_dec"), 2)
            .cast("double")
            .alias("total_monetary"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket lift over event types
# ---------------------------------------------------------------------------


@register(
    "event_type_lift",
    """
    WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
               FROM events WHERE ts IS NOT NULL),
    nb AS (SELECT count(*) AS n FROM
               (SELECT DISTINCT user_id, d FROM b)),
    per AS (SELECT event_type, count(*) AS n_t FROM b GROUP BY 1),
    p AS (SELECT a.user_id, a.d, a.event_type AS ta, x.event_type AS tb
          FROM b a JOIN b x
          ON a.user_id = x.user_id AND a.d = x.d
             AND a.event_type < x.event_type),
    pc AS (SELECT ta, tb, count(*) AS n_ab FROM p GROUP BY 1, 2)
    SELECT ta, tb, n_ab,
           round(CAST(n_ab AS DOUBLE) / nb.n, 4) AS support,
           round(CAST(n_ab AS DOUBLE) * nb.n
                 / (pa.n_t * CAST(pb.n_t AS DOUBLE)), 4) AS lift
    FROM pc
    JOIN per pa ON pa.event_type = pc.ta
    JOIN per pb ON pb.event_type = pc.tb
    CROSS JOIN nb
    """,
    doc="market-basket association over event types: baskets are "
    "(user, day); per type pair, co-occurrence count, support, and "
    "lift = P(ab)·N / (P(a)P(b)·N²) — all from EXACT distinct-basket "
    "integer counts, the ratios single double ops.  Pairs are "
    "generated basket-LOCALLY (the per-basket type set is bounded by "
    "the event-type vocabulary, ≤5 here), so the join never exceeds "
    "baskets × |types|²; type counts broadcast back onto the "
    "10-row pair rollup — the co-occurrence shape behind "
    "recommendation and anomaly lift analyses at any event volume",
)
def q_event_type_lift(spark, sf_dir):
    ev = _events(spark, sf_dir)
    b = (
        ev.where(F.col("ts").isNotNull())
        .select(
            "user_id",
            F.col("ts").cast("date").alias("d"),
            "event_type",
        )
        .distinct()
        .persist()  # three consumers: basket count, per-type, pairs
    )
    nb = b.select("user_id", "d").distinct().agg(
        F.count("*").alias("n")
    )
    per = b.groupBy("event_type").agg(F.count("*").alias("n_t"))
    other = b.select(
        F.col("user_id"),
        F.col("d"),
        F.col("event_type").alias("tb"),
    )
    pairs = (
        b.select("user_id", "d", F.col("event_type").alias("ta"))
        .join(other, ["user_id", "d"])
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("n_ab"))
    )
    pa = per.select(F.col("event_type").alias("ta"), F.col("n_t").alias("na"))
    pb = per.select(F.col("event_type").alias("tb"), F.col("n_t").alias("nbt"))
    return (
        pairs.join(F.broadcast(pa), "ta")
        .join(F.broadcast(pb), "tb")
        .crossJoin(F.broadcast(nb))
        .select(
            "ta",
            "tb",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("n"), 4).alias(
                "support"
            ),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n")
                / (F.col("na") * F.col("nbt").cast("double")),
                4,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# χ² term–source association
# ---------------------------------------------------------------------------


@register(
    "term_source_association",
    f"""
    WITH ex AS (
        SELECT source, unnest({D_TOKS}) AS term
        FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
    ts AS (SELECT source, term, count(*) AS o FROM ex GROUP BY 1, 2),
    t AS (SELECT term, sum(o) AS n_t FROM ts GROUP BY 1),
    s AS (SELECT source, sum(o) AS n_s FROM ts GROUP BY 1),
    tot AS (SELECT sum(o) AS n FROM ts),
    x AS (SELECT ts.source, ts.term, ts.o,
                 CAST(t.n_t AS DOUBLE) * s.n_s / tot.n AS e
          FROM ts JOIN t USING (term) JOIN s USING (source) CROSS JOIN tot),
    c AS (SELECT source, term, o,
                 round((o - e) * (o - e) / e, 4) AS chi2
          FROM x WHERE o > e),
    r AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
               ORDER BY chi2 DESC, term) AS INT) AS rk FROM c)
    SELECT source, term, CAST(o AS BIGINT) AS n_occurrences, chi2, rk
    FROM r WHERE rk <= 10
    """,
    doc="distinctive vocabulary per source: one-cell χ² score "
    "(O−E)²/E with E = n_term·n_source/N — observed and marginal "
    "counts are EXACT integer rollups of the token stream, the score "
    "single double ops, over-represented cells only (O > E), top-10 "
    "per source.  The (term, source) contingency table is one "
    "partial-agg'd shuffle; marginals are rollups OF the table, not "
    "re-scans; the rank window runs on the vocabulary-sized score "
    "relation.  The corpus-drift / domain-signature audit for "
    "multi-source 100 TB mixes",
)
def q_term_source_association(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    n = spark.sparkContext.defaultParallelism
    toks_arr = (
        docs.where(
            F.col("text").isNotNull() & F.col("source").isNotNull()
        )
        .repartition(n)
        .select(
            "source", F.split(F.trim(F.col("text")), r"\s+").alias("t")
        )
        .persist()  # Generate-pathology barrier
    )
    ts = (
        toks_arr.select("source", F.explode("t").alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("o"))
        .persist()  # three rollup consumers
    )
    t = ts.groupBy("term").agg(F.sum("o").alias("n_t"))
    s = ts.groupBy("source").agg(F.sum("o").alias("n_s"))
    tot = ts.agg(F.sum("o").alias("n"))
    e = F.col("n_t").cast("double") * F.col("n_s") / F.col("n")
    # MERGE hint on the per-TERM marginal (r7 broadcast audit:
    # vocab-scaled, explode-derived estimate); the per-source marginal
    # and the 1-row total stay explicitly broadcast — those ARE
    # bounded dimensions.
    scored = (
        ts.join(t.hint("merge"), "term")
        .join(F.broadcast(s), "source")
        .crossJoin(F.broadcast(tot))
        .withColumn("e", e)
        .where(F.col("o") > F.col("e"))
        .withColumn(
            "chi2",
            F.round(
                (F.col("o") - F.col("e"))
                * (F.col("o") - F.col("e"))
                / F.col("e"),
                4,
            ),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("chi2"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 10)
        .select(
            "source",
            "term",
            F.col("o").cast("bigint").alias("n_occurrences"),
            "chi2",
            "rk",
        )
    )


# ---------------------------------------------------------------------------
# A/B experimentation report
# ---------------------------------------------------------------------------


@register(
    "ab_test_report",
    """
    WITH u AS (
        SELECT user_id,
               CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 'A' ELSE 'B' END AS grp,
               max(CASE WHEN event_type = 'purchase' AND value > 150
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY 1, 2),
    g AS (SELECT
              CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_a,
              CAST(sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_b,
              CAST(sum(CASE WHEN grp = 'A' THEN converted ELSE 0 END)
                   AS BIGINT) AS conv_a,
              CAST(sum(CASE WHEN grp = 'B' THEN converted ELSE 0 END)
                   AS BIGINT) AS conv_b
          FROM u)
    SELECT n_a, n_b, conv_a, conv_b,
           round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
           round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
           CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
                THEN round((CAST(conv_a AS DOUBLE) / n_a
                            - CAST(conv_b AS DOUBLE) / n_b)
                           / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                                   / (n_a + n_b))
                                  * (1 - CAST(conv_a + conv_b AS DOUBLE)
                                         / (n_a + n_b))
                                  * (1.0 / n_a + 1.0 / n_b)), 4)
                ELSE NULL END AS z_score
    FROM g
    """,
    doc="A/B experimentation report: deterministic 50/50 assignment via "
    "the md5(user_id) hex threshold (the same engine-neutral selector "
    "family as the train/val split), per-arm user/conversion counts, "
    "and the pooled two-proportion z statistic — every input an EXACT "
    "integer count, the statistic single double ops on four scalars, "
    "bit-identical cross-engine; degenerate 0%/100% pooled arms "
    "emit NULL in both engines.  One user_id rollup + a 1-row "
    "reduction: the experimentation readout at any event volume",
)
def q_ab_test_report(spark, sf_dir):
    ev = _events(spark, sf_dir)
    grp = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
        F.lit("A"),
    ).otherwise(F.lit("B"))
    u = ev.groupBy("user_id", grp.alias("grp")).agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") > 150)
            ).cast("int")
        ).alias("converted")
    )
    g = u.agg(
        F.sum((F.col("grp") == "A").cast("int")).cast("bigint").alias("n_a"),
        F.sum((F.col("grp") == "B").cast("int")).cast("bigint").alias("n_b"),
        F.sum(
            F.when(F.col("grp") == "A", F.col("converted")).otherwise(0)
        ).cast("bigint").alias("conv_a"),
        F.sum(
            F.when(F.col("grp") == "B", F.col("converted")).otherwise(0)
        ).cast("bigint").alias("conv_b"),
    )
    pa = F.col("conv_a").cast("double") / F.col("n_a")
    pb = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    nconv = F.col("conv_a") + F.col("conv_b")
    ntot = F.col("n_a") + F.col("n_b")
    # Degenerate arms (0% or 100% pooled conversion) make the z
    # denominator 0: emit NULL in BOTH engines instead of Spark's ANSI
    # divide-by-zero error vs DuckDB's inf (fixture-regeneration-proof).
    z = F.when(
        (nconv > 0) & (nconv < ntot),
        F.round(
            (pa - pb)
            / F.sqrt(
                pooled
                * (1 - pooled)
                * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
            ),
            4,
        ),
    )
    return g.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        z.alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Dedup-graph topology stats (triangle counting)
# ---------------------------------------------------------------------------


@register(
    "dedup_graph_stats",
    f"""
    WITH {_MINHASH_CTES},
    e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
    nodes AS (SELECT a AS v FROM e UNION SELECT b FROM e),
    deg AS (SELECT v, count(*) AS d
            FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
            GROUP BY v),
    tri AS (SELECT count(*) AS n
            FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
    SELECT (SELECT count(*) FROM nodes) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges,
           (SELECT max(d) FROM deg) AS max_degree,
           (SELECT n FROM tri) AS n_triangles
    """,
    doc="topology audit of the near-dup graph before clustering: node/"
    "edge counts, max degree (the boilerplate-hub detector — a doc "
    "near-duplicating hundreds of others IS boilerplate), and the "
    "triangle count (triangle-dense graphs collapse into tight "
    "clusters; sparse chains are transcription drift).  Triangles via "
    "the ordered-edge double join (a<b<c by construction, so each "
    "triangle counts exactly once) — the standard distributed shape, "
    "cost ∝ Σ degree², never materializing wedges beyond the join",
)
def q_dedup_graph_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    e = (
        dedup.minhash_candidates(docs, limit=None)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .persist()  # consumed by nodes, degrees, and the triangle join ×3
    )
    n_edges = e.agg(F.count("*").alias("n_edges"))
    nodes = e.select(F.col("a").alias("v")).union(
        e.select(F.col("b").alias("v"))
    )
    n_nodes = nodes.distinct().agg(F.count("*").alias("n_nodes"))
    max_deg = (
        nodes.groupBy("v")
        .agg(F.count("*").alias("d"))
        .agg(F.max("d").alias("max_degree"))
    )
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    # MERGE hints (r7 broadcast audit): every side of the triangle
    # double join is the edge list itself — candidate-bounded but
    # CORPUS-scaled, so a mis-estimated broadcast is the ngram-class
    # driver OOM; SMJ spills instead.
    tri = (
        e.join(e2.hint("merge"), "b")
        .join(
            e3.hint("merge"),
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        n_nodes.crossJoin(n_edges).crossJoin(max_deg).crossJoin(tri)
    )


# ---------------------------------------------------------------------------
# Arrow-batched model inference (classifier-over-corpus shape)
# ---------------------------------------------------------------------------


@register(
    "doc_model_scores",
    """
    WITH f AS (
        SELECT doc_id, n_chars,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               len(list_distinct(string_split_regex(trim(text), '\\s+')))
                   AS n_distinct
        FROM documents WHERE text IS NOT NULL),
    z AS (SELECT doc_id,
                 -1.0 + -0.002 * n_chars + 0.05 * n_tokens
                      + 0.08 * n_distinct AS zv
          FROM f)
    SELECT doc_id,
           round(zv / (1 + abs(zv)), 6) AS score,
           zv / (1 + abs(zv)) > 0 AS kept
    FROM z
    """,
    doc="classifier-over-corpus: the Arrow-batched model-inference "
    "pipeline (functions/inference.py) — features computed JVM-side "
    "as exact integer expressions (Python never sees raw text), then "
    "a mapInPandas stage scores NARROW numeric batches with a model "
    "loaded once per task (the swap-in point for a real torch/onnx "
    "quality classifier).  The stub model is linear + the rational "
    "sigmoid z/(1+|z|) — exp()-free, so scores are IEEE-exact and the "
    "whole Arrow path is hash-checked against the same formula in "
    "SQL.  At 100 TB this stage is embarrassingly parallel; batch "
    "size rides spark.sql.execution.arrow.maxRecordsPerBatch",
)
def q_doc_model_scores(spark, sf_dir):
    from realtime_data_pipeline_spark.functions import inference

    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    feats = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )
    scored = inference.batch_score(feats)
    return scored.select(
        "doc_id",
        F.round(F.col("score"), 6).alias("score"),
        (F.col("score") > 0).alias("kept"),
    )


# ---------------------------------------------------------------------------
# MinHash estimate calibration (sketch-quality audit)
# ---------------------------------------------------------------------------


@register(
    "minhash_calibration_report",
    f"""
    WITH {_MINHASH_CTES},
    ds AS (SELECT doc_id, list_distinct(h) AS s FROM sh),
    sz AS (SELECT doc_id, len(s) AS n FROM ds),
    ex AS (SELECT doc_id, unnest(s) AS g FROM ds),
    tru AS (SELECT p.doc_a, p.doc_b, count(*) AS shared
            FROM pairs p
            JOIN ex a ON a.doc_id = p.doc_a
            JOIN ex b ON b.doc_id = p.doc_b AND b.g = a.g
            GROUP BY 1, 2),
    jj AS (SELECT p.doc_a, p.doc_b, p.est_jaccard,
                  coalesce(t.shared, 0) AS shared,
                  na.n + nb.n - coalesce(t.shared, 0) AS uni
           FROM pairs p
           LEFT JOIN tru t ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
           JOIN sz na ON na.doc_id = p.doc_a
           JOIN sz nb ON nb.doc_id = p.doc_b),
    b AS (SELECT *,
                 CAST(least(floor(est_jaccard * 5), 4) AS INT) AS est_band,
                 round(CAST(shared AS DOUBLE) / uni, 4) AS true_j
          FROM jj)
    SELECT est_band, count(*) AS n_pairs,
           round(CAST(sum(shared) AS DOUBLE) / sum(uni), 4)
               AS micro_true_jaccard,
           CAST(sum(CASE WHEN abs(est_jaccard - true_j) <= 0.2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within_02
    FROM b GROUP BY 1
    """,
    doc="sketch-quality audit: for every MinHash-LSH candidate pair, "
    "the signature-agreement Jaccard ESTIMATE vs the TRUE shingle-set "
    "Jaccard, rolled up by estimate band — how trustworthy is the "
    "12-perm sketch before you delete documents with it?  Per band: "
    "pair count, micro-averaged true Jaccard (Σshared/Σunion — EXACT "
    "integer sums, not an order-dependent mean of ratios), and the "
    "count within ±0.2 of the estimate (per-pair boolean on "
    "deterministic doubles).  True-Jaccard join is pair-bounded "
    "(explode only candidate docs' shingles, equi-join on (doc, "
    "shingle)) — cost ∝ candidates × doc length, never corpus²",
)
def q_minhash_calibration_report(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_candidates(docs, limit=None)
    sh = dedup.shingle_sets(docs)
    # True shared count via the compact per-doc array relation + a
    # map-side array_intersect (the ngram_jaccard_pairs phase-2 shape,
    # r7 broadcast audit): the pair list is a distinct-over-explode
    # output the planner cannot size — unhinted it chose to broadcast
    # the corpus-scaled side (the ngram-class driver OOM), and the
    # exploded (doc, shingle) join moved 48× the bytes of the compact
    # arrays.  MERGE, not SHUFFLE_HASH (r8): a ShuffledHashJoin's
    # per-task hash build cannot spill and threw
    # cannotAcquireMemoryToBuildLongHashedRelation at the 5M-doc soak
    # step (see ngram_jaccard_pairs) — sort-merge spills gracefully.
    # The LEFT join of the old form is gone because every pair gets
    # its exact |A∩B| directly (0 when disjoint).
    sa = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh").alias("sa"),
        F.col("n_sh").alias("na"),
    )
    sb = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh").alias("sb"),
        F.col("n_sh").alias("nb"),
    )
    jj = (
        pairs.join(sa.hint("merge"), "doc_a")
        .join(sb.hint("merge"), "doc_b")
        .withColumn("shared", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "uni", F.col("na") + F.col("nb") - F.col("shared")
        )
        .withColumn(
            "true_j",
            F.round(F.col("shared").cast("double") / F.col("uni"), 4),
        )
        .withColumn(
            "est_band",
            F.least(F.floor(F.col("est_jaccard") * 5), F.lit(4)).cast(
                "int"
            ),
        )
    )
    return jj.groupBy("est_band").agg(
        F.count("*").alias("n_pairs"),
        F.round(
            F.sum("shared").cast("double") / F.sum("uni"), 4
        ).alias("micro_true_jaccard"),
        F.sum(
            (
                F.abs(F.col("est_jaccard") - F.col("true_j")) <= 0.2
            ).cast("int")
        )
        .cast("bigint")
        .alias("n_within_02"),
    )


# ---------------------------------------------------------------------------
# Embedding int8 quantization audit
# ---------------------------------------------------------------------------


@register(
    "embedding_quantization_report",
    """
    WITH v AS (
        SELECT vec_id, label, embedding,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
                   AS scale
        FROM embeddings WHERE embedding IS NOT NULL),
    q AS (
        SELECT vec_id, label, scale,
               len(embedding) AS dim,
               list_reduce(
                   list_transform(embedding, x ->
                       pow(CAST(x AS DOUBLE)
                           - round(CAST(x AS DOUBLE) / scale * 127)
                             * scale / 127, 2)),
                   (a, b) -> a + b) AS sse
        FROM v WHERE scale > 0)
    SELECT vec_id, label,
           round(scale, 6) AS max_abs,
           round(sse / dim, 9) AS mse
    FROM q
    """,
    doc="int8 symmetric quantization audit for the embedding store (the "
    "4× memory lever before ANN serving): per vector, the max-abs "
    "scale and the reconstruction MSE of round(x/scale·127) — all "
    "element math is per-array higher-order functions, and the SSE is "
    "an IN-ORDER sequential reduce over the array (F.aggregate / "
    "list_reduce, same element order in both engines — array order is "
    "data, not execution order), so the report is bit-identical "
    "cross-engine with zero shuffles: a pure map over the store",
)
def q_embedding_quantization_report(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    x = F.transform(F.col("embedding"), lambda e: e.cast("double"))
    scale = F.array_max(F.transform(x, F.abs))
    v = emb.where(F.col("embedding").isNotNull()).select(
        "vec_id", "label", x.alias("xd"), scale.alias("scale")
    ).where(F.col("scale") > 0)
    err2 = F.transform(
        F.col("xd"),
        lambda e: F.pow(
            e
            - F.round(e / F.col("scale") * 127) * F.col("scale") / 127,
            F.lit(2),
        ),
    )
    sse = F.aggregate(err2, F.lit(0.0), lambda acc, t: acc + t)
    return v.select(
        "vec_id",
        "label",
        F.round(F.col("scale"), 6).alias("max_abs"),
        F.round(sse / F.size("xd"), 9).alias("mse"),
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit
# ---------------------------------------------------------------------------


@register(
    "referential_integrity_audit",
    """
    SELECT
        (SELECT count(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey))
            AS orphan_lineitems,
        (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_orderkey = o.o_orderkey))
            AS childless_orders,
        (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey))
            AS orphan_orders,
        (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)
            AS null_lineitem_fk,
        (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
            AS null_order_fk
    """,
    doc="referential-integrity audit over the star schema: orphan "
    "facts (lineitems without orders, orders without customers), "
    "childless orders, and NULL foreign keys — the pre-flight check "
    "any 100 TB warehouse load runs before trusting joins.  Each "
    "orphan count is a LEFT ANTI join (shuffle or broadcast, "
    "Catalyst's choice) feeding a 1-row count; the five scalars "
    "assemble via 1-row cross joins — O(1) driver payload",
)
def q_referential_integrity_audit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    orphan_li = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").alias("orphan_lineitems"))
    )
    childless = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .agg(F.count("*").alias("childless_orders"))
    )
    orphan_o = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count("*").alias("orphan_orders"))
    )
    null_li = li.where(F.col("l_orderkey").isNull()).agg(
        F.count("*").alias("null_lineitem_fk")
    )
    null_o = orders.where(F.col("o_custkey").isNull()).agg(
        F.count("*").alias("null_order_fk")
    )
    return (
        orphan_li.crossJoin(childless)
        .crossJoin(orphan_o)
        .crossJoin(null_li)
        .crossJoin(null_o)
    )


# ---------------------------------------------------------------------------
# Per-user activity trend (closed-form least squares)
# ---------------------------------------------------------------------------


@register(
    "user_activity_trend",
    """
    WITH d AS (
        SELECT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
               count(*) AS y
        FROM events GROUP BY 1, 2),
    s AS (SELECT user_id, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(x * y) AS sxy
          FROM d GROUP BY 1)
    SELECT user_id, CAST(n AS BIGINT) AS n_days,
           CAST(sy AS BIGINT) AS total_events,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx), 6) AS slope_per_day
    FROM s WHERE n >= 2
    """,
    doc="per-user activity trend: closed-form least-squares slope of "
    "daily event counts vs day index — slope = (nΣxy − ΣxΣy)/(nΣx² − "
    "(Σx)²), every term an EXACT int64 sum (x ≈ 2·10⁴ days, so Σx² "
    "fits int64 with 10⁸ headroom), the slope one double division — "
    "bit-identical cross-engine, no stddev/covar_pop engine variance. "
    "Two keyed rollups, (user,day) then user — two exchanges, both "
    "carrying partial aggregates (pre-partitioning raw events on "
    "user_id would save one exchange but ship raw rows; partial-agg'd "
    "shuffles win at 100 TB) — the trend-feature shape a behavioral "
    "model's feature store computes at scale",
)
def q_user_activity_trend(spark, sf_dir):
    ev = _events(spark, sf_dir)
    d = (
        ev.groupBy(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("x"),
        )
        .agg(F.count("*").alias("y"))
    )
    s = d.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.where(F.col("n") >= 2).select(
        "user_id",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("sy").cast("bigint").alias("total_events"),
        F.round(num.cast("double") / den, 6).alias("slope_per_day"),
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands run detection
# ---------------------------------------------------------------------------


@register(
    "event_type_islands",
    """
    WITH o AS (SELECT user_id, event_type, ts, event_id,
                      lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev
               FROM events WHERE ts IS NOT NULL),
    f AS (SELECT *, CASE WHEN prev IS NULL OR prev != event_type
                         THEN 1 ELSE 0 END AS flg FROM o),
    r AS (SELECT user_id, event_type,
                 sum(flg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS run_id
          FROM f),
    runs AS (SELECT user_id, run_id, event_type, count(*) AS run_len
             FROM r GROUP BY 1, 2, 3)
    SELECT event_type, count(*) AS n_runs,
           CAST(max(run_len) AS BIGINT) AS max_run_len,
           round(CAST(sum(run_len) AS DOUBLE) / count(*), 4) AS avg_run_len
    FROM runs GROUP BY 1
    """,
    doc="gaps-and-islands: maximal runs of consecutive same-type events "
    "per user (lag-change flag → running-sum run ids → run rollup), "
    "reported per event type.  The run-id window, the change flag, and "
    "the (user,run,type) rollup all consume ONE user_id exchange — "
    "HashPartitioning(user_id) satisfies the superset-key clustering, "
    "so no second fact shuffle; ordering is (ts, event_id), unique by "
    "construction, so runs are engine-independent",
)
def q_event_type_islands(spark, sf_dir):
    ev = _events(spark, sf_dir).where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    flg = F.when(
        prev.isNull() | (prev != F.col("event_type")), F.lit(1)
    ).otherwise(F.lit(0))
    runs = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("flg", flg)
        .withColumn(
            "run_id",
            F.sum("flg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "run_id", "event_type")
        .agg(F.count("*").alias("run_len"))
    )
    return runs.groupBy("event_type").agg(
        F.count("*").alias("n_runs"),
        F.max("run_len").cast("bigint").alias("max_run_len"),
        F.round(
            F.sum("run_len").cast("double") / F.count("*"), 4
        ).alias("avg_run_len"),
    )
