"""Training-data pipeline + behavioral-analytics queries.

Extends the north-star LLM-data surface (northstar.py) with the
dataset-assembly operators a pretraining pipeline runs after curation:

  * train_split_counts    — deterministic hash split into train/val/test
  * mixture_sample_stats  — per-source rate sampling (data-mixture weights)
  * sequence_packing_stats — concat-and-chunk packing of docs into
                            fixed-capacity context windows
  * vocab_oov_rates       — top-K vocabulary build + out-of-vocabulary
                            rate per language
  * shard_skew_stats      — hash-shard balance audit (write skew)

plus two event-stream behavioral shapes the reference's dashboard
family implies but never builds (reporting/reporting.py:94-191 stops at
single-table KPIs):

  * funnel_conversion        — staged view→click→purchase funnel with
                               strict event-time ordering
  * weekly_cohort_retention  — first-seen weekly cohorts × activity week

Cross-engine determinism: every selector is md5-hex based (identical
hex both engines — same trick as northstar.py's D_HASH32), every ratio
divides exact integer/decimal sums once and rounds to 4 digits, and
every ordering has a total tie-break.

Scale posture (100 TB): the hash split/sample/shard operators are
embarrassingly parallel single-pass map-side expressions followed by
one partial+final aggregation — no joins, no skew (md5 is uniform).
Packing windows partition by `lang` (at real scale: by shard key), so
no global sort exists.  The vocabulary join broadcasts a top-K that is
small by construction.  The funnel is one scan of events and one
`user_id` exchange: chained whole-partition window minima, then a
partition-preserving per-user rollup.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from realtime_data_pipeline_spark.functions import text
from realtime_data_pipeline_spark.plans.northstar import (
    _MINHASH_CTES,
    CLUSTER_MIN_EST,
    D_TOKS,
)
from realtime_data_pipeline_spark.plans.registry import _events, _t, register

# ---------------------------------------------------------------------------
# Shared hash selectors (Spark expr + DuckDB twin generated from the
# same constants so the two sides cannot drift)
# ---------------------------------------------------------------------------

# train/val/test split by lexicographic thresholds on the md5 hex of
# the doc id: hex chars are uniform, so 'd0' ≈ 81.25 %, 'e8' ≈ 90.6 %.
SPLIT_THRESHOLDS = (("train", "d0"), ("val", "e8"))

# data-mixture sampling: source tier → keep percentage.
MIXTURE_TIERS = ((5, 100), (10, 50), (15, 25))  # index <5→100%, <10→50%, <15→25%
MIXTURE_DEFAULT_PCT = 10

PACK_CAPACITY = 256  # tokens per packed context window
VOCAB_TOP_K = 8  # top-K vocabulary size (31 distinct tokens at sf0.01)
N_SHARDS = 64


def _doc_hash_col():
    return F.md5(F.col("doc_id").cast("string"))


_D_DOC_HASH = "md5(CAST(doc_id AS VARCHAR))"


def _split_of(id_col):
    """Split selector from any doc-id column — a pure expression, so a
    pair's two splits are computable without joining back to documents."""
    h = F.md5(id_col.cast("string"))
    c = F.when(h < SPLIT_THRESHOLDS[0][1], SPLIT_THRESHOLDS[0][0])
    for name, bound in SPLIT_THRESHOLDS[1:]:
        c = c.when(h < bound, name)
    return c.otherwise("test")


def _split_col():
    return _split_of(F.col("doc_id"))


def _d_split_of(col: str) -> str:
    return (
        "CASE "
        + " ".join(
            f"WHEN md5(CAST({col} AS VARCHAR)) < '{b}' THEN '{n}'"
            for n, b in SPLIT_THRESHOLDS
        )
        + " ELSE 'test' END"
    )


_D_SPLIT = (
    "CASE "
    + " ".join(f"WHEN h < '{b}' THEN '{n}'" for n, b in SPLIT_THRESHOLDS)
    + " ELSE 'test' END"
)


@register(
    "train_split_counts",
    f"""
    SELECT {_D_SPLIT} AS split, lang,
           count(*) AS n_docs,
           CAST(sum(len({D_TOKS})) AS BIGINT) AS total_tokens
    FROM (SELECT *, {_D_DOC_HASH} AS h FROM documents)
    GROUP BY 1, 2
    """,
    doc="deterministic train/val/test split: lexicographic thresholds on "
    "md5(doc_id) hex — a pure map-side selector (no shuffle beyond the "
    "final rollup), reproducible across runs and engines, stratified "
    "report per language",
)
def q_train_split_counts(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            _split_col().alias("split"),
            "lang",
            text.token_count().alias("nt"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("total_tokens"),
        )
    )


def _src_index():
    # try_cast, not cast: a source that doesn't follow the 'srcN'
    # convention (foreign ingest, unicode names) must fall through to
    # the default mixture tier as NULL, not throw under ANSI mode —
    # mirrored by TRY_CAST in _D_RATE (unicode-fixture harness)
    return F.substring(F.col("source"), 4, 8).try_cast("int")


def _rate_pct_col():
    idx = _src_index()
    c = F.when(idx < MIXTURE_TIERS[0][0], MIXTURE_TIERS[0][1])
    for bound, pct in MIXTURE_TIERS[1:]:
        c = c.when(idx < bound, pct)
    return c.otherwise(MIXTURE_DEFAULT_PCT)


_D_RATE = (
    "CASE "
    + " ".join(
        f"WHEN TRY_CAST(substr(source, 4) AS INTEGER) < {b} THEN {p}"
        for b, p in MIXTURE_TIERS
    )
    + f" ELSE {MIXTURE_DEFAULT_PCT} END"
)

# sampling bucket: 4 hex chars of md5("<doc_id>:<source>") mod 100 —
# uniform in [0,100), exact integer arithmetic on both engines.
_D_BUCKET = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 4))"
    "::BIGINT % 100)"
)


def _bucket_col():
    # F.concat, NOT concat_ws: concat_ws SKIPS NULL args, so a NULL
    # source would silently bucket by doc_id alone while the SQL
    # oracle's `|| ':' || source` NULL-propagates (bucket NULL → never
    # kept).  concat matches the SQL semantics.
    h = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))
    )
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % 100


@register(
    "mixture_sample_stats",
    f"""
    SELECT source, rate_pct,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN bucket < rate_pct THEN nt ELSE 0 END) AS BIGINT)
               AS kept_tokens
    FROM (SELECT source, {_D_RATE} AS rate_pct, {_D_BUCKET} AS bucket,
                 len({D_TOKS}) AS nt
          FROM documents)
    GROUP BY 1, 2
    """,
    doc="data-mixture sampling: per-source keep-rate tiers applied via a "
    "deterministic hash bucket (md5 of doc_id:source mod 100) — the "
    "standard reproducible downsampling used to hit mixture weights; "
    "map-side only, one rollup shuffle",
)
def q_mixture_sample_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    kept = F.col("bucket") < F.col("rate_pct")
    return (
        docs.select(
            "source",
            _rate_pct_col().alias("rate_pct"),
            _bucket_col().alias("bucket"),
            text.token_count().alias("nt"),
        )
        .groupBy("source", "rate_pct")
        .agg(
            F.count("*").alias("n_docs"),
            # when/otherwise, not kept.cast(int): a NULL bucket (NULL
            # source) must count 0 like the oracle's CASE, and sum over
            # an all-NULL group would yield NULL instead of 0
            F.sum(F.when(kept, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(kept, F.col("nt")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
    )


@register(
    "sequence_packing_stats",
    f"""
    WITH t AS (
        SELECT lang, doc_id, len({D_TOKS}) AS nt FROM documents
    ), c AS (
        SELECT lang, nt,
               sum(nt) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM t
    ), b AS (
        SELECT lang, nt, (cum - nt) // {PACK_CAPACITY} AS bin FROM c
    )
    SELECT lang,
           count(DISTINCT bin) AS n_bins,
           count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS total_tokens,
           CAST(round(CAST(count(*) AS DOUBLE) / count(DISTINCT bin), 4)
                AS DOUBLE) AS avg_docs_per_bin,
           CAST(round(CAST(sum(nt) AS DOUBLE)
                      / (count(DISTINCT bin) * {PACK_CAPACITY}), 4)
                AS DOUBLE) AS avg_bin_fill
    FROM b GROUP BY lang
    """,
    doc=f"concat-and-chunk sequence packing: docs ordered by id within a "
    f"language stream, assigned to the {PACK_CAPACITY}-token context "
    "window containing their start offset (the standard pretraining "
    "packing rule).  The running offset is a PARTITIONED window cumsum "
    "— never a global single-partition sort; at real scale the "
    "partition key is the shard id",
)
def q_sequence_packing_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = (
        docs.select("lang", "doc_id", text.token_count().alias("nt"))
        .withColumn("cum", F.sum("nt").over(w))
        .withColumn("bin", F.expr(f"(cum - nt) div {PACK_CAPACITY}"))
    )
    n_bins = F.countDistinct("bin")
    n_docs = F.count("*")
    tot = F.sum("nt")
    return b.groupBy("lang").agg(
        n_bins.alias("n_bins"),
        n_docs.alias("n_docs"),
        tot.cast("bigint").alias("total_tokens"),
        F.round(n_docs.cast("double") / n_bins, 4).alias("avg_docs_per_bin"),
        F.round(tot.cast("double") / (n_bins * PACK_CAPACITY), 4).alias(
            "avg_bin_fill"
        ),
    )


@register(
    "vocab_oov_rates",
    f"""
    WITH toks AS (
        SELECT lang, unnest({D_TOKS}) AS tok FROM documents
    ), vocab AS (
        SELECT tok AS vtok
        FROM (SELECT tok, count(*) AS c FROM toks GROUP BY tok
              ORDER BY c DESC, tok ASC LIMIT {VOCAB_TOP_K})
    )
    SELECT lang,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS oov_tokens,
           CAST(round(CAST(sum(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END)
                           AS DOUBLE) / count(*), 4) AS DOUBLE) AS oov_rate
    FROM toks LEFT JOIN vocab ON tok = vtok
    GROUP BY lang
    """,
    doc=f"tokenizer-vocabulary coverage: build the top-{VOCAB_TOP_K} corpus "
    "vocabulary (count desc, token asc tie-break), then per-language "
    "out-of-vocabulary token rate via a BROADCAST left join of the "
    "exploded token stream against the (small by construction) vocab.  "
    "The rate divides two exact integer sums once — order-independent",
)
def q_vocab_oov_rates(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(text.tokens()).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .count()
        .orderBy(F.desc("count"), F.asc("tok"))
        .limit(VOCAB_TOP_K)
        .select(F.col("tok").alias("vtok"))
    )
    oov = F.col("vtok").isNull().cast("int")
    return (
        toks.join(F.broadcast(vocab), toks.tok == F.col("vtok"), "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(oov).cast("bigint").alias("oov_tokens"),
            F.round(F.sum(oov).cast("double") / F.count("*"), 4).alias(
                "oov_rate"
            ),
        )
    )


@register(
    "shard_skew_stats",
    f"""
    WITH s AS (
        SELECT (('0x' || substr({_D_DOC_HASH}, 1, 4))::BIGINT % {N_SHARDS})
                   AS shard,
               count(*) AS n
        FROM documents GROUP BY 1
    )
    SELECT count(*) AS n_shards,
           CAST(min(n) AS BIGINT) AS min_docs,
           CAST(max(n) AS BIGINT) AS max_docs,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(round(CAST(max(n) * count(*) AS DOUBLE) / sum(n), 4)
                AS DOUBLE) AS skew
    FROM s
    """,
    doc=f"hash-shard balance audit for the {N_SHARDS}-way write layout: "
    "docs-per-shard min/max and skew = max/mean — the number that says "
    "whether a 1000-executor write stalls on a straggler shard.  Two "
    "cheap aggregations; skew computed from exact integers",
)
def q_shard_skew_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(_doc_hash_col(), 1, 4), 16, 10).cast("bigint")
        % N_SHARDS
    )
    per = docs.groupBy(shard.alias("shard")).agg(F.count("*").alias("n"))
    n_shards = F.count("*")
    return per.agg(
        n_shards.alias("n_shards"),
        F.min("n").cast("bigint").alias("min_docs"),
        F.max("n").cast("bigint").alias("max_docs"),
        F.sum("n").cast("bigint").alias("n_docs"),
        F.round(
            (F.max("n") * n_shards).cast("double") / F.sum("n"), 4
        ).alias("skew"),
    )


# ---------------------------------------------------------------------------
# Behavioral shapes over the event stream
# ---------------------------------------------------------------------------


@register(
    "funnel_conversion",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY 1
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
    ), p AS (
        SELECT DISTINCT e.user_id
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    )
    SELECT (SELECT count(*) FROM v) AS n_view_users,
           (SELECT count(*) FROM c) AS n_click_after_view,
           (SELECT count(*) FROM p) AS n_purchase_after_click
    """,
    doc="staged conversion funnel with strict event-time ordering: first "
    "view, then a click after it, then a purchase after that.  ONE scan "
    "of events and ONE user_id exchange: the three stage timestamps are "
    "chained whole-partition window minima (each Window operator reuses "
    "the child's hash partitioning), the per-user rollup aggregates the "
    "already-partitioned rows without re-shuffling, and only the final "
    "3-number reduction crosses a SinglePartition exchange.  The "
    "round-3 form joined three keyed sub-aggregates, which planned 8 "
    "exchanges and 3 scans of events",
)
def q_funnel_conversion(spark, sf_dir):
    ev = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    return funnel_counts(ev)


def funnel_counts(ev):
    """Strict-ordering staged funnel over an events frame with
    (user_id, ts, event_type).  Separated from the registry entry so
    edge-case semantics (stage skipping, out-of-order stages) are unit-
    testable on crafted fixtures — the parquet testdata saturates all
    three stages, which would let an any-count bug through."""
    w = Window.partitionBy("user_id")
    ts, et = F.col("ts"), F.col("event_type")
    staged = (
        ev.select("user_id", "ts", "event_type")
        .withColumn("t_view", F.min(F.when(et == "view", ts)).over(w))
        .withColumn(
            "t_click",
            F.min(F.when((et == "click") & (ts > F.col("t_view")), ts)).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when((et == "purchase") & (ts > F.col("t_click")), ts)
            ).over(w),
        )
    )
    # one row per user; the groupBy consumes the window's partitioning,
    # so no exchange here — F.first is deterministic (all rows of a
    # user carry identical whole-partition window values)
    per_user = staged.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.first("t_click").alias("t_click"),
        F.first("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_view_users"),
        F.count("t_click").alias("n_click_after_view"),
        F.count("t_purchase").alias("n_purchase_after_click"),
    )


@register(
    "weekly_cohort_retention",
    """
    WITH wk AS (
        SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS activity_week
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), cohort AS (
        SELECT user_id, min(activity_week) AS cohort_week FROM wk GROUP BY 1
    )
    SELECT cohort_week, activity_week, count(DISTINCT wk.user_id) AS n_users
    FROM wk JOIN cohort ON wk.user_id = cohort.user_id
    GROUP BY 1, 2
    """,
    doc="weekly cohort retention: users bucketed by first-seen week, "
    "counted per (cohort week, activity week).  The cohort aggregate "
    "and the join both key on user_id (one shuffle, reused); the final "
    "rollup groups a small (weeks × weeks) result.  Week start (Monday) "
    "is computed with pure DATE arithmetic — `date_trunc` on a "
    "timestamp routes through the session timezone in one engine and "
    "not the other, so a tz-immune formulation is required for the "
    "cross-engine hash",
)
def q_weekly_cohort_retention(spark, sf_dir):
    d = F.to_date("ts")
    monday = F.date_sub(d, (F.dayofweek(d) + F.lit(5)) % 7)
    wk = (
        _events(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", monday.cast("timestamp_ntz").alias("activity_week"))
    )
    cohort = wk.groupBy("user_id").agg(
        F.min("activity_week").alias("cohort_week")
    )
    return (
        wk.join(cohort, "user_id")
        .groupBy("cohort_week", "activity_week")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


SESSION_GAP_MIN = 30  # inactivity gap that closes a session


@register(
    "user_session_stats",
    f"""
    WITH e AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts, event_id,
               sum(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS session_id
        FROM e
    ), per_sess AS (
        SELECT user_id, session_id, count(*) AS n_events,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        FROM s GROUP BY 1, 2
    )
    SELECT user_id,
           count(*) AS n_sessions,
           CAST(max(n_events) AS BIGINT) AS max_session_events,
           CAST(round(CAST(sum(dur_us) AS DOUBLE) / (count(*) * 1e6), 4)
                AS DOUBLE) AS avg_session_sec
    FROM per_sess GROUP BY user_id
    """,
    doc=f"gap-based sessionization: a session break is a >"
    f"{SESSION_GAP_MIN} min silence; session id = running sum of break "
    "flags (lag + windowed cumsum — pure built-ins, ONE exchange on "
    "user_id serving both window passes and the final rollup).  This "
    "is the custom-session-id operator; F.session_window "
    "(session_window_counts) is its aggregate-only sibling.  Durations "
    "aggregate as exact integer µs and divide once at the end",
)
def q_user_session_stats(spark, sf_dir):
    # exact integer µs (ts.cast("long") would truncate to SECONDS and
    # disagree with the oracle's epoch_us); session tz is pinned UTC so
    # the NTZ→instant cast is identity.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap = us - F.lag(us).over(w)
    e = (
        _events(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withColumn("us", us)
        .withColumn(
            "new_sess",
            F.when(gap > SESSION_GAP_MIN * 60 * 1_000_000, 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_sess").over(wcum))
    )
    per_sess = e.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("dur_us"),
    )
    return per_sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").cast("bigint").alias("max_session_events"),
        F.round(F.sum("dur_us").cast("double") / (F.count("*") * 1_000_000), 4)
        .alias("avg_session_sec"),
    )


@register(
    "ffd_packing_stats",
    None,  # sequential per-group state — not SQL-expressible; the
    # driver records the rows-only check and tests/test_packing.py
    # pins the correctness envelope (bin loads ≤ capacity, bin-count
    # bounds, determinism, a hand-computed case).
    doc="first-fit-decreasing bin packing per (shard, lang) via the "
    "applyInPandas grouped-map escape hatch (the no-split sibling of "
    "sequence_packing_stats): inherently sequential per group, "
    "parallel across groups — the md5 shard key bounds each group to "
    "~1/n_shards of its language, so parallelism scales with shards "
    "instead of capping at the language count (VERDICT r2 item 6)",
)
def q_ffd_packing_stats(spark, sf_dir):
    from realtime_data_pipeline_spark.functions import packing

    docs = _t(spark, sf_dir, "documents")
    return packing.ffd_packing_stats(docs, PACK_CAPACITY, n_shards=4)


@register(
    "ffd_packing_report",
    # Invariant oracle (kmeans_codebook_report pattern): the per-group
    # bin ASSIGNMENT is sequential state no SQL can replay, but three
    # mathematical invariants of any first-fit packing are checkable,
    # and the group/doc/token totals are exact SQL aggregates — this is
    # the hash-checkable sibling of the rows-only ffd_packing_stats.
    f"""
    WITH s AS (SELECT (('0x' || substr({_D_DOC_HASH}, 1, 4))::BIGINT % 4)
                          AS shard,
                      lang, len({D_TOKS}) AS nt
               FROM documents)
    SELECT count(DISTINCT (shard, lang)) AS n_groups,
           count(*) AS n_docs,
           CAST(coalesce(sum(nt), 0) AS BIGINT) AS total_tokens,
           TRUE AS capacity_ok,
           TRUE AS lower_bound_ok,
           TRUE AS half_full_ok
    FROM s
    """,
    doc="FFD packing invariants, measured over the REAL applyInPandas "
    "packing run and reduced to one row: totals conserved (n_groups / "
    "n_docs / total_tokens are exact and SQL-mirrored), every "
    "non-overflow bin within capacity, per-group bin count between "
    "the token-sum lower bound ceil((total - overflow)/capacity) + "
    "overflow solo bins and the any-fit half-full upper bound "
    "floor(2*(total - overflow)/capacity) + 1 + overflow (all but one "
    "non-overflow bin is > half full, or the later bin's first doc "
    "would have fit in the earlier)",
)
def q_ffd_packing_report(spark, sf_dir):
    from realtime_data_pipeline_spark.functions import packing

    stats = packing.ffd_packing_stats(
        _t(spark, sf_dir, "documents"), PACK_CAPACITY, n_shards=4
    )
    packed = F.col("total_tokens") - F.col("overflow_tokens")
    nonoverflow_bins = F.col("n_bins") - F.col("n_overflow")
    # coalesce: aggregates over ZERO groups (empty corpus) are null;
    # the report stays well-typed — 0 totals, vacuously-true invariants
    return stats.agg(
        F.count("*").alias("n_groups"),
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
        F.coalesce(F.sum("total_tokens"), F.lit(0)).alias("total_tokens"),
        F.coalesce(
            F.bool_and(
                (F.col("max_bin_tokens") <= PACK_CAPACITY)
                | (F.col("n_overflow") > 0)
            ),
            F.lit(True),
        ).alias("capacity_ok"),
        F.coalesce(
            F.bool_and(
                nonoverflow_bins >= F.ceil(packed / F.lit(PACK_CAPACITY))
            ),
            F.lit(True),
        ).alias("lower_bound_ok"),
        F.coalesce(
            F.bool_and(
                nonoverflow_bins
                <= F.floor(F.lit(2) * packed / F.lit(PACK_CAPACITY)) + 1
            ),
            F.lit(True),
        ).alias("half_full_ok"),
    )


@register(
    "split_leakage_audit",
    f"""
    WITH {_MINHASH_CTES},
    strong AS (SELECT doc_a, doc_b FROM pairs
               WHERE est_jaccard >= {CLUSTER_MIN_EST}),
    sp AS (SELECT {{sa}} AS sa, {{sb}} AS sb FROM strong)
    SELECT least(sa, sb) AS split_lo, greatest(sa, sb) AS split_hi,
           count(*) AS n_pairs
    FROM sp GROUP BY 1, 2
    """.format(
        sa=_d_split_of("doc_a"), sb=_d_split_of("doc_b")
    ),
    doc="train/val/test LEAKAGE audit: strong near-dup pairs (the "
    f"dedup_clusters edge set, est_jaccard >= {CLUSTER_MIN_EST}) bucketed "
    "by the split pair they straddle.  A (train, val) or (train, test) "
    "row is contamination the split step must resolve (drop one side or "
    "co-assign the cluster).  The split of each endpoint is recomputed "
    "from the doc id's md5 — a pure expression on the pair, no join "
    "back to documents, so the audit costs one aggregation over the "
    "candidate edges",
)
def q_split_leakage_audit(spark, sf_dir):
    from realtime_data_pipeline_spark.functions import dedup

    pairs = dedup.minhash_candidates(
        _t(spark, sf_dir, "documents"),
        limit=None,
        min_est_jaccard=CLUSTER_MIN_EST,
    )
    sa, sb = _split_of(F.col("doc_a")), _split_of(F.col("doc_b"))
    return (
        pairs.select(
            F.least(sa, sb).alias("split_lo"),
            F.greatest(sa, sb).alias("split_hi"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(F.count("*").alias("n_pairs"))
    )


TEMP_TARGET_TOKENS = 50_000
_TEMP_SCALE = 1_000_000

# finer 6-hex-char bucket for rate thresholds computed from data (the
# tier sampler above only needs integer percents)
_D_TBUCKET = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 6))"
    f"::BIGINT % {_TEMP_SCALE})"
)


def _tbucket_col():
    # concat (NULL-propagating), not concat_ws — see _bucket_col
    h = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source"))
    )
    return (
        F.conv(F.substring(h, 1, 6), 16, 10).cast("bigint") % _TEMP_SCALE
    )


@register(
    "temperature_mixture_stats",
    f"""
    WITH t AS (SELECT source, len({D_TOKS}) AS nt, {_D_TBUCKET} AS bucket
               FROM documents),
    agg AS (SELECT source, count(*) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS n_tokens
            FROM t GROUP BY source),
    tot AS (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) AS z FROM agg),
    r AS (SELECT source, n_docs, n_tokens,
                 CAST(floor(least(1.0,
                     ({TEMP_TARGET_TOKENS} * (sqrt(CAST(n_tokens AS DOUBLE)) / z))
                     / CAST(n_tokens AS DOUBLE)) * {_TEMP_SCALE}) AS BIGINT)
                     AS cut
          FROM agg, tot)
    SELECT r.source, r.n_docs, r.n_tokens,
           CAST(r.cut AS DOUBLE) / {_TEMP_SCALE} AS keep_rate,
           CAST(sum(CASE WHEN t.bucket < r.cut THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN t.bucket < r.cut THEN t.nt ELSE 0 END) AS BIGINT)
               AS kept_tokens
    FROM t JOIN r ON t.source = r.source
    GROUP BY 1, 2, 3, r.cut
    """,
    doc="temperature-based mixture resampling (the multilingual-LM "
    "standard): per-source keep rates computed FROM the corpus itself — "
    "weight_s = sqrt(tokens_s) / sum(sqrt(tokens)), rate_s = min(1, "
    "target*weight_s/tokens_s) — so low-resource sources are upweighted "
    "relative to their share (alpha fixed at 0.5: sqrt is the one power "
    "IEEE rounds exactly, keeping the rate bit-identical across "
    "engines; the threshold compares INTEGER micro-buckets from the "
    "same md5 selector family as mixture_sample_stats).  Two rollup "
    "shuffles + a broadcast of the per-source rate table; the sampling "
    "predicate itself is a pure map usable on the write path at any "
    "scale",
)
def q_temperature_mixture_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        text.token_count().alias("nt"),
        _tbucket_col().alias("bucket"),
    )
    agg = t.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("n_tokens"),
    )
    z = agg.agg(F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("z"))
    tokens_d = F.col("n_tokens").cast("double")
    rate = F.least(
        F.lit(1.0),
        (F.lit(TEMP_TARGET_TOKENS) * (F.sqrt(tokens_d) / F.col("z")))
        / tokens_d,
    )
    r = agg.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.floor(rate * _TEMP_SCALE).cast("bigint").alias("cut"),
    )
    return (
        t.join(F.broadcast(r), "source")
        .groupBy("source", "n_docs", "n_tokens", "cut")
        .agg(
            F.sum((F.col("bucket") < F.col("cut")).cast("int"))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(
                F.when(F.col("bucket") < F.col("cut"), F.col("nt")).otherwise(0)
            )
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            (F.col("cut").cast("double") / _TEMP_SCALE).alias("keep_rate"),
            "n_kept",
            "kept_tokens",
        )
    )


EPOCH_SEED = "ep1"
EPOCH_SAMPLE = 100


@register(
    "epoch_shuffle_sample",
    f"""
    WITH k AS (SELECT doc_id,
                      md5('{EPOCH_SEED}:' || CAST(doc_id AS VARCHAR)) AS sk
               FROM documents)
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY sk, doc_id) AS BIGINT) AS position
    FROM k
    ORDER BY position
    LIMIT {EPOCH_SAMPLE}
    """,
    doc="deterministic epoch shuffle: every doc gets a reproducible "
    f"pseudo-random position — sort key md5('{EPOCH_SEED}:' || doc_id), "
    "so the permutation is stable across runs/engines and changes "
    "per epoch by reseeding.  Positions come from the "
    "range-partitioned two-pass global row number (operators/"
    "ranks.py) — per-partition row_number + an offsets cumsum, never "
    "a single-partition global sort, which is what makes shuffling a "
    "100 TB corpus feasible.  Reports the first "
    f"{EPOCH_SAMPLE} positions (the driver-sized sample; the full "
    "permutation is the same frame without the limit)",
)
def q_epoch_shuffle_sample(spark, sf_dir):
    from realtime_data_pipeline_spark.operators import ranks

    keyed = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.concat(F.lit(f"{EPOCH_SEED}:"), F.col("doc_id").cast("string"))
        ).alias("sk"),
    )
    ranked, _n = ranks.with_global_row_number(
        keyed, ["sk", "doc_id"], rn_col="position"
    )
    return (
        ranked.select("doc_id", F.col("position").cast("bigint").alias("position"))
        .orderBy("position")
        .limit(EPOCH_SAMPLE)
    )
