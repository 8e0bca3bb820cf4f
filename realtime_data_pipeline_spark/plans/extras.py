"""Coverage fill-ins: session windows, duplicate elimination, cube,
exact statistical aggregates, ISO-8601 rendering (P10), synthetic
source (S1/S2), and approximate distinct (scale posture).

Round-9 subset retirements (the r8/r9 never-checked-pool audit; same
discipline as the five TPC-H retirements argued in tpch_shapes.py —
a query is retired when every behavior its driver hash would pin is
already hash-checked or pytest-pinned elsewhere, so a driver slot
spent on it buys zero new signal):

* ``synthetic_events_sample`` — RETIRED.  Its oracle was a CONSTANT
  invariants row (count/ranges/domain/prefix booleans), so a driver
  hash match proved only that the booleans came out TRUE — exactly
  what ``tests/test_streaming.py::test_synthetic_source_shape``
  asserts against the same rand() generator, with better failure
  messages.  The generation PLUMBING the query routed through
  (range-partitioned spark.range → key formatting → 1-based type
  indexing → wire shape) is hash-checked VALUE-exactly by its
  deterministic twin ``synthetic_events_batch_sample`` (driver-green
  r8), which recomputes the md5 generator in SQL.  S1/S2 driver
  coverage: unchanged (pyds_synthetic_sample + the batch twin).

* ``json_wire_roundtrip`` — RETIRED.  Its oracle was counts-only
  (n_rows repeated three times + one json_valid count), so the hash
  pinned row counts, not fidelity.  The actual wire path — serialize
  to the reference's JSON lines, parse back with the declared schema,
  then window-count — is hash-checked value-exactly end-to-end by
  ``streaming_json_wire_counts`` (driver r4+r5, oracle equals batch
  A1), and MICROSECOND timestamp round-trip fidelity is pinned with
  an explicit sub-millisecond salt by ``tests/test_kafka_contract``
  (synthetic timestamps land on whole seconds, so only the salted
  pytest actually exercises the µs digits).  S3/P2 driver coverage:
  unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_data_pipeline_spark.plans.registry import _events, _t, register

SESSION_GAP = "30 minutes"


@register(
    "session_window_counts",
    """
    WITH x AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    y AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, new_sess DESC
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM x
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           count(*) AS n_events
    FROM y GROUP BY user_id, sess_id
    """,
    doc="session windows (W2 variant the reference lacks): F.session_window "
    "with a 30-minute gap; oracle sessionizes via lag+cumsum",
)
def q_session_window_counts(spark, sf_dir):
    ev = _events(spark, sf_dir).where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    return (
        ev.groupBy(
            F.session_window("ts", SESSION_GAP).alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


@register(
    "event_dedup_counts",
    """
    SELECT count(*) AS n_raw,
           (SELECT count(*) FROM (SELECT DISTINCT user_id, event_type, ts FROM events))
               AS n_deduped
    FROM events
    """,
    doc="exact duplicate elimination (dropDuplicates on a key subset) — "
    "hash-groupBy shuffle on the dedup key",
)
def q_event_dedup_counts(spark, sf_dir):
    ev = _events(spark, sf_dir)
    deduped = ev.dropDuplicates(["user_id", "event_type", "ts"])
    return ev.agg(F.count("*").alias("n_raw")).crossJoin(
        deduped.agg(F.count("*").alias("n_deduped"))
    )


# status_priority_cube RETIRED r7 (VERDICT r6 #2): cube() is sugar for
# grouping sets over the same Expand-based physical operator that
# status_priority_grouping_sets hash-checks (with GROUPING-id
# disambiguation on top); the cube's extra base-grain set is the plain
# groupBy shape every rollup query already covers.  No distinct
# operator -> no registry slot.


# value_stats_by_type subsumption audit (VERDICT r9 #6): NOT a subset
# of approx_quantiles_report's exact side (nor of value_percentiles).
# The percentile half overlaps, but the query's hash additionally pins
# the ORDER-INDEPENDENT sample variance template: second moment
# accumulated as DECIMAL(28,6) (exact integer arithmetic under
# reassociation, where a double stddev/var_samp aggregate jitters with
# partition order), combined into (Σx² − (Σx)²/n)/(n−1) only after
# both exact sums close.  No other registered query hash-checks a
# DECIMAL moment accumulator or the n−1 sample divisor — the moment
# queries in analytics.py (user_activity_zscores / _trend,
# lexical_diversity_correlation) all accumulate int64 moments over
# counts.  This is the template a 100 TB job must use for variance
# over money-typed columns, so the cross-engine hash earns its slot.
# KEPT, promoted in the round-10 rotation.
@register(
    "value_stats_by_type",
    """
    SELECT event_type,
           count(*) AS n,
           round(quantile_cont(value, 0.5), 4) AS p50_value,
           round(quantile_cont(value, 0.95), 4) AS p95_value,
           round((CAST(sum(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
                  - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                    * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))
                 / (count(*) - 1), 4) AS var_value
    FROM events
    GROUP BY event_type
    """,
    doc="exact percentiles (sort-based interpolation, identical in both "
    "engines) and a decimal-sum variance (order-independent — double "
    "stddev aggregates would jitter with partition order)",
)
def q_value_stats_by_type(spark, sf_dir):
    ev = _events(spark, sf_dir)
    sum_v = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    sum_v2 = F.sum(
        (F.col("value") * F.col("value")).cast("decimal(28,6)")
    ).cast("double")
    n = F.count("*")
    return ev.groupBy("event_type").agg(
        n.alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50_value"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95_value"),
        F.round((sum_v2 - sum_v * sum_v / n) / (n - 1), 4).alias("var_value"),
    )


# iso_timestamp_render RETIRED r10 (the VERDICT r9 #6 audit question,
# answered): the query was a map-side projection of two scalar renders
# over a pushed filter — no distinct physical operator — and every
# behavior its driver hash would pin is already pinned harder
# elsewhere.  The MICROSECOND ISO-8601 render (P10,
# producer/producer.py:22) is asserted BIT-EXACT round-trip with an
# explicit sub-millisecond salt by
# tests/test_kafka_contract.py::test_wire_roundtrip_producer_to_consumer
# (the salt matters: testdata timestamps land on whole seconds, so only
# the salted pytest exercises the µs digits this query's sf0.01 hash
# never did), and rides value-exactly through the
# streaming_json_wire_counts parity hash, where a render defect
# corrupts every round-tripped timestamp.  The 'user_'||id key format
# (P9) is driver-hash-green inside sliding_user_counts' key rendering.
# The only residue a slot would buy is the quoted 'Z' literal — a
# constant, not an operator.  Same standard as status_priority_cube:
# no distinct operator -> no registry slot.


@register(
    "synthetic_events_batch_sample",
    # The deterministic face of the same generator (VERDICT r6 #5:
    # the pyds_synthetic_sample trick applied to the spark.range batch
    # source): every field an md5-derived pure function of the row id,
    # so the oracle RECOMPUTES the generator in SQL and the hash
    # proves the range-partitioned generation path end to end —
    # codegen md5/conv arithmetic, wire-shape key formatting (parsed
    # back off the user_/item_ strings), 1-based type indexing, and
    # the id→timestamp arithmetic.
    """
    WITH g AS (SELECT i,
                      ('0x' || substr(md5(CAST(i AS VARCHAR) || ':u'), 1, 8))
                          ::BIGINT % 1000 + 1 AS u,
                      ('0x' || substr(md5(CAST(i AS VARCHAR) || ':i'), 1, 8))
                          ::BIGINT % 100 + 1 AS itm,
                      ('0x' || substr(md5(CAST(i AS VARCHAR) || ':t'), 1, 8))
                          ::BIGINT % 5 AS tix,
                      TIMESTAMP '2024-01-01 00:00:00'
                          + i * INTERVAL '1 second' AS ts
               FROM range(10000) r(i))
    SELECT ['click', 'view', 'purchase', 'like', 'add_to_cart'][tix + 1]
               AS interaction_type,
           count(*) AS n_events,
           count(DISTINCT u) AS n_users,
           CAST(min(u) AS BIGINT) AS min_user,
           CAST(max(u) AS BIGINT) AS max_user,
           CAST(min(itm) AS BIGINT) AS min_item,
           CAST(max(itm) AS BIGINT) AS max_item,
           min(ts) AS first_ts,
           max(ts) AS last_ts
    FROM g GROUP BY interaction_type
    """,
    doc="S1 batch variant, hash-checked (sources/synthetic.py "
    "deterministic=True): spark.range + md5-of-id expressions — same "
    "wire shape and domains as the rand() path that "
    "the retired rand() invariant query checked, but a pure function of "
    "the id, rolled up per interaction type with parsed key ordinals "
    "and the generated time range",
)
def q_synthetic_events_batch_sample(spark, sf_dir):
    from realtime_data_pipeline_spark.sources.synthetic import (
        synthetic_events_batch,
    )

    df = synthetic_events_batch(
        spark,
        10_000,
        user_range=1000,
        item_range=100,
        num_partitions=8,
        deterministic=True,
    )
    user_n = F.substring("user_id", 6, 12).cast("long")
    item_n = F.substring("item_id", 6, 12).cast("long")
    return df.groupBy("interaction_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct(user_n).alias("n_users"),
        F.min(user_n).alias("min_user"),
        F.max(user_n).alias("max_user"),
        F.min(item_n).alias("min_item"),
        F.max(item_n).alias("max_item"),
        F.min("timestamp").alias("first_ts"),
        F.max("timestamp").alias("last_ts"),
    )


@register(
    "approx_quantiles_report",
    # approx_percentile is the mergeable-sketch quantile path (GK /
    # KLL-style: fixed-size state, partial-merge across partitions —
    # what replaces exact percentile's per-group sort at 100 TB).  The
    # sketch guarantees a RANK bound, not a value bound (on a heavy
    # tail the p99 of 200 rows interpolates between the two largest
    # values while the sketch returns a sample — a 25% value gap at a
    # correct rank), so the envelope asserts rank-window containment:
    # each estimate must lie between the exact quantiles at q ± 0.01.
    # Containment is only asserted for groups of >= 100 rows: below
    # that the ±0.01 rank window is NARROWER than one order statistic,
    # so the interpolated bounds can both fall strictly between two
    # adjacent samples while the sketch (correctly) returns one of the
    # samples — unsatisfiable by construction, not an accuracy failure
    # (found by the unicode events axis: 7 injected multiscript event
    # types with ~17 rows each flipped the flag).
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50_exact,
           round(quantile_cont(value, 0.9), 4) AS p90_exact,
           round(quantile_cont(value, 0.99), 4) AS p99_exact,
           TRUE AS approx_in_rank_window
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type
    """,
    doc="mergeable approximate quantiles (approx_percentile, "
    "accuracy=10000) checked against exact percentiles inside the same "
    "aggregate via rank-window containment (estimate between the exact "
    "q±0.01 quantiles) — the per-group sketch state is fixed size and "
    "partial-merges map-side, unlike exact percentile whose state is "
    "the group's whole value list",
)
def q_approx_quantiles_report(spark, sf_dir):
    qs = (0.5, 0.9, 0.99)
    exact = {q: F.expr(f"percentile(value, {q})") for q in qs}
    approx = {q: F.expr(f"approx_percentile(value, {q}, 10000)") for q in qs}
    within = []
    for q in qs:
        lo = F.expr(f"percentile(value, {max(q - 0.01, 0.0)})")
        hi = F.expr(f"percentile(value, {min(q + 0.01, 1.0)})")
        a = approx[q].cast("double")
        within.append((a >= lo) & (a <= hi))
    ok = within[0]
    for w in within[1:]:
        ok = ok & w
    # vacuous below 100 rows — see the rank-window note above
    ok = ok | (F.count("*") < 100)
    return (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(exact[0.5], 4).alias("p50_exact"),
            F.round(exact[0.9], 4).alias("p90_exact"),
            F.round(exact[0.99], 4).alias("p99_exact"),
            ok.alias("approx_in_rank_window"),
        )
    )


@register(
    "value_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99,
           round(quantile_cont(value, 0.999), 4) AS p999
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type
    """,
    doc="exact interpolated percentiles per event type (Spark percentile ≙ "
    "DuckDB quantile_cont); the approximate scale path is "
    "approx_percentile with the same call shape",
)
def q_value_percentiles(spark, sf_dir):
    agg = [
        F.round(F.expr(f"percentile(value, {q})"), 4).alias(name)
        for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"), (0.999, "p999"))
    ]
    return (
        _events(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(*agg)
    )


@register(
    "status_priority_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="explicit GROUPING SETS (beyond the cube/rollup fill-ins) with "
    "grouping_id disambiguation — one shuffle, Expand-based plan",
)
def q_status_priority_grouping_sets(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "n_orders", "sum_price"
        )
    )


@register(
    "small_order_parts_revenue",
    """
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 4) AS avg_yearly,
           count(*) AS n_lineitems
    FROM lineitem l
    WHERE l_quantity < (
        SELECT 0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / count(*))
        FROM lineitem i WHERE i.l_partkey = l.l_partkey
    )
    """,
    doc="correlated-subquery pattern (TPC-H Q17 shape): revenue from "
    "below-one-fifth-of-average-quantity lineitems.  Spark side is "
    "DECORRELATED into a per-part window average — one shuffle on "
    "l_partkey, no self-join, no per-row subquery execution",
)
def q_small_order_parts_revenue(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    # decimal-sum/count, not avg(double): a double window sum follows
    # arbitrary partition layout order, and a 1-ulp threshold shift
    # could flip the row SET selected by the comparison below.
    part_avg = (
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    return (
        li.withColumn("part_avg_qty", part_avg)
        .where(F.col("l_quantity") < 0.2 * F.col("part_avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / 7.0,
                4,
            ).alias("avg_yearly"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "latest_event_per_user",
    """
    SELECT user_id,
           arg_max(event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                             || '#' || lpad(CAST(event_id AS VARCHAR), 12, '0'))
               AS last_event_id,
           arg_max(event_type, strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                               || '#' || lpad(CAST(event_id AS VARCHAR), 12, '0'))
               AS last_event_type,
           max(ts) AS last_ts,
           count(*) AS n_events
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
    GROUP BY user_id
    """,
    doc="A6-family argmax as a single-pass aggregate: max_by/arg_max over a "
    "fixed-width (ts, event_id) string key — deterministic tie-break, no "
    "window function, ONE shuffle (the rank-based alternative needs a "
    "per-key sort)",
)
def q_latest_event_per_user(spark, sf_dir):
    order_key = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lit("#"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        _events(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max_by("event_id", order_key).alias("last_event_id"),
            F.max_by("event_type", order_key).alias("last_event_type"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_events"),
        )
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "segment_event_pivot",
    f"""
    SELECT c_mktsegment,
           {', '.join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
                      for t in EVENT_TYPES)}
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="pivot: event counts per segment spread into one column per event "
    "type (explicit value list so the plan needs no extra distinct pass)",
)
def q_segment_event_pivot(spark, sf_dir):
    ev = _events(spark, sf_dir)
    cu = _t(spark, sf_dir, "customer")
    return (
        ev.join(cu, ev.user_id == cu.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
    )


# top_terms RETIRED r7 (VERDICT r6 #2): its explode -> distinct-token
# doc-frequency -> top-k shape is strictly contained in
# tfidf_top_terms (whose IDF is built FROM the per-term document
# frequency) and in frequent_terms_report (the scale path for the
# same vocabulary question); term_postings_stats pins the
# inverted-index rollup besides.  No distinct operator -> no slot.


@register(
    "priority_metrics_unpivot",
    """
    WITH m AS (
        SELECT o_orderpriority,
               CAST(count(*) AS DOUBLE) AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                   AS total_price,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / count(*), 4) AS avg_price
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM m
    UNION ALL
    SELECT o_orderpriority, 'total_price', total_price FROM m
    UNION ALL
    SELECT o_orderpriority, 'avg_price', avg_price FROM m
    """,
    doc="unpivot/melt: wide per-priority metrics to long (metric, value) "
    "rows via DataFrame.unpivot — the serving-layer reshape",
)
def q_priority_metrics_unpivot(spark, sf_dir):
    sum_price = F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
    wide = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("double").alias("n_orders"),
            F.round(sum_price.cast("double"), 2).alias("total_price"),
            F.round(sum_price.cast("double") / F.count("*"), 4).alias(
                "avg_price"
            ),
        )
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["n_orders", "total_price", "avg_price"],
        "metric",
        "value",
    )


@register(
    "hll_partitioned_distinct",
    # Sketch bytes are engine-specific, so the oracle pins the exact
    # cardinality and the properties that make sketches THE 100 TB
    # distinct-count path: per-group estimates and the union-of-sketches
    # global estimate all land within the configured error envelope.
    """
    SELECT count(DISTINCT user_id) AS exact_users,
           TRUE AS groups_within_5pct,
           TRUE AS union_within_5pct,
           TRUE AS hllpp_within_5pct
    FROM events
    """,
    doc="mergeable-sketch distinct counting (Apache DataSketches HLL): "
    "per-event-type hll_sketch_agg, then hll_union_agg merges the "
    "fixed-size group sketches into the GLOBAL estimate without "
    "re-scanning raw data — the re-aggregatable rollup pattern "
    "(daily→monthly→all-time) that count(DISTINCT) cannot do at scale; "
    "also envelope-checks the BUILT-IN approx_count_distinct (HLL++, "
    "rsd=0.01) in the same global pass (absorbed the retired "
    "approx_distinct_users entry, r7)",
)
def q_hll_partitioned_distinct(spark, sf_dir):
    ev = _events(spark, sf_dir).where(F.col("user_id").isNotNull())
    per_group = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk"),
        F.countDistinct("user_id").alias("exact_g"),
    )
    # ONE reduction over the (|event_types|)-row sketch relation: the
    # per-group error check and the union estimate come out of the same
    # pass, so the heavy sketch aggregation subtree is planned (and at
    # scale, executed) once instead of once per consumer.
    rollup = per_group.select(
        "sk",
        (
            F.abs(
                F.expr("hll_sketch_estimate(sk)").cast("double")
                - F.col("exact_g")
            )
            / F.col("exact_g")
            <= 0.05
        ).alias("ok"),
    ).agg(
        F.every("ok").alias("groups_within_5pct"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
    )
    exact = ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("hllpp_est"),
    )
    return (
        exact.crossJoin(rollup)
        .select(
            "exact_users",
            "groups_within_5pct",
            # ANSI guard (registry-wide contract): on an EMPTY events
            # table exact_users is 0 and x/0 throws under ANSI mode
            # even though the error ratio is meaningless there — emit
            # NULL instead (caught by the empty-input suite)
            F.when(
                F.col("exact_users") > 0,
                F.abs(F.col("est").cast("double") - F.col("exact_users"))
                / F.col("exact_users")
                <= 0.05,
            ).alias("union_within_5pct"),
            F.when(
                F.col("exact_users") > 0,
                F.abs(
                    F.col("hllpp_est").cast("double") - F.col("exact_users")
                )
                / F.col("exact_users")
                <= 0.05,
            ).alias("hllpp_within_5pct"),
        )
    )


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def profile_frame(df, cols=_PROFILE_COLS, exact: bool = True):
    """Per-column null count, distinct count, min/max in ONE
    aggregation pass (all columns' stats as parallel aggregates, then
    a stack unpivot of the single stats row).

    `exact=False` swaps every countDistinct for approx_count_distinct
    (HLL++, ~2% default error): same output schema, but the per-column
    aggregation state is a FIXED-SIZE sketch instead of an Expand-based
    exact-distinct (which multiplies pre-shuffle rows by the column
    count) — the mode a 100 TB profile actually runs in."""
    distinct_fn = F.countDistinct if exact else F.approx_count_distinct
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            # coalesce: sum over ZERO rows is null, but "no rows" means
            # zero nulls — the profile must stay numeric on empty input
            F.coalesce(
                F.sum(col.isNull().cast("long")), F.lit(0)
            ).alias(f"{c}__nulls"),
            distinct_fn(col).alias(f"{c}__distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_val, max_val)"
        )
    )


@register(
    "documents_profile",
    "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_val,
           CAST(max({c}) AS VARCHAR) AS max_val
    FROM documents"""
        for c in _PROFILE_COLS
    ),
    doc="data-quality profile of the documents table: per-column null "
    "count, exact distinct count, min/max — the standard ingest "
    "validation step, computed in ONE aggregation pass over the scan "
    "(all columns' stats as parallel aggregates, then an unpivot of "
    "the single stats row; the only per-column cost is the distinct "
    "sketch state).  The oracle checks exact mode; profile_frame("
    "exact=False) is the callable 100 TB posture — "
    "approx_count_distinct, same schema, fixed-size state",
)
def q_documents_profile(spark, sf_dir):
    return profile_frame(_t(spark, sf_dir, "documents"), exact=True)


def _d_pii(kind: str) -> str:
    from realtime_data_pipeline_spark.functions.text import PII_PATTERNS

    # single-quote-escape for SQL embedding; patterns contain none today
    return PII_PATTERNS[kind].replace("'", "''")


@register(
    "pii_scrub_stats",
    f"""
    WITH p AS (
        SELECT source, text,
               len(regexp_extract_all(text, '{{email}}')) AS email_n,
               len(regexp_extract_all(text, '{{phone}}')) AS phone_n,
               len(regexp_extract_all(text, '{{ipv4}}')) AS ipv4_n,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '{{email}}', '[EMAIL]', 'g'),
                       '{{ipv4}}', '[IPV4]', 'g'),
                   '{{phone}}', '[PHONE]', 'g') AS scrubbed
        FROM documents)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN email_n > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_email,
           CAST(sum(email_n) AS BIGINT) AS email_hits,
           CAST(sum(CASE WHEN phone_n > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_phone,
           CAST(sum(phone_n) AS BIGINT) AS phone_hits,
           CAST(sum(CASE WHEN ipv4_n > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_with_ipv4,
           CAST(sum(ipv4_n) AS BIGINT) AS ipv4_hits,
           CAST(sum(CASE WHEN scrubbed != text THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_scrubbed
    FROM p GROUP BY source
    """.replace("{email}", _d_pii("email"))
    .replace("{phone}", _d_pii("phone"))
    .replace("{ipv4}", _d_pii("ipv4")),
    doc="PII audit + redaction dry-run over the corpus: per source, how "
    "many docs carry emails / phone-like digit runs / IPv4 literals, "
    "total occurrences, and how many docs the scrub pass would change. "
    "One scan + one rollup, all JVM regex built-ins (regexp_count / "
    "regexp_replace) — the pattern strings are the conservative "
    "Java-regex/RE2 common subset so the SAME patterns drive both "
    "engines (functions/text.py PII_PATTERNS; planted-fixture proof in "
    "tests/test_scale_levers.py).  The scrub itself is "
    "text.scrub_pii() — a pure map, zero shuffle, usable as a "
    "write-path projection at any scale",
)
def q_pii_scrub_stats(spark, sf_dir):
    from realtime_data_pipeline_spark.functions import text as T

    docs = _t(spark, sf_dir, "documents")
    flagged = docs.select(
        "source",
        "text",
        T.pii_count("email").alias("email_n"),
        T.pii_count("phone").alias("phone_n"),
        T.pii_count("ipv4").alias("ipv4_n"),
        T.scrub_pii().alias("scrubbed"),
    )
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("email_n") > 0).cast("int")).cast("bigint")
        .alias("docs_with_email"),
        F.sum("email_n").cast("bigint").alias("email_hits"),
        F.sum((F.col("phone_n") > 0).cast("int")).cast("bigint")
        .alias("docs_with_phone"),
        F.sum("phone_n").cast("bigint").alias("phone_hits"),
        F.sum((F.col("ipv4_n") > 0).cast("int")).cast("bigint")
        .alias("docs_with_ipv4"),
        F.sum("ipv4_n").cast("bigint").alias("ipv4_hits"),
        F.sum((F.col("scrubbed") != F.col("text")).cast("int"))
        .cast("bigint")
        .alias("docs_scrubbed"),
    )
