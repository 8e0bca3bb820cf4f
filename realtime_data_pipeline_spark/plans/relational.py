"""General relational analytics over the TPC-H-ish star schema.

The reference implements zero joins / set ops / analytic window
functions (SURVEY §2.4) — its dashboard is two disjoint aggregate
streams.  The north star demands a general analytics surface, so these
fill that gap idiomatically: declarative DataFrame plans that Catalyst
optimizes (filter pushdown to the parquet scan, broadcast of small
dimensions, partial aggregation before the shuffle).

Scale posture: dimension tables (region/nation/supplier/customer at
these ratios) are broadcast — no shuffle of the fact table for
enrichment joins; fact-fact joins shuffle on their keys and rely on
AQE for skew; top-k compiles to TakeOrderedAndProject.

Cross-engine exactness: money aggregates go through DECIMAL (order-
independent), averages divide a decimal sum cast to double (single
deterministic division), ratios round to 4 digits.

Output-type convention (round-2 driver fix): NO DecimalType ever leaves
a query.  Decimals are internal only — they make the sum exact and
order-independent — and every money output is rounded to ≤2 digits
while still decimal, then cast to DOUBLE.  Rationale, verified
empirically: (a) DuckDB's pandas conversion renders DECIMAL columns as
float64 while Spark's toPandas yields decimal.Decimal objects, so a
decimal output can never value-hash-match across engines; (b) a
DECIMAL(38,10) money sum has more significant digits than float64
holds, so the two engines' decimal→double conversions differ by 1 ulp.
Rounding to scale 2 first makes the scaled integer < 2^53 — the cast is
then exact on every conversion path.  On the SQL side use
round(decimal, 2) (half-away-from-zero, same as Spark's HALF_UP for
our positive money values) — NOT a decimal→decimal CAST, which DuckDB
truncates.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.plans.registry import _events, _t, register

_DEC = "decimal(18,2)"


def _revenue_col():
    # double multiply per row is deterministic IEEE; the decimal cast
    # makes the subsequent sum order-independent.
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,10)"
    )


def money(sum_col: Column) -> Column:
    """Exact decimal aggregate → exact double output (see module doc).

    SQL-side twin in the oracles: ``CAST(round(<sum>, 2) AS DOUBLE)``
    (DuckDB's round on decimal is half-away-from-zero, matching Spark's
    HALF_UP for positive money; DuckDB's decimal→decimal CAST truncates
    and must not be used).
    """
    return F.round(sum_col, 2).cast("double")


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: scan→filter→hash agg with decimal sums",
    bench=True,
)
def q_pricing_summary(spark, sf_dir):
    # widen: 8 aggregates/row make the map side CPU-bound — see
    # tables._widen_scan (no-op when the scan already parallelizes).
    li = _t(spark, sf_dir, "lineitem", widen=True).where(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz")
    )
    cnt = F.count("*")
    # r15 (guide §2.3 narrower types / §1.2 per-task work): the three
    # PLAIN decimal sums run as codegen'd int64 sums of exact cents /
    # basis points.  Sound because the money discipline bounds the
    # domain: quantities, prices and discounts are exact 2/4-decimal
    # values (verified max |x·scale − round(x·scale)| ≤ 1e-9 over the
    # corpus), so round(x·scale) is the same unscaled integer the
    # DECIMAL(18,2)/(18,4) cast produced, sums are the same exact
    # integers, and one IEEE division by the scale yields the same
    # nearest-double the decimal→double cast did.  Byte-exact vs the
    # unchanged DuckDB oracle at sf0.01/sf0.1 (which still sums real
    # decimals).  The two (28,10) PRODUCT sums stay decimal: their
    # per-row cast rounds the exact decimal expansion of a double
    # product at digit 10 — not reproducible in int64 (an int64
    # sibling was measured and rejected; only this split is exact).
    qty_c = F.sum(F.round(F.col("l_quantity") * 100, 0).cast("long"))
    price_c = F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
    disc_bp = F.sum(F.round(F.col("l_discount") * 10000, 0).cast("long"))
    sum_qty = qty_c / F.lit(100.0)
    sum_price = price_c / F.lit(100.0)
    sum_disc = disc_bp / F.lit(10000.0)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty.alias("sum_qty"),
        sum_price.alias("sum_base_price"),
        money(F.sum(_revenue_col())).alias("sum_disc_price"),
        money(
            F.sum(
                (
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ).cast("decimal(28,10)")
            )
        ).alias("sum_charge"),
        F.round(sum_qty / cnt, 4).alias("avg_qty"),
        F.round(sum_price / cnt, 4).alias("avg_price"),
        F.round(sum_disc / cnt, 4).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@register(
    "revenue_by_nation",
    """
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-style multiway join: fact tables shuffle on keys, true "
    "dimensions broadcast; customer carries NO broadcast hint — it is a "
    "fact-sized table at real scale, so Catalyst's size stats / AQE "
    "decide (they still broadcast it at test scale, asserted in "
    "tests/test_scale_levers.py)",
    bench=True,
)
def q_revenue_by_nation(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # r15: the supplier→nation→region dim chain is pre-joined on the
    # broadcast BUILD side (guide §3.1/§1.2): every fact row probes ONE
    # hash relation instead of streaming through three BroadcastHashJoin
    # operators, and the region filter prunes the broadcast relation to
    # ASIA suppliers before it ships.  Inner equi-joins on unique dim
    # keys — row multiplicity and values unchanged (oracle-verified).
    sdim = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(sdim),
            (li.l_suppkey == sdim.s_suppkey)
            & (cu.c_nationkey == sdim.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            money(F.sum(_revenue_col())).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "top_unshipped_orders",
    """
    SELECT o_orderkey,
           CAST(round(revenue0, 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM (
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS revenue0
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
    )
    ORDER BY revenue0 DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3-style: selective dim filter broadcast into fact join, "
    "top-k via TakeOrderedAndProject",
)
def q_top_unshipped_orders(spark, sf_dir):
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    cu = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue_col()).alias("revenue0"))
        # top-k on the EXACT decimal (tie-break on the unique key), then
        # project the rounded double — rounding must not affect selection.
        .orderBy(F.desc("revenue0"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            money(F.col("revenue0")).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@register(
    "customers_with_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="left-semi join (EXISTS): customers having at least one order",
)
def q_customers_with_orders(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return cu.join(o, cu.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name, c_nationkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="left-anti join (NOT EXISTS): customers with no orders",
)
def q_customers_without_orders(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return cu.join(o, cu.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


@register(
    "order_priority_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    doc="hierarchical rollup (grouping sets): status → priority → grand total",
)
def q_order_priority_rollup(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "nation_top_customers",
    """
    SELECT * FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               rank() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_rank
        FROM customer
    ) WHERE bal_rank <= 5
    """,
    doc="analytic window function: per-nation rank by account balance, top 5",
)
def q_nation_top_customers(spark, sf_dir):
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).alias("bal_rank"),
        )
        .where(F.col("bal_rank") <= 5)
    )


@register(
    "customer_running_spend",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
                AS DOUBLE) AS running_spend,
           lag(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_order_price,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    WHERE o_custkey < 30
    """,
    doc="analytic frames: running decimal sum, lag, row_number per customer",
)
def q_customer_running_spend(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < 30)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(F.col("o_totalprice").cast(_DEC))
            .over(w)
            .cast("double")
            .alias("running_spend"),
            F.lag("o_totalprice").over(w).alias("prev_order_price"),
            F.row_number().over(w).alias("order_seq"),
        )
    )


@register(
    "part_type_revenue_share",
    """
    WITH rev AS (
        SELECT p_type,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS revenue0
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type
    )
    SELECT p_type,
           CAST(round(revenue0, 2) AS DOUBLE) AS revenue,
           round(CAST(round(revenue0, 2) AS DOUBLE)
                 / CAST(round(sum(revenue0) OVER (), 2) AS DOUBLE), 4) AS revenue_share
    FROM rev
    """,
    doc="agg + unbounded analytic window: per-type revenue and global share",
)
def q_part_type_revenue_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(F.sum(_revenue_col()).alias("revenue0"))
    )
    # numerator and denominator both go decimal→round(2)→double before
    # the one division, so the ratio's inputs are bit-identical in both
    # engines (an exact (38,10) decimal does NOT convert to double
    # identically across engines — that was round 1's hash failure).
    w = Window.partitionBy()
    return rev.select(
        "p_type",
        money(F.col("revenue0")).alias("revenue"),
        F.round(
            money(F.col("revenue0"))
            / money(F.sum("revenue0").over(w)),
            4,
        ).alias("revenue_share"),
    )


@register(
    "click_not_error_users",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    doc="set op EXCEPT (distinct): users who clicked but never errored",
)
def q_click_not_error_users(spark, sf_dir):
    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    errors = ev.where(F.col("event_type") == "error").select("user_id")
    return clicks.subtract(errors)


@register(
    "click_and_purchase_users",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    doc="set op INTERSECT (distinct): users who both clicked and purchased",
)
def q_click_and_purchase_users(spark, sf_dir):
    ev = _events(spark, sf_dir)
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@register(
    "event_user_segment_counts",
    """
    SELECT c_mktsegment,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="stream-enrichment pattern: fact→broadcast-dim join, rollup by segment",
)
def q_event_user_segment_counts(spark, sf_dir):
    ev = _events(spark, sf_dir)
    cu = _t(spark, sf_dir, "customer")
    return (
        ev.join(cu, ev.user_id == cu.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.sum(F.col("value").cast(_DEC)).cast("double") / F.count("*"), 4
            ).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# As-of and range joins (north-star temporal operators; reference has
# neither — SURVEY §2.4 "Joins: none")
# ---------------------------------------------------------------------------


@register(
    "purchase_click_attribution",
    """
    WITH u AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN event_type = 'click' THEN ts END AS c_ts,
             CASE WHEN event_type = 'click' THEN event_id END AS c_id
      FROM events
      WHERE event_type IN ('click', 'purchase')
        AND user_id IS NOT NULL AND ts IS NOT NULL
    ), w AS (
      SELECT event_id, user_id, ts, event_type,
             last_value(c_id IGNORE NULLS) OVER win AS click_id,
             last_value(c_ts IGNORE NULLS) OVER win AS click_ts
      FROM u
      WINDOW win AS (PARTITION BY user_id
                     ORDER BY ts, (event_type = 'purchase'), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           COALESCE(click_id, -1) AS click_id,
           COALESCE(click_ts, TIMESTAMP '1970-01-01 00:00:00') AS click_ts
    FROM w WHERE event_type = 'purchase'
    """,
    doc="as-of (backward) join: each purchase attributed to the user's "
    "latest click at-or-before it — union+last(ignorenulls) scan shape, "
    "one shuffle, no per-key range-join blowup (operators/asof.py)",
    tags=("asof",),
)
def q_purchase_click_attribution(spark, sf_dir):
    from realtime_data_pipeline_spark.operators import asof

    ev = _events(spark, sf_dir).where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof.asof_join(
        purchases, clicks,
        keys=["user_id"], left_ts="ts", right_ts="ts",
        payload_cols=["event_id"],
    )
    # COALESCE null as-of misses to sentinels: null timestamps render
    # as NaT through pandas/arrow, which value-hash normalizations may
    # treat differently than SQL NULL.
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.coalesce("asof.event_id", F.lit(-1)).alias("click_id"),
        F.coalesce(
            "asof.ts", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        ).alias("click_ts"),
    )


# Price-band dimension shared by the Spark query and the SQL oracle —
# generated from ONE Python constant so the two sides cannot drift.
PRICE_BANDS = (
    ("budget", 0, 50_000),
    ("mid", 50_000, 150_000),
    ("premium", 150_000, 300_000),
    ("luxury", 300_000, 1_000_000),
)
_BAND_VALUES = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)


@register(
    "order_price_bands",
    f"""
    SELECT band,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 4) AS avg_price
    FROM orders
    JOIN (VALUES {_BAND_VALUES}) b(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
    doc="range join: orders binned into price bands via a BROADCAST "
    "inequality join (tiny bound table to every executor — the only "
    "sane physical plan for a range join at 100 TB)",
    tags=("range-join",),
)
def q_order_price_bands(spark, sf_dir):
    spark_bands = _t(spark, sf_dir, "orders").sparkSession.createDataFrame(
        list(PRICE_BANDS), "band string, lo int, hi int"
    )
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(
            F.broadcast(spark_bands),
            (orders.o_totalprice >= spark_bands.lo)
            & (orders.o_totalprice < spark_bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC))
            .cast("double")
            .alias("sum_price"),
            F.round(
                F.sum(F.col("o_totalprice").cast(_DEC)).cast("double")
                / F.count("*"),
                4,
            ).alias("avg_price"),
        )
    )


@register(
    "salted_segment_counts",
    """
    SELECT c_mktsegment, event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment, event_type
    """,
    doc="skew-salted fact-dim join (operators/skew.py): left rows salted, "
    "right replicated 16x, join on (key, salt) — result provably equals "
    "the plain join (this oracle), hot keys spread over 16 partitions",
    tags=("skew",),
)
def q_salted_segment_counts(spark, sf_dir):
    from realtime_data_pipeline_spark.operators.skew import salted_join

    ev = _events(spark, sf_dir).withColumnRenamed("user_id", "c_custkey")
    cu = _t(spark, sf_dir, "customer")
    return (
        salted_join(ev, cu.select("c_custkey", "c_mktsegment"), ["c_custkey"])
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("c_custkey").alias("n_users"),
        )
    )


@register(
    "customer_spend_distribution",
    """
    WITH spend AS (
        SELECT c_custkey, c_mktsegment,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey, c_mktsegment
    )
    SELECT c_custkey, c_mktsegment, round(total_spend, 2) AS total_spend,
           ntile(4) OVER w AS spend_quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume_dist
    FROM spend
    WINDOW w AS (ORDER BY total_spend, c_custkey)
    """,
    doc="distribution functions (ntile / percent_rank / cume_dist) over "
    "per-customer spend — NO global-order Window (a no-partitionBy "
    "window is a one-task sort at scale); instead the two-pass "
    "range-partitioned global row number (operators/ranks.py) plus "
    "arithmetic: under the total order (total_spend, c_custkey) the "
    "three distribution functions are pure (rank, N) formulas",
)
def q_customer_spend_distribution(spark, sf_dir):
    from realtime_data_pipeline_spark.operators import ranks

    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    spend = (
        cu.join(od, od.o_custkey == cu.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.sum(F.col("o_totalprice").cast(_DEC))
            .cast("double")
            .alias("total_spend")
        )
    )
    ranked, n = ranks.with_global_row_number(
        spend, ["total_spend", "c_custkey"], rn_col="rn"
    )
    rn = F.col("rn")
    return ranked.select(
        "c_custkey",
        "c_mktsegment",
        F.round("total_spend", 2).alias("total_spend"),
        ranks.ntile_expr(rn, n, 4).alias("spend_quartile"),
        F.round(ranks.percent_rank_expr(rn, n), 6).alias("pct_rank"),
        F.round(ranks.cume_dist_expr(rn, n), 6).alias("cume_dist"),
    )
