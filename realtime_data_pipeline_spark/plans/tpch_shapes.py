"""Classic decision-support query shapes (TPC-H Q7/Q10/Q12/Q13/Q14/
Q16/Q18/Q19/Q22 analogues) adapted to the testdata's slim star schema.

The reference implements zero joins (SURVEY §2.4 "Joins: none"); these
extend the relational surface with the join/agg patterns any general
analytics engine must plan well.  Each one exists to prove a distinct
physical shape:

  * returned_revenue_top_customers — selective fact filter + 3-way join
                                  + top-k on the EXACT decimal with a
                                  rounded projection (Q10)
  * customer_order_count_histogram — OUTER join with join-side predicate,
                                  two-level aggregation (agg of an agg)
  * large_quantity_orders       — agg→HAVING→join back to the fact (Q18)
  * brand_quantity_revenue      — disjunctive multi-column predicates
                                  spanning both join sides (Q19)
  * idle_rich_customers         — scalar-subquery threshold + anti join (Q22)
  * sole_late_suppliers         — correlated EXISTS/NOT-EXISTS pair
                                  decorrelated into one per-order agg (Q21)

Retired round 8 (VERDICT r7 #2 subsumption audit — each shape's every
physical element stays driver-hash-checked by a named sibling):

  * bilateral_trade_volume (Q7)  ⊂ region_market_share (Q8, hash-green
    r3–r7, still in the window): the SAME dual-role nation join (nation
    aliased twice, customer side vs supplier side) over the same
    lineitem⋈orders⋈customer⋈supplier fact join, same decimal money sum
    grouped per year.  Q7's only extra was an OR filter over the two
    role dims — disjunctive-predicate planning is the Q19 claim
    (brand_quantity_revenue, queued for its own hash check).
  * promo_revenue_share (Q14)   ⊂ region_market_share: the identical
    conditional-decimal-sum / total-sum ratio from one aggregate pass
    (Q8 computes it GROUPED per year — strictly more general), and the
    1-row global-aggregate output shape is hash-checked by
    forecast_revenue_change (r3–r7 green).
  * priority_shipping_stats (Q12) — both elements driver-checked
    elsewhere: the lineitem⋈orders fact shuffle via nation_year_profit
    (r3–r7, in window) and CASE-split conditional counts via
    quality_funnel_stats / k_anonymity_audit / embedding_health_report
    (all hash-green r7).
  * top_revenue_suppliers (Q15) — argmax-over-aggregate as a broadcast
    1-row-aggregate crossJoin + compare-filter join-back: physically
    identical to idle_rich_customers' threshold shape (r2–r7 green,
    equality vs inequality compare is the only difference), with
    per-key argmax semantics hash-checked by latest_event_per_user
    (max_by, r5+r6 green).
  * supplier_part_diversity (Q16) — distinct-agg over a broadcast-dim
    join: countDistinct-over-join is hash-checked by sole_late_suppliers
    (queued r9: n_suppliers / conditional n_late_suppliers per order,
    over the same lineitem join input) and plain countDistinct by
    user_feature_vectors (n_active_days, r7 green); IN-list +
    inequality dim pruning is scan-level pushdown pinned by the
    PushedFilters plan tests.

Scale posture: dimensions broadcast; fact-fact joins shuffle on the
join key once and aggregate partially map-side; top-k compiles to
TakeOrderedAndProject; the disjunctive Q19 predicate stays inside the
scan filter (pushed below the join by Catalyst).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_data_pipeline_spark.plans.registry import _t, register
from realtime_data_pipeline_spark.plans.relational import _revenue_col, money

_DEC = "decimal(18,2)"


@register(
    "returned_revenue_top_customers",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(round(revenue0, 2) AS DOUBLE) AS revenue
    FROM (
        SELECT c_custkey, c_name, n_name,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS revenue0
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
    )
    ORDER BY revenue0 DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer over one "
    "quarter, top-20 via TakeOrderedAndProject",
)
def q_returned_revenue_top_customers(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue_col()).alias("revenue0"))
        # select top-k on the exact decimal, then project the rounded
        # double (see relational.money) — rounding must not pick rows.
        .orderBy(F.desc("revenue0"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", "n_name", money(F.col("revenue0")).alias("revenue")
        )
    )


@register(
    "customer_order_count_histogram",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: outer join with a join-side (not WHERE) "
    "predicate, then an aggregation of an aggregation — zero-order "
    "customers must survive into the histogram",
)
def q_customer_order_count_histogram(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        cu.join(
            o,
            (cu.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "large_quantity_orders",
    """
    WITH big AS (
        SELECT l_orderkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q18 shape: aggregate the fact, HAVING-filter the groups, "
    "join the surviving keys back to orders/customer — the agg-side "
    "filter shrinks the join input before any wide join happens",
)
def q_large_quantity_orders(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC))
            .cast("double")
            .alias("total_qty")
        )
        .where(F.col("total_qty") > 200)
    )
    o = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "brand_quantity_revenue",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 36 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-column predicates spanning "
    "both join sides — Catalyst splits the OR into per-side pushable "
    "conjuncts (brand/size prune the part scan) before the join",
)
def q_brand_quantity_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(10, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#25")
        & F.col("p_size").between(20, 36)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            money(F.sum(_revenue_col())).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "idle_rich_customers",
    """
    WITH avg_bal AS (
        SELECT round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     / count(*), 2) AS threshold
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey,
           count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer, avg_bal
    WHERE c_acctbal > threshold
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape: scalar-subquery threshold (broadcast 1-row "
    "cross join) + anti join against recent orders (every testdata "
    "customer has SOME order, so the recency filter keeps the anti join "
    "non-trivial), per-nation rollup; the threshold is a decimal-sum/"
    "count average rounded to cents — an avg(double) would be partition-"
    "order dependent and could flip the selected row SET, not just a "
    "cell (ADVICE r1)",
)
def q_idle_rich_customers(spark, sf_dir):
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    )
    threshold = (
        cu.where(F.col("c_acctbal") > 0)
        .agg(
            F.round(
                F.sum(F.col("c_acctbal").cast(_DEC)).cast("double")
                / F.count("*"),
                2,
            ).alias("threshold")
        )
    )
    return (
        cu.crossJoin(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("threshold"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(_DEC))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


@register(
    "sole_late_suppliers",
    """
    SELECT s_suppkey, s_name, count(*) AS n_late_lines
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders     ON o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey != l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3
                      ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey != l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_suppkey, s_name
    """,
    doc="TPC-H Q21 shape (suppliers who ALONE shipped late on a multi-"
    "supplier order): the correlated EXISTS / NOT-EXISTS pair is "
    "DECORRELATED into one per-order aggregate — n_suppliers and "
    "n_late_suppliers per order from a single groupBy — then a filter "
    "(n_suppliers > 1 AND n_late_suppliers = 1) joined back to the "
    "late lines.  One shuffle on l_orderkey instead of two correlated "
    "per-row subquery probes of the fact table",
)
def q_sole_late_suppliers(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        ).alias("late"),
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_suppliers"
        ),
    )
    sole = per_order.where(
        (F.col("n_suppliers") > 1) & (F.col("n_late_suppliers") == 1)
    )
    return (
        lo.where("late")
        .join(sole, "l_orderkey")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_late_lines"))
    )


@register(
    "nation_year_profit",
    """
    SELECT n_name AS supp_nation,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(28,10))), 2) AS DOUBLE) AS profit,
           count(*) AS n_lines
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (product-line profit by supplier nation and "
    "year): a 5-way star join where the part filter (LIKE on a dim "
    "column) prunes the fact rows.  part/supplier/nation broadcast; "
    "the LIKE-filtered part dim shrinks the probe before the orders "
    "join, so the only fact-fact shuffle (lineitem⋈orders on "
    "l_orderkey) moves pre-filtered rows",
    bench=True,
)
def q_nation_year_profit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    # r15: supplier⋈nation pre-joined on the broadcast build side
    # (§3.1/§1.2) — one probe relation carrying the nation name instead
    # of two chained BroadcastHashJoins per fact row.  Unique-key inner
    # joins: multiplicity and values unchanged (oracle-verified).
    sdim = s.join(n, s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "n_name"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sdim), li.l_suppkey == sdim.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            money(F.sum(_revenue_col())).alias("profit"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "region_market_share",
    """
    SELECT o_year,
           CAST(round(CAST(focal_vol AS DOUBLE) / total_vol, 4) AS DOUBLE)
               AS mkt_share,
           CAST(round(total_vol, 2) AS DOUBLE) AS total_volume
    FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               sum(CASE WHEN sn.n_name = 'NATION_7'
                        THEN CAST(l_extendedprice * (1 - l_discount)
                                  AS DECIMAL(28,10))
                        ELSE CAST(0 AS DECIMAL(28,10)) END) AS focal_vol,
               sum(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(28,10))) AS total_vol
        FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region    ON cn.n_regionkey = r_regionkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY 1
    )
    """,
    doc="TPC-H Q8 shape (market share of one supplier nation inside a "
    "region's demand, per year): nation joined twice under different "
    "roles, region-restricted on the CUSTOMER side only, and the "
    "share computed as a conditional decimal sum over the SAME "
    "aggregate pass (no second scan).  The share divides two exact "
    "decimal sums once, then rounds — order-independent",
    bench=True,
)
def q_region_market_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = _t(spark, sf_dir, "supplier")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _revenue_col()
    focal = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(
        F.lit(0).cast("decimal(28,10)")
    )
    # r15: both dim chains pre-joined on their broadcast build sides
    # (§3.1/§1.2).  cdim = ASIA customer-nation keys (the region filter
    # prunes the broadcast relation before it ships); sdim = supplier →
    # supplier-nation name.  4 BroadcastHashJoin probes per fact row
    # collapse to 2; unique-key inner joins keep multiplicity and
    # values unchanged (oracle-verified).
    cdim = cn.join(r, F.col("cn_region") == F.col("r_regionkey")).select(
        "cn_key"
    )
    sdim = s.join(sn, F.col("s_nationkey") == F.col("sn_key")).select(
        "s_suppkey", "supp_nation"
    )
    # Measured and REJECTED (r15): pre-filtering CUSTOMER with the
    # ASIA key set BEFORE the o⋈cu join (the §2.3 semi-join prune that
    # would cut the customer shuffle ~5× when o⋈cu is a shuffle join)
    # regressed 1.007 → 1.310 s min locally and AQE did not recover —
    # the joined-input size estimate loses the broadcast decision and
    # the initial plan SMJs o⋈cu_asia, adding a custkey exchange of
    # the fact side that the current order never pays.  Revisit only
    # with runtime stats that keep the broadcast (CBO/AQE maturity).
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(cdim), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sdim), li.l_suppkey == sdim.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(focal).alias("focal_vol"),
            F.sum(vol).alias("total_vol"),
        )
    )
    return agg.select(
        "o_year",
        F.round(F.col("focal_vol").cast("double") / F.col("total_vol"), 4)
        .alias("mkt_share"),
        money(F.col("total_vol")).alias("total_volume"),
    )


@register(
    "forecast_revenue_change",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
                              AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (scan-only conditional revenue), deliberately "
    "expressed through the spark.sql SQL SURFACE (temp view + ANSI SQL "
    "string) rather than the DataFrame API — the one registry query "
    "that proves the SQL entry point plans identically: no join, no "
    "window, every predicate pushed into the parquet scan, one "
    "map-side partial + one 1-row final aggregate.  Double-literal "
    "BETWEEN bounds are bit-identical IEEE values in both engines",
)
def q_forecast_revenue_change(spark, sf_dir):
    # {li} template arg: spark.sql registers the DataFrame under a
    # generated transient name — no shared-catalog mutation (a literal
    # createOrReplaceTempView("lineitem") would shadow the table name
    # for every later spark.sql in the session).
    return spark.sql(
        """
        SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
                                  AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM {li}
        WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """,
        li=_t(spark, sf_dir, "lineitem"),
    )
