"""Serving-layer analytics — the reference dashboard's pandas queries
re-expressed as Spark DataFrame queries over the aggregate tables.

Parity targets (reporting/reporting.py):
  A3  avg interactions per (user, window) row   — :101-104
  A4  max interactions over (item, window) rows — :105-108
  A5  min interactions over (item, window) rows — :109-112
  A6  latest window via max(window_end)         — :175-178
  T1  top-N users: sort desc + head(N)          — :150-154
  T2  top-N items in latest window              — :175-181
  T3  recent rows: sort by window_end desc, 100 — :124,130

Semantic fine print preserved (SURVEY §1.4): the KPIs are means/extrema
over *aggregate rows* (key × window), not per-distinct-key — exactly
what the dashboard computes.

Scale notes: top-N compiles to TakeOrderedAndProject (true distributed
top-k: per-partition heap then driver merge of N rows, no global sort);
the latest-window filter is a 1-row aggregate cross-joined back, which
Spark broadcasts.  All queries take deterministic tie-breakers so
results are stable across partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def avg_interactions(agg: DataFrame, ndigits: int = 2) -> DataFrame:
    """A3: global mean of total_interactions over aggregate rows."""
    return agg.agg(
        F.round(F.avg("total_interactions"), ndigits).alias("avg_interactions")
    )


def interaction_extrema(agg: DataFrame) -> DataFrame:
    """A4+A5: global max/min of total_interactions over aggregate rows."""
    return agg.agg(
        F.max("total_interactions").alias("max_interactions"),
        F.min("total_interactions").alias("min_interactions"),
        F.count("*").alias("n_rows"),
    )


def top_rows(agg: DataFrame, key_name: str, n: int = 20) -> DataFrame:
    """T1: top-N aggregate rows by total_interactions (desc), with
    deterministic tie-breakers (key asc, window_start asc)."""
    return agg.orderBy(
        F.desc("total_interactions"), F.asc(key_name), F.asc("window_start")
    ).limit(n)


def latest_window(agg: DataFrame) -> DataFrame:
    """A6: the 1-row max(window_end) — broadcast back by callers."""
    return agg.agg(F.max("window_end").alias("latest_window_end"))


def latest_window_top(agg: DataFrame, key_name: str, n: int = 20) -> DataFrame:
    """T2: restrict to the latest window (max window_end) then top-N desc.

    The inner 1-row aggregate joins back via an equality filter — Spark
    plans it as a broadcast of the single-row side.
    """
    latest = latest_window(agg)
    return (
        agg.join(
            F.broadcast(latest),
            agg["window_end"] == latest["latest_window_end"],
            "inner",
        )
        .drop("latest_window_end")
        .orderBy(F.desc("total_interactions"), F.asc(key_name))
        .limit(n)
    )


def recent_rows(agg: DataFrame, key_name: str, n: int = 100) -> DataFrame:
    """T3: most recent N aggregate rows by window_end desc."""
    return agg.orderBy(
        F.desc("window_end"), F.asc(key_name), F.asc("window_start")
    ).limit(n)
