"""Event-time windowed aggregations — the heart of the reference.

Parity targets:
  A1  sliding 10min/5min count by user   — consumer/consumer.py:116-126
  A2  sliding 10min/5min count by item   — consumer/consumer.py:130-140
  W2  window operator (tumbling variant) — consumer/consumer.py:117,131
  P4  conjunctive null filter            — consumer/consumer.py:111
  P5  window-struct flatten + rename     — consumer/consumer.py:121-126

These are pure DataFrame transformations: in batch they compile to a
partial+final hash aggregate over a single shuffle on (window, key);
in streaming the identical expression runs incrementally against the
state store.  At 100 TB the shuffle is keyed on (window, key) — high
cardinality, naturally well-distributed; AQE coalesces or splits
post-shuffle partitions at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def item_key(props_col: str = "props") -> Column:
    """Item-key surrogate: the testdata carries the reference's item_id
    inside a JSON props column — extract with a JVM-side JSON path
    (no UDF)."""
    return F.get_json_object(F.col(props_col), "$.k")


def _windowed_counts(
    events: DataFrame,
    key: Column,
    key_name: str,
    ts_col: str,
    duration: str,
    slide: str | None,
    count_name: str = "total_interactions",
) -> DataFrame:
    win = (
        F.window(F.col(ts_col), duration, slide)
        if slide
        else F.window(F.col(ts_col), duration)
    )
    return (
        events
        # Materialize the (possibly derived, e.g. JSON-extracted) key
        # ONCE before using it twice — referenced directly in both the
        # filter and the group key, get_json_object would be evaluated
        # twice per row (~20% of A2's runtime at sf0.1).  Also prunes
        # the scan to exactly (ts, key).
        .select(F.col(ts_col), key.alias(key_name))
        # P4: null hygiene before aggregation (key or ts null → drop)
        .where(F.col(ts_col).isNotNull() & F.col(key_name).isNotNull())
        .groupBy(win.alias("window"), F.col(key_name))
        .agg(F.count("*").alias(count_name))
        # P5: flatten the window struct with the reference's column names
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col(key_name),
            F.col(count_name),
        )
    )


def sliding_window_counts(
    events: DataFrame,
    key: Column,
    key_name: str,
    ts_col: str = "ts",
    duration: str = "10 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """A1/A2: sliding-window row counts per key.

    Every event lands in exactly duration/slide windows (2 at the
    reference's 10min/5min defaults).
    """
    return _windowed_counts(events, key, key_name, ts_col, duration, slide)


def tumbling_window_counts(
    events: DataFrame,
    key: Column,
    key_name: str,
    ts_col: str = "ts",
    duration: str = "10 minutes",
) -> DataFrame:
    """W2 variant: tumbling windows (no slide) — each event in exactly 1."""
    return _windowed_counts(events, key, key_name, ts_col, duration, None)
