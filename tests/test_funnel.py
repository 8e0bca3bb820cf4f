"""Funnel semantics on crafted fixtures (plans/training.funnel_counts).

The parquet testdata saturates the funnel (every user converts:
150/150/150 at sf0.01), so the DuckDB oracle check cannot distinguish
strict staged ordering from, say, three independent counts.  These
fixtures pin the ordering contract stage by stage.
"""

from __future__ import annotations

import datetime as dt

from realtime_data_pipeline_spark.plans.training import funnel_counts


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _run(spark, rows):
    ev = spark.createDataFrame(
        [(u, _t(m), e) for u, m, e in rows],
        "user_id long, ts timestamp_ntz, event_type string",
    )
    got = funnel_counts(ev).collect()[0]
    return (
        got["n_view_users"],
        got["n_click_after_view"],
        got["n_purchase_after_click"],
    )


def test_funnel_strict_stage_ordering(spark):
    rows = [
        # A: full funnel in order -> counts everywhere
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        # B: click BEFORE the first view only -> view stage only
        (2, 1, "click"), (2, 2, "view"),
        # C: purchase without any click -> view stage only
        (3, 1, "view"), (3, 2, "purchase"),
        # D: purchase between view and click (not after click) -> two stages
        (4, 1, "view"), (4, 3, "click"), (4, 2, "purchase"),
        # E: purchase then click then view (reverse order) -> view stage only
        (5, 1, "purchase"), (5, 2, "click"), (5, 3, "view"),
        # F: no view at all -> counted nowhere
        (6, 1, "click"), (6, 2, "purchase"),
    ]
    assert _run(spark, rows) == (5, 2, 1)


def test_funnel_uses_first_view_and_first_qualifying_click(spark):
    rows = [
        # first view at t1; clicks at t0 (ignored) and t2 (qualifies);
        # purchase at t3 > t2 -> full conversion
        (1, 0, "click"), (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        # first qualifying click is t4 (after view t1); the purchase at
        # t3 precedes it -> no purchase stage.  A buggy "any click"
        # implementation that picked the later click t6 would also be
        # wrong the other way; pin t_click = FIRST click after view.
        (2, 1, "view"), (2, 3, "purchase"), (2, 4, "click"), (2, 6, "click"),
    ]
    assert _run(spark, rows) == (2, 2, 1)


def test_funnel_equal_timestamps_are_not_after(spark):
    # strict '>' at each stage: same-instant events do not advance
    rows = [
        (1, 1, "view"), (1, 1, "click"),
        (2, 1, "view"), (2, 2, "click"), (2, 2, "purchase"),
    ]
    assert _run(spark, rows) == (2, 1, 0)


def test_funnel_empty_input(spark):
    ev = spark.createDataFrame(
        [], "user_id long, ts timestamp_ntz, event_type string"
    )
    got = funnel_counts(ev).collect()[0]
    assert tuple(got) == (0, 0, 0)
