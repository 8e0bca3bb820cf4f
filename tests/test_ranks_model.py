"""Property-based model check for the two-pass global row number:
random multisets (duplicates force the tie-break path, skew hits
range-partition boundaries) must rank exactly as python sorted().
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_data_pipeline_spark.operators.ranks import with_global_row_number

_vals = st.lists(st.integers(-5, 5), min_size=1, max_size=30)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=_vals)
def test_global_rn_matches_sorted_order(spark, vals):
    rows = [(i, v) for i, v in enumerate(vals)]  # i = unique tie-break
    df = spark.createDataFrame(rows, "uid long, v long")
    out, total = with_global_row_number(df, ["v", "uid"])
    got = {r["uid"]: r["global_rn"] for r in out.collect()}
    want = {
        uid: rn
        for rn, (v, uid) in enumerate(
            sorted((v, uid) for uid, v in rows), start=1
        )
    }
    assert got == want and total == len(vals)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=_vals)
def test_global_running_sum_matches_prefix_sums(spark, vals):
    """r14: the weighted two-pass cumsum (the tie-group rank-bounds
    machinery model_eval_report now uses) must equal python prefix
    sums under the same total order — and the grand total must equal
    the plain sum."""
    from realtime_data_pipeline_spark.operators.ranks import (
        with_global_running_sum,
    )

    # unique keys (groupBy-output shape), weights >= 0 incl. zero
    rows = [(i, abs(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, w long")
    out, total = with_global_running_sum(df, ["k"], "w", out_col="cum")
    got = {r["k"]: r["cum"] for r in out.collect()}
    acc, want = 0, {}
    for k, w in sorted(rows):
        acc += w
        want[k] = acc
    assert got == want and total == acc


def test_global_running_sum_reproduces_tie_group_rank_bounds(spark):
    """The substitution model_eval_report relies on: per tie group,
    (cum - c + 1, cum) == (min, max) of the per-row global row number
    ordered by (score, unique key)."""
    from realtime_data_pipeline_spark.operators.ranks import (
        with_global_running_sum,
    )
    from pyspark.sql import functions as F

    vals = [1.5, 1.5, 1.5, 2.0, 2.0, 7.25, 9.0, 9.0, 9.0, 9.0]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "uid long, score double")

    ranked, _ = with_global_row_number(df, ["score", "uid"], rn_col="rn")
    want = {
        (r["score"], r["mn"], r["mx"], r["c"])
        for r in ranked.groupBy("score")
        .agg(
            F.min("rn").alias("mn"),
            F.max("rn").alias("mx"),
            F.count("*").alias("c"),
        )
        .collect()
    }

    g0 = df.groupBy("score").agg(F.count("*").alias("c"))
    gc, total = with_global_running_sum(g0, ["score"], "c", out_col="cum")
    got = {
        (r["score"], r["cum"] - r["c"] + 1, r["cum"], r["c"])
        for r in gc.collect()
    }
    assert got == want and total == len(vals)


def test_ranks_leave_no_cache_entry(spark):
    """r15 (VERDICT r14 #7): the two-pass helpers used to persist()
    their range-partitioned input with no unpersist on the success
    path — a CacheManager entry leaked per call in a long-lived
    session.  They now pin the sampled partitioning with a lazy
    localCheckpoint (ContextCleaner-managed blocks), so after building
    AND executing the result the session cache must be empty."""
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark.operators.ranks import (
        with_global_row_number,
        with_global_running_sum,
    )

    spark.catalog.clearCache()
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(500)], "uid long, w int"
    )
    out1, n1 = with_global_row_number(df, ["w", "uid"], rn_col="rn")
    out2, n2 = with_global_running_sum(df, ["w", "uid"], "w")
    assert out1.count() == 500 and n1 == 500
    assert out2.count() == 500 and n2 == sum(i % 7 for i in range(500))
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_running_sum_rejects_non_integral_weight(spark):
    """ADVICE r14: the offsets cross the driver through a declared
    `long` schema — a double weight would truncate silently."""
    import pytest

    from realtime_data_pipeline_spark.operators.ranks import (
        with_global_running_sum,
    )

    df = spark.createDataFrame([(1, 0.5)], "uid long, w double")
    with pytest.raises(TypeError, match="integral"):
        with_global_running_sum(df, ["uid"], "w")
