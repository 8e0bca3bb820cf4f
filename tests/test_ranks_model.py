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
