"""Property-based model check for the as-of join: on random frames the
union+window implementation must agree with pandas.merge_asof
(direction='backward'), the reference implementation of these
semantics.  The existing oracle covers one query shape; hypothesis
covers the lattice of edge cases (no match, all-match, equal
timestamps, keys present on one side only).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_data_pipeline_spark.operators.asof import asof_join

# small integer timestamp space so equal-ts and boundary cases are
# common; right rows get unique (key, ts) via dict keying so backward
# match is unambiguous (the operator tie-breaks equal-ts rows by
# payload, merge_asof by position — uniqueness sidesteps both)
_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=12
)
_right = st.dictionaries(
    st.tuples(st.integers(0, 3), st.integers(0, 20)),
    st.integers(0, 10**6),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_rows=_left, right_map=_right)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_map):
    left_pdf = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        columns=["lid", "k", "lts"],
    )
    right_pdf = pd.DataFrame(
        [(k, t, v) for (k, t), v in right_map.items()],
        columns=["k", "rts", "val"],
    )

    ldf = spark.createDataFrame(left_pdf.astype("int64"))
    if len(right_pdf):
        rdf = spark.createDataFrame(right_pdf.astype("int64"))
    else:
        rdf = spark.createDataFrame([], "k long, rts long, val long")

    got_rows = asof_join(
        ldf, rdf, keys=["k"], left_ts="lts", right_ts="rts",
        payload_cols=["val"],
    ).collect()
    got = {
        r["lid"]: (None if r["asof"] is None else (r["asof"]["ts"], r["asof"]["val"]))
        for r in got_rows
    }

    if len(right_pdf):
        want_pdf = pd.merge_asof(
            left_pdf.sort_values(["lts", "lid"]),
            right_pdf.sort_values("rts"),
            left_on="lts",
            right_on="rts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        want = {
            int(r.lid): (None if pd.isna(r.rts) else (int(r.rts), int(r.val)))
            for r in want_pdf.itertuples()
        }
    else:
        want = {int(r.lid): None for r in left_pdf.itertuples()}

    assert got == want
