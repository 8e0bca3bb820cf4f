"""Property-based model check for gap-based sessionization
(user_session_stats): on random event streams the lag + windowed-cumsum
implementation must agree with a pure-Python per-user fold.  The
oracle covers the fixture's shapes; hypothesis covers the lattice of
edge cases — equal timestamps (tie-broken by event_id, which must not
split a session), gaps exactly AT the 30-minute boundary (a break
requires STRICTLY greater), single-event users, and NULL user/ts rows
(excluded identically by both engines).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_data_pipeline_spark.plans.registry import REGISTRY
from realtime_data_pipeline_spark.plans.training import SESSION_GAP_MIN

_BASE = dt.datetime(2024, 1, 1)
_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000

# minute offsets drawn from multiples of 15 so exact-30-minute gaps
# (the > boundary) and ties are COMMON, not one-in-a-million
_events_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 2)),   # user_id (None = drop)
        st.one_of(st.none(), st.integers(0, 20)),  # ts slot (None = drop)
    ),
    min_size=1,
    max_size=16,
)


def _python_model(rows):
    """rows: [(event_id, user_id, ts_us)] with NULLs already removed."""
    by_user: dict[int, list[tuple[int, int]]] = {}
    for eid, uid, us in rows:
        by_user.setdefault(uid, []).append((us, eid))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        sessions: list[list[int]] = [[evs[0][0]]]
        for (us, _), (prev_us, _) in zip(evs[1:], evs):
            if us - prev_us > _GAP_US:
                sessions.append([us])
            else:
                sessions[-1].append(us)
        durs = [s[-1] - s[0] for s in sessions]
        out[uid] = (
            len(sessions),
            max(len(s) for s in sessions),
            round(sum(durs) / (len(sessions) * 1e6), 4),
        )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_events_strategy)
def test_sessionization_matches_python_fold(spark, tmp_path_factory, events):
    d = tmp_path_factory.mktemp("sess")
    rows = [
        (
            i,
            None if slot is None else _BASE + dt.timedelta(minutes=15 * slot),
            uid,
            "view",
            1.0,
            "{}",
        )
        for i, (uid, slot) in enumerate(events)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "events.parquet")
    )

    got = {
        int(r["user_id"]): (
            r["n_sessions"],
            r["max_session_events"],
            r["avg_session_sec"],
        )
        for r in REGISTRY["user_session_stats"].fn(spark, str(d)).collect()
    }

    # offsets only — the absolute base cancels in every gap/duration
    model_rows = [
        (i, uid, 15 * slot * 60 * 1_000_000)
        for i, (uid, slot) in enumerate(events)
        if uid is not None and slot is not None
    ]
    want = _python_model(model_rows)
    assert got == want, (got, want)
