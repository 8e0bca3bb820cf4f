"""Fast-append mode of the keyed-upsert sink (round 13).

The r13 streaming soak measured the one per-batch cost that grows
with table size — the bucket rewrite — even though append-mode
batches only insert new keys.  `monotone_col=` turns those merges
into leaf APPENDS guarded by per-bucket high-water marks; these tests
pin (a) result equivalence with the classic path on every sequence,
(b) that appends really do not rewrite or supersede old leaves,
(c) the stack_max fold, (d) replay/overlap falling back to the
rewrite path, and (e) time travel / delete_keys over stacked leaves.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from realtime_data_pipeline_spark.streaming.sinks import UpsertTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "w int, k int, v int")


def _batch(spark, w, keys):
    # key = (w, k); w is the monotone component
    return _df(spark, [(w, k, w * 100 + k) for k in keys])


def _snapshot(table):
    rows = [(r.w, r.k, r.v) for r in table.read().collect()]
    return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))


def _manifest(path):
    with open(os.path.join(path, "_CURRENT")) as f:
        return json.load(f)


def _leaf_mtimes(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            out[p] = os.path.getmtime(p)
    return out


def test_fast_append_matches_classic_results(spark, tmp_path):
    """Any monotone batch sequence: fast-append table == classic
    table, row for row."""
    fast = UpsertTable(
        spark, str(tmp_path / "fast"), ["w", "k"], n_buckets=4,
        monotone_col="w",
    )
    classic = UpsertTable(
        spark, str(tmp_path / "classic"), ["w", "k"], n_buckets=4
    )
    for w, keys in [(1, range(6)), (2, range(4)), (3, range(8)), (5, [0])]:
        fast.merge(_batch(spark, w, keys))
        classic.merge(_batch(spark, w, keys))
    assert _snapshot(fast) == _snapshot(classic)


def test_fast_append_stacks_leaves_without_superseding(spark, tmp_path):
    path = str(tmp_path / "t")
    t = UpsertTable(spark, path, ["w", "k"], n_buckets=2, monotone_col="w")
    t.merge(_batch(spark, 1, range(8)))
    m1 = _manifest(path)
    files_before = _leaf_mtimes(path)
    t.merge(_batch(spark, 2, range(8)))
    m2 = _manifest(path)
    # every bucket entry grew into a 2-leaf stack; nothing pending
    for b, entry in m2["buckets"].items():
        assert isinstance(entry, list) and len(entry) == 2, (b, entry)
    assert m2.get("pending", []) == []
    # the v1 leaf files were not rewritten (same paths, same mtimes)
    files_after = _leaf_mtimes(path)
    for p, mt in files_before.items():
        if f"v={m1['version']}" in p and "manifest" not in p:
            assert files_after.get(p) == mt, p
    assert len(t.read().collect()) == 16


def test_overlap_falls_back_to_rewrite_and_upserts(spark, tmp_path):
    path = str(tmp_path / "t")
    t = UpsertTable(spark, path, ["w", "k"], n_buckets=2, monotone_col="w")
    t.merge(_batch(spark, 1, range(4)))
    t.merge(_batch(spark, 2, range(4)))
    # same w=2 again with different values: keys collide -> rewrite
    t.merge(_df(spark, [(2, k, 999) for k in range(4)]))
    m = _manifest(path)
    for entry in m["buckets"].values():
        assert not isinstance(entry, list) or len(entry) == 1, entry
    got = {(r.w, r.k): r.v for r in t.read().collect()}
    assert all(got[(2, k)] == 999 for k in range(4))
    assert len(got) == 8  # no duplicate keys after the fold


def test_replay_of_appended_batch_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    t = UpsertTable(spark, path, ["w", "k"], n_buckets=2, monotone_col="w")
    t.merge(_batch(spark, 1, range(4)))
    t.merge(_batch(spark, 2, range(4)))
    before = _snapshot(t)
    t.merge(_batch(spark, 2, range(4)))  # checkpoint replay
    assert _snapshot(t) == before


def test_stack_max_forces_fold(spark, tmp_path):
    path = str(tmp_path / "t")
    t = UpsertTable(
        spark, path, ["w", "k"], n_buckets=1, monotone_col="w", stack_max=3
    )
    for w in range(1, 5):  # 4 merges, stack_max=3
        t.merge(_batch(spark, w, range(3)))
    m = _manifest(path)
    entry = m["buckets"]["0"]
    # merge 4 found a 3-leaf stack -> fold: single leaf again
    assert not isinstance(entry, list) or len(entry) == 1, entry
    assert len(t.read().collect()) == 12


def test_time_travel_across_appended_versions(spark, tmp_path):
    path = str(tmp_path / "t")
    t = UpsertTable(
        spark, path, ["w", "k"], n_buckets=2, monotone_col="w",
        retain_versions=4,
    )
    seen = []
    for w in (1, 2, 3):
        t.merge(_batch(spark, w, range(4)))
        seen.append(_snapshot(t))
    for i, v in enumerate(t.versions()):
        got = sorted(
            (r.w, r.k, r.v) for r in t.read(version=v).collect()
        )
        assert got == seen[i], v


def test_delete_keys_on_stacked_bucket(spark, tmp_path):
    path = str(tmp_path / "t")
    t = UpsertTable(spark, path, ["w", "k"], n_buckets=1, monotone_col="w")
    t.merge(_batch(spark, 1, range(4)))
    t.merge(_batch(spark, 2, range(4)))
    n = t.delete_keys(_df(spark, [(1, 0, 0), (2, 3, 0)]).select("w", "k"))
    assert n == 2
    got = {(r.w, r.k) for r in t.read().collect()}
    assert (1, 0) not in got and (2, 3) not in got and len(got) == 6
    # the rewrite folded the stack
    entry = _manifest(path)["buckets"]["0"]
    assert not isinstance(entry, list) or len(entry) == 1


def test_null_monotone_values_match_classic_semantics(spark, tmp_path):
    """An all-null monotone batch takes the rewrite path (its min is
    null, so fast eligibility cannot be proven); whatever SQL
    null-equality does to such keys, the fast table must do exactly
    what the classic table does."""
    fast = UpsertTable(
        spark, str(tmp_path / "fast"), ["w", "k"], n_buckets=1,
        monotone_col="w",
    )
    classic = UpsertTable(
        spark, str(tmp_path / "classic"), ["w", "k"], n_buckets=1
    )
    seq = [
        _batch(spark, 1, range(3)),
        spark.createDataFrame(
            [(None, 9, 1), (None, 8, 2)], "w int, k int, v int"
        ),
        _batch(spark, 2, range(3)),
        spark.createDataFrame([(None, 9, 77)], "w int, k int, v int"),
    ]
    for b in seq:
        fast.merge(b)
        classic.merge(b)
    assert _snapshot(fast) == _snapshot(classic)


def test_legacy_table_opened_with_monotone_col(spark, tmp_path):
    """A table written WITHOUT monotone tracking has no high-water
    marks: the first merge per bucket rewrites (mark unknown), later
    merges fast-append once the mark is established."""
    path = str(tmp_path / "t")
    legacy = UpsertTable(spark, path, ["w", "k"], n_buckets=1)
    legacy.merge(_batch(spark, 1, range(4)))
    t = UpsertTable(spark, path, ["w", "k"], n_buckets=1, monotone_col="w")
    t.merge(_batch(spark, 2, range(4)))  # mark unknown -> rewrite
    assert not isinstance(_manifest(path)["buckets"]["0"], list)
    t.merge(_batch(spark, 3, range(4)))  # mark known now -> append
    entry = _manifest(path)["buckets"]["0"]
    assert isinstance(entry, list) and len(entry) == 2
    assert len(t.read().collect()) == 12


def test_monotone_col_must_be_a_key_col(spark, tmp_path):
    with pytest.raises(ValueError, match="must be one of the key"):
        UpsertTable(
            spark, str(tmp_path / "t"), ["k"], monotone_col="w"
        )


def test_timestamp_monotone_marks_roundtrip_manifest(spark, tmp_path):
    """window_start is a timestamp — the mark must survive the JSON
    manifest and keep ordering (the production shape)."""
    import datetime as dt

    path = str(tmp_path / "t")
    t = UpsertTable(
        spark, path, ["ws", "k"], n_buckets=1, monotone_col="ws"
    )

    def b(day, keys):
        return spark.createDataFrame(
            [(dt.datetime(2024, 3, day), k, k) for k in keys],
            "ws timestamp, k int, v int",
        )

    t.merge(b(1, range(3)))
    t.merge(b(2, range(3)))  # strictly later -> append
    entry = _manifest(path)["buckets"]["0"]
    assert isinstance(entry, list) and len(entry) == 2
    t.merge(b(2, range(3)))  # replay -> fold
    assert len(t.read().collect()) == 6


def test_classic_mode_merge_invalidates_stale_marks(spark, tmp_path):
    """ADVICE r13 (medium): a classic-mode merge (monotone_col=None)
    can insert rows whose monotone values exceed the stored high-water
    marks.  If the marks survived, a later monotone-mode reopen could
    pass the `lo > mark` fast-append test against a stale mark while
    the batch's keys collide with the classic-inserted rows — the
    append would skip the anti-join and duplicate keys.  The classic
    merge must therefore drop the touched buckets' marks."""
    path = str(tmp_path / "t")
    t = UpsertTable(spark, path, ["w", "k"], n_buckets=1, monotone_col="w")
    t.merge(_batch(spark, 1, range(4)))
    t.merge(_batch(spark, 2, range(4)))  # marks now say max w == 2
    # classic reopen inserts keys at w=10 — beyond the stored mark
    classic = UpsertTable(spark, path, ["w", "k"], n_buckets=1)
    classic.merge(_df(spark, [(10, k, -1) for k in range(4)]))
    mm = _manifest(path).get("mono_max")
    assert not (mm or {}).get("marks"), mm  # touched bucket's mark gone
    # monotone reopen upserts the SAME (10, k) keys: mark is unknown,
    # so this must take the rewrite path and keep keys unique
    t2 = UpsertTable(spark, path, ["w", "k"], n_buckets=1, monotone_col="w")
    t2.merge(_df(spark, [(10, k, 777) for k in range(4)]))
    got = {(r.w, r.k): r.v for r in t2.read().collect()}
    assert len(got) == 12  # 4+4+4 distinct keys, no duplicates
    assert all(got[(10, k)] == 777 for k in range(4))


def test_marks_tagged_with_column_identity(spark, tmp_path):
    """Marks recorded for one monotone column must not be trusted when
    the table is reopened with a DIFFERENT key column as monotone_col
    — the `lo > mark` comparison would be between incomparable
    domains.  Scenario: key (k, t), marks recorded on t; reopening on
    k and upserting an existing key whose k exceeds the stored t-mark
    must still rewrite (single row), not fast-append a duplicate."""
    path = str(tmp_path / "t")
    rows = "k int, t int, v int"
    t1 = UpsertTable(spark, path, ["k", "t"], n_buckets=1, monotone_col="t")
    t1.merge(spark.createDataFrame([(200, 50, 1)], rows))
    mm = _manifest(path)["mono_max"]
    assert mm["col"] == "t" and mm["marks"], mm  # tagged layout
    t2 = UpsertTable(spark, path, ["k", "t"], n_buckets=1, monotone_col="k")
    # same key (200, 50): k-lo = 200 > stale t-mark 50, but the mark
    # is for another column — must be ignored, rewrite, upsert
    t2.merge(spark.createDataFrame([(200, 50, 2)], rows))
    got = t2.read().collect()
    assert len(got) == 1 and got[0].v == 2
    # and the manifest now carries k-marks, relearned on the rewrite
    mm2 = _manifest(path)["mono_max"]
    assert mm2["col"] == "k" and mm2["marks"], mm2


def test_delete_emptying_bucket_drops_its_mark(spark, tmp_path):
    path = str(tmp_path / "t")
    t = UpsertTable(spark, path, ["w", "k"], n_buckets=1, monotone_col="w")
    t.merge(_batch(spark, 1, range(3)))
    assert _manifest(path)["mono_max"]["marks"]
    t.delete_keys(_batch(spark, 1, range(3)).select("w", "k"))
    m = _manifest(path)
    assert m["buckets"] == {}
    assert not m.get("mono_max", {}).get("marks"), m.get("mono_max")


def test_registry_windowed_twins_engage_fast_path(spark):
    """Round-14 adoption pin: the driver-hashed append-mode windowed
    twins run their replay through the fast-append sink
    (monotone_col="window_start") and the fast path actually ENGAGES —
    the final manifest carries a multi-leaf bucket stack and the
    column-tagged marks, proving the second emission batch appended
    instead of silently falling back to the rewrite path.  (Result
    parity with the classic sink is covered by the oracle suites; this
    pins the mechanism.)"""
    import json

    from realtime_data_pipeline_spark.plans import REGISTRY

    df = REGISTRY["streaming_dedup_user_counts"].fn(
        spark, "/root/testdata/sf0.001"
    )
    assert df.count() > 0
    root = df.inputFiles()[0].split("/v=")[0].replace("file:", "")
    m = _manifest(root)
    stacks = [
        e
        for e in m["buckets"].values()
        if isinstance(e, list) and len(e) > 1
    ]
    assert stacks, m["buckets"]  # >=1 bucket took a leaf APPEND
    assert m["mono_max"]["col"] == "window_start"
    assert m["mono_max"]["marks"]
