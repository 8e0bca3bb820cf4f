"""Pins for scripts/regreen_queue.py — the staleness computation that
stages round-11+ driver-window rotations (the steady-state re-green
policy in plans/__init__.py).  A parsing bug here would silently
mis-stage a rotation, so the artifact semantics are pinned:

  * hash_match=True, err=None  -> green in that round
  * hash_match=None            -> rows-only query: green iff rows_match
  * err set, or hash_match=False -> NOT green (no staleness credit)
  * last green = max round, not first
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "regreen_queue", os.path.join(REPO, "scripts", "regreen_queue.py")
)
regreen = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(regreen)


def _write(root, rnd, data):
    with open(os.path.join(root, f"CORRECTNESS_r{rnd:02d}.json"), "w") as f:
        json.dump(data, f)


def test_last_green_rounds_semantics(tmp_path):
    root = str(tmp_path)
    _write(root, 1, {
        "a": {"hash_match": True, "rows_match": True, "err": None},
        "b": {"hash_match": False, "rows_match": True, "err": None},
        "rows_only": {"hash_match": None, "rows_match": True, "err": None},
        "errored": {"hash_match": True, "rows_match": True, "err": "boom"},
    })
    _write(root, 3, {
        "a": {"hash_match": True, "rows_match": True, "err": None},
        "b": {"hash_match": True, "rows_match": True, "err": None},
        "rows_only": {"hash_match": None, "rows_match": False, "err": None},
    })
    greens = regreen.last_green_rounds(root)
    assert greens["a"] == 3          # max round wins
    assert greens["b"] == 3          # red r1, green r3
    assert greens["rows_only"] == 1  # rows-only green r1, rows red r3
    assert "errored" not in greens   # err voids the entry


def test_green_in_round_matches_last_green(tmp_path):
    root = str(tmp_path)
    _write(root, 2, {
        "a": {"hash_match": True, "rows_match": True, "err": None},
        "rows_only": {"hash_match": None, "rows_match": True, "err": None},
    })
    assert regreen._green_in_round("a", 2, root)
    assert regreen._green_in_round("rows_only", 2, root)
    assert not regreen._green_in_round("a", 1, root)      # no artifact
    assert not regreen._green_in_round("missing", 2, root)


def test_real_artifacts_parse_and_cover_known_facts():
    """Against the repo's actual artifacts: every green entry parses,
    and two facts this round's rotation relied on hold — the r9 window
    was 50/50 green, and ngram_jaccard_pairs' last green predates its
    round-10 plan change (r1-r3 checks hashed the OLD generator)."""
    greens = regreen.last_green_rounds()
    assert len(greens) >= 140
    with open(os.path.join(REPO, "CORRECTNESS_r09.json")) as f:
        r9 = json.load(f)
    for name in r9:
        assert greens.get(name, 0) >= 9, name
    assert greens["ngram_jaccard_pairs"] <= 3


def test_demoted_exemptions_are_registered_queries():
    sys.path.insert(0, REPO)
    from realtime_data_pipeline_spark.plans import REGISTRY

    stale = regreen.DEMOTED_WITH_ARGUMENT - set(REGISTRY)
    assert not stale, f"exemption list names unregistered queries: {stale}"
