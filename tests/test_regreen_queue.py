"""Pins for scripts/regreen_queue.py — the staleness computation that
stages round-11+ driver-window rotations (the steady-state re-green
policy in plans/__init__.py).  A parsing bug here would silently
mis-stage a rotation, so the artifact semantics are pinned:

  * hash_match=True, err=None  -> green in that round
  * hash_match=None, err=None  -> rows-only fallback: green iff rows_match
  * err == "no_oracle"         -> rows-only BY DESIGN: green iff the
                                  query ran and produced rows (this is
    the shape the driver actually emits for queries with no oracle_sql
    entry — ffd_packing_stats — per ADVICE r10; such entries DO earn
    staleness credit, else they'd loop forever in the promote-first
    bucket no promotion can clear)
  * any other err, or hash_match=False -> NOT green
  * last green = max round, not first

Historical facts are pinned against an EXPLICIT max_round (r9), never
the open artifact set — a fact like "ngram's last green predates its
round-10 re-scope" is true of r1–r9 forever but falsified by design
the moment the round-10 artifact (where the re-scoped plan goes green)
lands in the repo root.  The r10 time-bomb (VERDICT r10 #1) is the
cautionary tale.
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
        "no_oracle": {"hash_match": None, "rows_match": None,
                      "spark_rows": 20, "err": "no_oracle"},
        "no_oracle_empty": {"hash_match": None, "rows_match": None,
                            "spark_rows": 0, "err": "no_oracle"},
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
    assert greens["no_oracle"] == 1  # rows-only by design: ran, rows>0
    assert "no_oracle_empty" not in greens  # 0 rows = no signal


def test_max_round_restricts_scan(tmp_path):
    root = str(tmp_path)
    _write(root, 2, {"a": {"hash_match": True, "rows_match": True,
                           "err": None}})
    _write(root, 5, {"a": {"hash_match": True, "rows_match": True,
                           "err": None}})
    assert regreen.last_green_rounds(root)["a"] == 5
    assert regreen.last_green_rounds(root, max_round=4)["a"] == 2
    assert regreen.last_green_rounds(root, max_round=1) == {}


def test_green_in_round_matches_last_green(tmp_path):
    root = str(tmp_path)
    _write(root, 2, {
        "a": {"hash_match": True, "rows_match": True, "err": None},
        "rows_only": {"hash_match": None, "rows_match": True, "err": None},
        "no_oracle": {"hash_match": None, "rows_match": None,
                      "spark_rows": 7, "err": "no_oracle"},
    })
    assert regreen._green_in_round("a", 2, root)
    assert regreen._green_in_round("rows_only", 2, root)
    assert regreen._green_in_round("no_oracle", 2, root)
    assert not regreen._green_in_round("a", 1, root)      # no artifact
    assert not regreen._green_in_round("missing", 2, root)


def test_real_artifacts_parse_and_cover_known_facts():
    """Against the repo's actual artifacts: every green entry parses,
    and the rotation-history facts hold.  Facts about a CLOSED round
    range are asserted with max_round so future artifacts cannot
    falsify them; facts about the open set are durable invariants
    (monotone under new green artifacts)."""
    greens_r9 = regreen.last_green_rounds(max_round=9)
    assert len(greens_r9) >= 140
    with open(os.path.join(REPO, "CORRECTNESS_r09.json")) as f:
        r9 = json.load(f)
    for name in r9:
        assert greens_r9.get(name, 0) == 9, name  # r9 window 50/50 green
    # The round-10 rotation staged ngram_jaccard_pairs as CHANGED-PLAN
    # because its r1-r3 driver checks hashed the pre-rescope generator:
    assert greens_r9["ngram_jaccard_pairs"] <= 3
    # Durable: the re-scoped plan went green at its r10 re-check and
    # any later green only raises this.
    greens = regreen.last_green_rounds()
    assert greens["ngram_jaccard_pairs"] >= 10
    # Durable: the rows-only-by-design entry earns staleness credit
    # (the ADVICE r10 fix) — it was in the r10 window with 20 rows.
    assert greens.get("ffd_packing_stats", 0) >= 10


def test_demoted_exemptions_are_registered_queries():
    sys.path.insert(0, REPO)
    from realtime_data_pipeline_spark.plans import REGISTRY

    stale = regreen.DEMOTED_WITH_ARGUMENT - set(REGISTRY)
    assert not stale, f"exemption list names unregistered queries: {stale}"
