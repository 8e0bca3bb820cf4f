"""Stale-first re-green queue for the driver window (the round-11+
steady-state policy recorded in plans/__init__.py).

Reads every CORRECTNESS_r*.json in the repo root, computes each
registered query's last driver-green round, and prints:

  1. the policy's three buckets for the CURRENT window — changed-plan
     re-checks (supplied via --changed), anchors (streaming twins +
     materialization queries), and the stale-first rotation candidates;
  2. a staged rotation proposal: which >=2-round-green window slots to
     rotate out and which stalest parity-local queries to rotate in,
     sized by --slots.

The proposal is advisory — family-sibling coverage arguments still get
written by hand in plans/__init__.py (the tool cannot know which kept
sibling covers a family), but the staleness data driving the choice is
now computed, not recalled.

Usage:
    python scripts/regreen_queue.py [--slots 11] [--changed a,b]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# Demoted from the window with a written argument (plans/__init__.py
# round-1/-2 comments): vacuous hashes (0 rows at sf0.01) or strict
# duplicate shapes of a kept sibling.  The stale-first rule skips them
# — their demotion arguments say a driver slot buys zero new signal —
# but they stay in the local parity suite like everything else.
DEMOTED_WITH_ARGUMENT = {
    "customers_without_orders",      # 0 rows at sf0.01 (vacuous hash)
    "click_not_error_users",         # 0 rows at sf0.01 (vacuous hash)
    "event_user_segment_counts",     # duplicate of salted_segment_counts
    "ann_pandas_topk",               # same query as ann_bruteforce_topk
    "streaming_purchase_attribution_outer",  # outer twin of kept inner
}

ANCHOR_PREFIXES = ("streaming_",)
ANCHOR_NAMES = {
    # materialization / stateful-store queries: their bugs are
    # environment- and state-shaped, so the policy re-checks them
    # every round regardless of staleness
    "zorder_roundtrip_stats",
    "upsert_time_travel_stats",
    "ann_stored_index_topk",
    "jsonl_roundtrip_stats",
    "csv_roundtrip_stats",
}


def _rec_green(rec: dict) -> bool:
    """One driver artifact entry -> did it earn staleness credit?

    Two green shapes the driver actually emits:
      * oracle-paired: err None, hash_match True (or hash_match null
        with rows_match True — defensive; no historical artifact has
        this shape, but it is the documented rows-only fallback);
      * rows-only BY DESIGN (no oracle_sql entry): the driver records
        err == "no_oracle" with the Spark row count — green iff the
        query ran and produced rows (ffd_packing_stats is the one
        such entry; see ADVICE r10).
    Everything else (err set, hash_match False, rows_match False,
    zero rows on a no-oracle run) is NOT green.
    """
    err = rec.get("err")
    if err == "no_oracle":
        return (rec.get("spark_rows") or 0) > 0
    if err is not None:
        return False
    ok = rec.get("hash_match")
    if ok is None:  # rows-only fallback: green iff rows matched
        ok = rec.get("rows_match")
    return bool(ok)


def last_green_rounds(root: str = REPO,
                      max_round: int | None = None) -> dict[str, int]:
    """query -> latest round with a green driver entry (see _rec_green);
    queries never driver-checked are absent.  max_round restricts the
    scan to artifacts r<=max_round (for pinning historical facts that
    later rounds legitimately change)."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if _rec_green(rec):
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=11,
                    help="rotation size to propose")
    ap.add_argument("--changed", default="",
                    help="comma-separated queries whose plans changed "
                    "since their last green (policy rule 1: they jump "
                    "the queue)")
    args = ap.parse_args()

    from realtime_data_pipeline_spark.plans import REGISTRY, _DRIVER_WINDOW

    greens = last_green_rounds()
    latest_round = max(greens.values()) if greens else 0
    window = list(_DRIVER_WINDOW)
    in_window = set(window)

    stale = sorted(
        ((greens.get(n, 0), n) for n in REGISTRY),
        key=lambda t: (t[0], t[1]),
    )
    never = [n for g, n in stale if g == 0]
    if never:
        print(f"NEVER driver-green ({len(never)}): {', '.join(never)}")
        print("-> these outrank every re-green; promote (or retire "
              "with a written argument) first.\n")

    changed = [c for c in args.changed.split(",") if c]
    for c in changed:
        if c not in REGISTRY:
            raise SystemExit(f"--changed name not registered: {c}")

    anchors = [
        n for n in window
        if n.startswith(ANCHOR_PREFIXES) or n in ANCHOR_NAMES
    ]
    print(f"anchors in window ({len(anchors)}): {', '.join(anchors)}")

    # Rotate-out candidates: non-anchor window slots green in the two
    # most recent consecutive rounds.
    rotatable = []
    for n in window:
        if n in anchors or n in changed:
            continue
        if (greens.get(n, 0) == latest_round
                and _green_in_round(n, latest_round - 1)):
            rotatable.append(n)
    print(f"\nrotate-OUT eligible (>=2-round green, non-anchor): "
          f"{len(rotatable)}")
    for n in rotatable:
        print(f"  {n}")

    # Rotate-in: changed-plan first, then stalest parity-local.
    # A --changed name already in the window keeps its slot (re-check
    # in place) rather than consuming a rotate-in slot; changed names
    # are excluded from the stale pool so no pick appears twice.
    changed_in_window = [c for c in changed if c in in_window]
    changed_rotate_in = [c for c in changed if c not in in_window]
    if changed_in_window:
        print(f"\nchanged-plan, already in window (keep slot, re-check "
              f"in place): {', '.join(changed_in_window)}")
    stale_in = [
        (g, n) for g, n in stale
        if n not in in_window and g > 0 and n not in DEMOTED_WITH_ARGUMENT
        and n not in set(changed)
    ]
    k = args.slots
    picks = changed_rotate_in + [
        n for _, n in stale_in[: max(0, k - len(changed_rotate_in))]
    ]
    print(f"\nrotate-IN proposal ({len(picks)} for --slots {k}):")
    for n in picks:
        tag = "CHANGED-PLAN" if n in changed else f"last green r{greens.get(n, 0)}"
        print(f"  {n}  [{tag}]")
    print("\nRun the pre-rotation gate on every pick before staging:\n"
          "  python scripts/full_parity_sweep.py --only "
          + ",".join(picks) + "\n  (and again with --tz Asia/Kathmandu "
          "--shuffle-partitions 3)")
    return 0


def _green_in_round(name: str, rnd: int, root: str = REPO) -> bool:
    path = os.path.join(root, f"CORRECTNESS_r{rnd:02d}.json")
    if not os.path.exists(path):
        return False
    with open(path) as f:
        rec = json.load(f).get(name)
    return bool(rec) and _rec_green(rec)


if __name__ == "__main__":
    sys.exit(main())
