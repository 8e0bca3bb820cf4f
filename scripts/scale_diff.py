"""Cross-round scale-curve diff (VERDICT r8 #7): compare two
SCALE_r{N}.json artifacts query-by-query and flag any ratio that moved
more than --flag-factor (default 1.5x) round-over-round — the committed
protocol for telling a real plan regression from measurement noise
before it costs a round.

Usage: python scripts/scale_diff.py SCALE_r08.json SCALE_r09.json
Prints a markdown table (for PLANS.md) plus a FLAGGED list; exit 0
always (the diff informs, the builder adjudicates — a flagged ratio
means "re-measure in a dedicated process and read the plan", not
"fail the build").
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--flag-factor", type=float, default=1.5)
    args = ap.parse_args()

    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)

    names = sorted(set(old["ratios"]) | set(new["ratios"]))
    flagged = []
    print(f"| query | {args.old} ratio | {args.new} ratio | x | "
          f"large_sec old | new | write-ratio old | new | "
          f"large spill old | new |")
    print("|---|---|---|---|---|---|---|---|---|---|")

    def _spill(art, n):  # large-step disk-spill bytes (r10+ artifacts)
        b = art.get("large_bytes", {}).get(n)
        return b.get("disk_spill") if b else None

    for n in names:
        r0, r1 = old["ratios"].get(n), new["ratios"].get(n)
        t0 = old.get("large_sec", {}).get(n)
        t1 = new.get("large_sec", {}).get(n)
        w0 = old.get("shuffle_write_ratios", {}).get(n)
        w1 = new.get("shuffle_write_ratios", {}).get(n)
        s0, s1 = _spill(old, n), _spill(new, n)
        if r0 and r1:
            move = r1 / r0 if r1 >= r0 else r0 / r1
            # shuffle-write bytes are deterministic per plan, so any
            # movement there is a PLAN change, not host noise — flag
            # it at the same factor as wall-ratio movement
            wmove = (
                max(w1 / w0, w0 / w1) if w0 and w1 else 1.0
            )
            mark = (
                " **FLAG**"
                if move > args.flag_factor or wmove > args.flag_factor
                else ""
            )
            if mark:
                flagged.append(n)
            print(f"| {n} | {r0} | {r1} | {move:.2f}{mark} | "
                  f"{t0} | {t1} | {w0} | {w1} | {s0} | {s1} |")
        else:
            print(f"| {n} | {r0} | {r1} | only-one-round | {t0} | {t1} | "
                  f"{w0} | {w1} | {s0} | {s1} |")
    print()
    print(f"flagged (> {args.flag_factor}x ratio movement, wall or "
          f"shuffle-write): {flagged or 'none'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
