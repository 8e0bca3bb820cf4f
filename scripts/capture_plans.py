"""Capture .explain("formatted") for bench queries into plans/r15/.

Usage:
    python scripts/capture_plans.py before [--only a,b] [--all]
    python scripts/capture_plans.py after  [--only a,b]

Writes plans/r15/<query>_<tag>.txt.  Bench queries by default (the
round-15 optimization surface); --all covers the whole registry.

NOTE: queries with eager construction (pagerank's supersteps,
connected-components loops, persisted index builds) execute real jobs
during plan construction — this script is not free for those.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(REPO, "plans", "r15")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", choices=["before", "after"])
    ap.add_argument("--only", default=None)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    from realtime_data_pipeline_spark.plans.registry import REGISTRY
    from realtime_data_pipeline_spark.session import (
        default_parallelism,
        get_spark,
    )

    n = default_parallelism()
    spark = get_spark(
        app_name="rdp-capture-plans",
        master=f"local[{n}]",
        shuffle_partitions=n,
    )
    os.makedirs(OUT_DIR, exist_ok=True)

    if args.only:
        names = args.only.split(",")
    elif args.all:
        names = list(REGISTRY)
    else:
        names = [s.name for s in REGISTRY.values() if s.bench]

    for name in names:
        spec = REGISTRY[name]
        df = spec.fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        txt = buf.getvalue()
        n_ex = txt.count("Exchange")
        print(
            f"{name:40s} exchanges={n_ex:2d} "
            f"joins={sum(txt.count(j) for j in ('SortMergeJoin', 'BroadcastHashJoin', 'ShuffledHashJoin')):2d} "
            f"-> {path}"
        )
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
