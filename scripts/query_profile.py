"""Per-query profile: construct time vs execute time, job count, and
stage/task counts — the breakdown bench.py's single number hides.

Usage:
    python scripts/query_profile.py [--only a,b] [--runs 3] [--sf-dir D]

For each query: t_construct (plan build, incl. any eager jobs the
construction runs — persists, localCheckpoints, collects), t_execute
(noop sink write), and the number of Spark jobs each phase submitted.
A query whose construct phase submits many jobs is paying per-job
driver latency that one fused plan would not.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from realtime_data_pipeline_spark.plans.registry import REGISTRY
    from realtime_data_pipeline_spark.session import (
        default_parallelism,
        get_spark,
    )

    n = default_parallelism()
    spark = get_spark(
        app_name="rdp-query-profile",
        master=f"local[{n}]",
        shuffle_partitions=n,
    )

    names = (
        args.only.split(",")
        if args.only
        else [s.name for s in REGISTRY.values() if s.bench]
    )

    # Warm-up at sf0.001 mirrors bench.py.
    for name in names:
        REGISTRY[name].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        spark.catalog.clearCache()

    print(
        f"{'query':40s} {'t_con':>7s} {'t_exec':>7s} {'t_total':>8s} "
        f"{'jobs_con':>8s} {'jobs_exec':>9s}"
    )
    for name in names:
        best = None
        for _ in range(args.runs):
            # job ids are global+monotone; count via all job ids
            ids0 = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
            n0 = len(list(ids0))
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            ids1 = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
            n1 = len(list(ids1))
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            ids2 = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
            n2 = len(list(ids2))
            spark.catalog.clearCache()
            rec = (t1 - t0, t2 - t1, t2 - t0, n1 - n0, n2 - n1)
            if best is None or rec[2] < best[2]:
                best = rec
        tc, te, tt, jc, je = best
        print(
            f"{name:40s} {tc:7.3f} {te:7.3f} {tt:8.3f} {jc:8d} {je:9d}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
