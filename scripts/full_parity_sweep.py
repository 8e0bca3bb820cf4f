"""Driver-strength parity sweep over the ENTIRE registry (not just the
50-slot driver window) at the driver's own scale factor (sf0.01) —
the pre-rotation gate that makes promoting any query into the driver
window a no-risk move.

Usage:
    python scripts/full_parity_sweep.py [--tz Asia/Kathmandu] \
        [--shuffle-partitions 3] [--sf-dir DIR] [--only a,b]

Compares every oracle-carrying registry query byte-exact against its
DuckDB oracle with the same normalizer (and same sf0.01 scale) as
tests/test_oracle_parity.py; what this adds over the regular suite is
the hostile-configuration axes — session timezone and shuffle
partition count — plus a one-command pre-rotation gate (~3.5 min for
the full registry).  Queries without an oracle (rows-only by design)
are executed and row-counted only.

Exit code 0 iff every query is green.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))




def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tz", default=None, help="session timezone override")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated names")
    ap.add_argument(
        "--shuffle-partitions",
        default="8",
        help="hostile values (3, 32) prove no result depends on "
        "partition count — the engine contract is order-independent "
        "arithmetic everywhere (fixed-point sums, in-order folds)",
    )
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="extra SparkSession confs for hostile-axis probes that a "
        "real driver could set (tune() does not own them), e.g. "
        "spark.sql.codegen.wholeStage=false forces interpreted "
        "expression evaluation registry-wide",
    )
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from test_oracle_parity import assert_frames_match  # tests/ on sys.path

    from realtime_data_pipeline_spark.tables import TABLE_NAMES

    builder = (
        SparkSession.builder.master("local[8]")
        .appName("full-parity-sweep")
        .config("spark.sql.shuffle.partitions", args.shuffle_partitions)
    )
    if args.tz:
        builder = builder.config("spark.sql.session.timeZone", args.tz)
    for kv in args.conf:
        k, _, v = kv.partition("=")
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from realtime_data_pipeline_spark.plans.registry import REGISTRY
    import realtime_data_pipeline_spark.plans  # noqa: F401  (registers)

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    names = (
        args.only.split(",") if args.only else list(REGISTRY)
    )
    bad: list[str] = []
    t_start = time.time()
    for i, name in enumerate(names, 1):
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf_dir).toPandas()
            if spec.oracle is None:
                status = f"rows-only ({len(sdf)} rows)"
            else:
                try:
                    assert_frames_match(
                        name, sdf, con.execute(spec.oracle).df()
                    )
                    status = "OK"
                except AssertionError as err:
                    status = "MISMATCH"
                    print("   ", str(err)[:200])
                    bad.append(name)
        except Exception as ex:  # noqa: BLE001 — report and continue
            status = f"ERROR {str(ex)[:160]}"
            bad.append(name)
        finally:
            spark.catalog.clearCache()
        print(
            f"[{i:3}/{len(names)}] {name:45s} {status:10s}"
            f" {time.time() - t0:6.1f}s",
            flush=True,
        )
    tz = args.tz or "engine-default"
    tz += f", shuffle={args.shuffle_partitions}"
    if args.conf:
        tz += ", " + ", ".join(args.conf)
    print(
        f"sweep done: {len(names) - len(bad)}/{len(names)} green "
        f"(tz={tz}, {args.sf_dir}, {time.time() - t_start:.0f}s); "
        f"bad={bad}"
    )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
