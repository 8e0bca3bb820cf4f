"""Bucketed-table join co-location — the shuffle-elimination lever for
repeated joins on a stable key.

The reference never joins at all (its consumer aggregates a single
stream: /root/reference/consumer/consumer.py:113-139), but a warehouse
built on this engine joins fact tables on the same keys query after
query.  At 100 TB the dominant cost of orders ⋈ lineitem is the
exchange of BOTH fact tables; paying it once at write time and never
again is the point of Spark's native bucketing:

  * `bucketBy(n, key)` + `sortBy(key)` + `saveAsTable` records the
    bucketing in the catalog.  Every file belongs to one Murmur3 hash
    bucket of the key;
  * a join of two tables bucketed on the join key with the SAME bucket
    count satisfies both sides' HashClusteredDistribution from the
    scan itself — the planner drops the Exchange on both sides
    (asserted by tests/test_bucketing.py on the physical plan);
  * `sortBy` additionally satisfies SortMergeJoin's ordering
    requirement per file, so the per-bucket sort is a file-merge, not
    a full sort;
  * aggregations on the bucket key likewise skip their exchange.

Cost model: one extra shuffle at WRITE time (the repartition into
buckets), amortized over every subsequent join/agg on that key.  Break
even after roughly one read for join-heavy keys like orderkey/doc_id.

This module complements `operators/writer.py`: the corpus writer's
`shard` directories give file-count control and bucket-addressable
MAINTENANCE (the reader still shuffles to join); catalog bucketing
gives exchange-free JOINS but fixes the layout in the metastore.  Use
the writer for curation output, bucketing for warehouse fact tables.

spark.sql.sources.bucketing.enabled is on by default; bucketed scans
additionally need spark.sql.sources.v2.bucketing or the v1 path (the
default for saveAsTable parquet) — both hold on stock Spark 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort_cols: tuple[str, ...] | None = None,
) -> None:
    """Materialize `df` as a catalog table bucketed (and per-file
    sorted) on `key`.  `n_buckets` must match across the tables that
    will join — mismatched counts reintroduce one side's exchange.

    At 100 TB pick n_buckets so one bucket of the LARGEST co-bucketed
    table fits an executor's shuffle memory (e.g. 4096 buckets for a
    40 TB lineitem ≈ 10 GB/bucket pre-compression).
    """
    sort_cols = sort_cols or (key,)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def n_exchanges(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan (plan-shape
    assertion helper for tests: a co-bucketed join has ZERO)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "reuse" not in line.lower()
    )
