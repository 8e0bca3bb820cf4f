"""Testdata table loaders.

All schemas are declared/known (FIXTURES.md) — never inferred on the
hot path, mirroring the reference's fixed StructType discipline
(/root/reference/consumer/consumer.py:79-84).

`events.ts` is parquet TIMESTAMP(NANOS): Spark reads it as long ns
(via spark.sql.legacy.parquet.nanosAsLong) and we truncate to µs,
yielding TIMESTAMP_NTZ — the same truncation DuckDB applies, so
oracle comparisons see identical values.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events(event_id, ts: timestamp_ntz, user_id, event_type, value, props).

    Interaction-event stream — the reference's
    {user_id, item_id, interaction_type, timestamp} under testdata names
    (item key lives in props JSON as $.k).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ns → µs truncation; integer `div` (a double division would lose
    # precision above 2^53 ns). timestamp_micros gives an instant; the
    # NTZ cast is exact because the session timezone is pinned to UTC.
    return df.withColumn(
        "ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view for spark.sql queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
