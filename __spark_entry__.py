"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query (A1 sliding-window user counts) at
sf0.001.  `queries()` / `oracle_sql()` — the full registry from
`realtime_data_pipeline_spark.plans.registry`, one entry per operator
in SURVEY.md §2 plus north-star extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from realtime_data_pipeline_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: A1 sliding 10m/5m window counts per user at sf0.001."""
    return _registry.user_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
