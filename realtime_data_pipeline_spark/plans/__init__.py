from realtime_data_pipeline_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    queries,
    oracle_sql,
)
