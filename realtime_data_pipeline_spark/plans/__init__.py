from realtime_data_pipeline_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    queries,
    oracle_sql,
)
from realtime_data_pipeline_spark.plans import relational  # noqa: F401  (registers)
from realtime_data_pipeline_spark.plans import streaming_queries  # noqa: F401
from realtime_data_pipeline_spark.plans import northstar  # noqa: F401
from realtime_data_pipeline_spark.plans import tpch_shapes  # noqa: F401
from realtime_data_pipeline_spark.plans import extras  # noqa: F401
