from realtime_data_pipeline_spark.operators.windows import (  # noqa: F401
    sliding_window_counts,
    tumbling_window_counts,
    item_key,
)
