from realtime_data_pipeline_spark.functions import (  # noqa: F401
    dedup,
    multimodal,
    similarity,
    text,
)
