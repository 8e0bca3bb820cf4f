from realtime_data_pipeline_spark.sources.synthetic import (  # noqa: F401
    INTERACTION_TYPES,
    synthetic_events_batch,
    synthetic_events_stream,
    to_kafka_payload,
)
