"""Streaming operators surfaced as registry queries.

`streaming_replay_user_counts` runs the REAL streaming pipeline —
file-replay source → declared schema → watermark → sliding-window agg
→ append-mode keyed-upsert sink (W1-W4) — over the sf events table,
then returns the sink table.  Because batch–stream parity holds (and a
far-future sentinel flushes every real window past the watermark), its
result equals the batch A1 aggregation, so it shares the same DuckDB
oracle: the streaming path itself is hash-checked against SQL.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from pyspark.sql import functions as F

from realtime_data_pipeline_spark.plans.registry import (
    USER_AGG_CTE,
    _events,
    register,
)
from realtime_data_pipeline_spark.streaming.pipeline import (
    EVENT_SCHEMA,
    file_replay_stream,
    windowed_stream_counts,
)
from realtime_data_pipeline_spark.streaming.sinks import UpsertTable, start_upsert_query

SENTINEL = "__sentinel__"
KEYS = ["window_start", "window_end", "user_id"]


@register(
    "streaming_replay_user_counts",
    f"WITH {USER_AGG_CTE} SELECT * FROM user_agg",
    doc="W1-W4 end to end: availableNow replay through watermark + sliding "
    "window + append-mode upsert sink; equals batch A1 by parity",
    tags=("streaming",),
)
def q_streaming_replay_user_counts(spark, sf_dir):
    events = _events(spark, sf_dir).select(
        F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias("user_id"),
        F.get_json_object("props", "$.k").alias("item_id"),
        F.col("event_type").alias("interaction_type"),
        F.col("ts").cast("timestamp").alias("timestamp"),
    ).where(F.col("user_id").isNotNull() & F.col("timestamp").isNotNull())

    base = tempfile.mkdtemp(prefix="rdp_stream_")
    replay = os.path.join(base, "replay")
    # Single file → all real events in one micro-batch, so no intermediate
    # watermark advance can drop out-of-order rows; the sentinel's own
    # batch then flushes every window.  (Test-determinism measure only.)
    events.coalesce(1).write.mode("overwrite").parquet(replay)
    max_ts = events.agg(F.max("timestamp")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(SENTINEL, SENTINEL, "flush", max_ts + dt.timedelta(days=2))],
        schema=EVENT_SCHEMA,
    )
    sentinel.coalesce(1).write.mode("append").parquet(replay)

    # maxFilesPerTrigger=1 → the sentinel lands in its own final batch,
    # advancing the watermark so every real window is finalized/emitted.
    stream = file_replay_stream(spark, replay, EVENT_SCHEMA, max_files_per_trigger=1)
    agg = windowed_stream_counts(stream, "user_id")
    table = UpsertTable(spark, os.path.join(base, "table"), KEYS)
    q = start_upsert_query(
        agg,
        table,
        os.path.join(base, "ckpt"),
        "replay_user_counts",
        trigger_available_now=True,
    )
    while q.isActive:
        q.awaitTermination(5)
    return table.read().where(F.col("user_id") != SENTINEL)
