"""Kafka path contract tests — no broker in this container, so these
pin everything short of the socket: the producer wire format
(to_kafka_payload) must round-trip bit-exactly through the consumer
parse path (parse_events) over a simulated Kafka record envelope, and
the source option plumbing must match the reference's configuration
(consumer/consumer.py:88-94).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_data_pipeline_spark.sources.synthetic import (
    synthetic_events_batch,
    to_kafka_payload,
)
from realtime_data_pipeline_spark.streaming.pipeline import (
    kafka_source_options,
    parse_events,
)


def _as_kafka_records(payload):
    """What the Kafka source emits (key/value BINARY plus metadata) —
    the broker's contribution minus the broker."""
    return payload.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit("interactions").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def test_wire_roundtrip_producer_to_consumer(spark):
    """S3 → (wire) → P1-P4: every event must survive serialize → binary
    envelope → parse with the declared schema, including MICROSECOND
    timestamp precision (the reference wire format carries µs —
    producer/producer.py:22)."""
    events = synthetic_events_batch(spark, 500, user_range=50, item_range=20)
    # pin sub-millisecond precision explicitly: synthetic timestamps
    # may land on whole milliseconds, which would mask µs truncation
    events = events.withColumn(
        "timestamp",
        F.col("timestamp") + F.make_interval(secs=F.lit(0.000123)),
    ).persist()

    parsed = parse_events(_as_kafka_records(to_kafka_payload(events)))

    orig = sorted(map(tuple, events.collect()))
    back = sorted(
        map(
            tuple,
            parsed.select(
                "user_id", "item_id", "interaction_type", "timestamp"
            ).collect(),
        )
    )
    assert len(back) == 500
    assert back == orig  # bit-exact, µs included
    events.unpersist()


def test_malformed_and_null_wire_records_are_dropped(spark):
    """P4: the consumer's null filter must absorb garbage JSON, partial
    events, and null values without erroring (consumer/consumer.py:111
    drops them; malformed JSON yields nulls per SURVEY §1.3)."""
    rows = [
        ('{"user_id":"user_1","item_id":"item_2","interaction_type":"click",'
         '"timestamp":"2026-01-01T00:00:00.000001"}',),
        ("not json at all",),
        ('{"user_id":"user_9"}',),  # missing item/timestamp
        (None,),
    ]
    raw = spark.createDataFrame(rows, "value string").select(
        F.col("value").cast("binary").alias("value")
    )
    out = parse_events(raw).collect()
    assert len(out) == 1
    assert out[0].user_id == "user_1" and out[0].item_id == "item_2"


def test_kafka_source_option_contract():
    """S5: exactly the reference's source options, all stringified
    (DataStreamReader options are strings on the wire)."""
    opts = kafka_source_options("b1:9092,b2:9092", "interactions")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "interactions",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "10000",
        "failOnDataLoss": "false",
    }
    assert all(isinstance(v, str) for v in opts.values())
    # admission control survives overrides
    assert kafka_source_options("b", "t", "earliest", 500)[
        "maxOffsetsPerTrigger"
    ] == "500"
