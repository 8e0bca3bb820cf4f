"""Synthetic interaction-event source (S1-S3).

The reference's producer (producer/producer.py:17-23) generates
{user_id: "user_N", item_id: "item_M", interaction_type, timestamp}
at a target rate with client-side batching and pacing
(producer/producer.py:55-92).  In Spark the generator IS the source:
the rate / rate-micro-batch sources give paced row production with
backpressure for free, and the event shape is a pure column
expression — no Python loop, no driver bottleneck, scales linearly
with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# producer/producer.py:15 (same 5-valued categorical shape)
INTERACTION_TYPES = ("click", "view", "purchase", "like", "add_to_cart")


def _event_columns(user_range: int, item_range: int) -> list[Column]:
    """S1: uniform-random keys + uniform choice of interaction type.

    rand() is seeded per-task; `element_at` is 1-based.  All JVM-side
    expressions — whole-stage codegen keeps this in one fused loop.
    """
    types = F.array(*[F.lit(t) for t in INTERACTION_TYPES])
    return [
        F.concat(
            F.lit("user_"), (F.floor(F.rand() * user_range) + 1).cast("string")
        ).alias("user_id"),
        F.concat(
            F.lit("item_"), (F.floor(F.rand() * item_range) + 1).cast("string")
        ).alias("item_id"),
        F.element_at(
            types, (F.floor(F.rand() * len(INTERACTION_TYPES)) + 1).cast("int")
        ).alias("interaction_type"),
        F.col("timestamp"),
    ]


def synthetic_events_stream(
    spark: SparkSession,
    rows_per_second: int = 1000,
    user_range: int = 100_000,
    item_range: int = 10_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """S1+S2: paced streaming generator.

    rows_per_second mirrors the producer's --rate default of 1000/s
    (producer/producer.py:100); the rate source handles pacing and
    retries, superseding the reference's hand-rolled sleep loop and
    backoff (producer/producer.py:25-53,82-85).
    """
    reader = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
    )
    if num_partitions:
        reader = reader.option("numPartitions", str(num_partitions))
    return reader.load().select(_event_columns(user_range, item_range))


BASE_TS = "2024-01-01 00:00:00"


def _h32_col(seed: str) -> Column:
    """First 8 md5 hex digits of "<id>:<seed>" as a non-negative long —
    JVM-side twin of pydatasource._h32, reproducible in DuckDB as
    ('0x' || substr(md5(CAST(i AS VARCHAR) || ':<seed>'), 1, 8))::BIGINT."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{seed}"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def _deterministic_event_columns(
    user_range: int, item_range: int
) -> list[Column]:
    """Every field an md5-derived pure function of the row id (the
    pyds_synthetic_sample trick, VERDICT r6 #5): same wire shape and
    domains as the rand() path, but hash-checkable against a SQL
    oracle recomputing the generator — still all JVM-side expressions
    in one codegen stage, no Python."""
    types = F.array(*[F.lit(t) for t in INTERACTION_TYPES])
    return [
        F.concat(
            F.lit("user_"),
            (_h32_col("u") % user_range + 1).cast("string"),
        ).alias("user_id"),
        F.concat(
            F.lit("item_"),
            (_h32_col("i") % item_range + 1).cast("string"),
        ).alias("item_id"),
        F.element_at(
            types,
            (_h32_col("t") % len(INTERACTION_TYPES) + 1).cast("int"),
        ).alias("interaction_type"),
        F.expr(
            f"timestampadd(SECOND, id, TIMESTAMP_NTZ '{BASE_TS}')"
        ).alias("timestamp"),
    ]


def synthetic_events_batch(
    spark: SparkSession,
    n: int,
    user_range: int = 100_000,
    item_range: int = 10_000,
    num_partitions: int | None = None,
    deterministic: bool = False,
) -> DataFrame:
    """Batch variant: spark.range(n) + the same event expressions.

    deterministic=True swaps rand() for md5-of-id fields (identical
    shape/domains, pure function of the row id) so the batch generator
    itself can carry a value-level oracle."""
    rng = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    if deterministic:
        return rng.select(_deterministic_event_columns(user_range, item_range))
    return rng.select(
        F.current_timestamp().alias("timestamp")
    ).select(_event_columns(user_range, item_range))


def to_kafka_payload(events: DataFrame) -> DataFrame:
    """S3: JSON-serialize the event struct into a Kafka `value` column
    (producer/producer.py:29-31 → F.to_json).  Timestamps render as
    ISO-8601 with MICROSECONDS — the reference wire format is
    `datetime.utcnow().isoformat()` (producer/producer.py:22), and the
    default millisecond format would silently truncate on the wire."""
    return events.select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(
            F.struct("user_id", "item_id", "interaction_type", "timestamp"),
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
        ).alias("value"),
    )


def write_to_kafka(payload: DataFrame, brokers: str, topic: str, **options):
    """S3 egress: batch or streaming Kafka sink (requires the Kafka
    connector package on the classpath)."""
    writer = payload.write.format("kafka")
    for k, v in options.items():
        writer = writer.option(k, v)
    return (
        writer.option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    )
