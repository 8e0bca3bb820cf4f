"""SparkSession factory and runtime tuning.

The reference pins a tiny fixed footprint (local[*], 4 shuffle
partitions, 2-core executor — /root/reference/consumer/consumer.py:32-44).
We keep its intent (explicit parallelism, bounded state) but default to
a scale-ready posture: AQE with runtime partition coalescing and skew
join handling, UTC session timezone, Arrow-accelerated pandas
interchange.  On a real cluster the same code runs unchanged — only
`master` and the partition count change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe to apply to an existing session at runtime
# (SQLConf, not static). Applied by `tune` to driver-provided sessions.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet carries TIMESTAMP(NANOS) which Spark refuses by
    # default; read as long ns and convert explicitly (tables.load_events).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime re-planning: coalesce post-shuffle partitions, split skewed
    # ones — the main lever that keeps one plan valid from sf0.001 to 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamp rendering (testdata is naive/NTZ anyway).
    "spark.sql.session.timeZone": "UTC",
    # Arrow for any pandas interchange / pandas UDFs.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # S6 (reference consumer/consumer.py:96): commit Kafka source offsets
    # back to the group on stop — a Kafka-connector-facing conf, inert
    # without a broker but part of the reference's contract.
    "spark.sql.streaming.kafka.commitOffsetsOnStop": "true",
    # S9 (reference consumer/consumer.py:39-43): checkpoint/state
    # retention as CONFIG, which is what makes the reference's
    # cleanup_checkpoints.py scripts unnecessary in this engine.
    "spark.sql.streaming.minBatchesToRetain": "20",
    "spark.sql.streaming.maxBatchesToRetain": "100",
    "spark.sql.streaming.stateStore.compression.codec": "lz4",
}


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return int(cpus)
    return os.cpu_count() or 8


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing (possibly driver-owned) session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — builder path sets it instead
    return spark


def get_spark(
    app_name: str = "realtime_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession."""
    n = shuffle_partitions or default_parallelism()
    master = master or f"local[{default_parallelism()}]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Pin the heap floor to the ceiling — the standard posture for
        # long-running Spark executors: Java 17's G1 otherwise
        # uncommits idle heap back to the OS between query bursts and
        # re-faults (kernel-zeroes) it on the next allocation spike,
        # adding recurring sys-time to whatever query runs next.  (Not
        # a cure-all: this box also shows minutes-long HOST-side
        # memory-reclaim storms — sys >> user with steal blips — that
        # hit pinned heaps too; scripts/scale_probe.py detects and
        # retries those.)
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '8g')}",
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    for k, v in (extra_confs or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return tune(spark)
