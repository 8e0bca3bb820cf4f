"""Testdata table loaders.

All schemas are declared/known (FIXTURES.md) — never inferred on the
hot path, mirroring the reference's fixed StructType discipline
(/root/reference/consumer/consumer.py:79-84).

`events.ts` has shipped in two physical encodings across testdata
generations: parquet TIMESTAMP(NANOS) (Spark reads it as long ns via
spark.sql.legacy.parquet.nanosAsLong; we truncate to µs) and parquet
TIMESTAMP(MICROS) (Spark reads TIMESTAMP/TIMESTAMP_NTZ directly).
`load_events` branches on the RESOLVED dtype so either generation
normalizes to the same TIMESTAMP_NTZ column — the truncation matches
what DuckDB applies, so oracle comparisons see identical values.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Only widen scans of files at least this large — repartitioning tiny
# dimension tables costs more than the parallelism is worth (and they
# should broadcast anyway).
_MIN_WIDEN_BYTES = 4 << 20
# The floor for CPU-widening (widen="cpu", r14): queries whose map
# side runs heavyweight per-row expressions (BPE regex counts,
# tokenize+array_distinct) are compute-bound long before the byte
# floor above — measured at sf0.1 documents (584 KB, ONE row group):
# text_metrics 0.75 s serial vs 0.52 s widened.  A floor still
# exists so genuinely tiny inputs (sf0.001/sf0.01 fixtures — both
# ~65 KB of parquet framing overhead, not data) keep their
# exchange-free plans — also what keeps the sf0.001 shuffle-count
# pins in tests/test_plan_regression.py reflecting the query's own
# shape.  The widened plan is parity-checked byte-exact at sf0.1
# (full_parity_sweep --sf-dir, r14).
_MIN_CPU_WIDEN_BYTES = 128 << 10


def _widen_scan(
    spark: SparkSession, df: DataFrame, path: str, floor: int = _MIN_WIDEN_BYTES
) -> DataFrame:
    """Parallelize a scan that parquet row-group layout has serialized.

    The testdata files are single-row-group, so Spark gives the whole
    scan ONE task and every downstream map-side stage (partial
    aggregation, expression evaluation) runs serially no matter how
    many cores exist.  A round-robin repartition to the default
    parallelism fixes that for a small shuffle of the pruned columns.

    Scale behavior: at real data sizes a scan yields many splits
    (multiple files / row groups), the condition is false, and this is
    a NO-OP — predicate pushdown and column pruning still reach the
    scan either way (Catalyst pushes both through Repartition).
    """
    n = spark.sparkContext.defaultParallelism
    try:
        small = os.path.getsize(path) < floor
    except OSError:
        small = False
    if small or df.rdd.getNumPartitions() >= max(2, n // 4):
        return df
    return df.repartition(n)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events(event_id, ts: timestamp_ntz, user_id, event_type, value, props).

    Interaction-event stream — the reference's
    {user_id, item_id, interaction_type, timestamp} under testdata names
    (item key lives in props JSON as $.k).
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    path = f"{sf_dir}/events.parquet"
    df = spark.read.parquet(path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # TIMESTAMP(NANOS) read as long ns: truncate to µs with integer
        # `div` (a double division would lose precision above 2^53 ns).
        # timestamp_micros gives an instant; the NTZ cast is exact
        # because the session timezone is pinned to UTC.
        return df.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
        )
    # Already a timestamp (µs physical) — normalize the flavor only.
    if not isinstance(ts_type, T.TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, widen: bool | str = False
) -> DataFrame:
    """`widen=True` parallelizes a row-group-serialized scan — opt in
    for queries whose map side is CPU-heavy (many aggregates or
    expressions per row).  `widen="cpu"` is the same lever with the
    lower `_MIN_CPU_WIDEN_BYTES` floor, for per-row expression work
    (tokenization, regex counting) so heavy that even a sub-MB scan
    is worth spreading across cores.  Leave off for broadcast-probe
    plans, where the extra exchange of pruned rows costs more than
    the parallelism returns."""
    if widen not in (True, False, "cpu"):
        # ADVICE r14: a typo'd widen string ("CPU", "io") must not
        # silently fall through to the bool-widen byte floor.
        raise ValueError(
            f"widen must be True, False, or 'cpu'; got {widen!r}"
        )
    if name == "events":
        return load_events(spark, sf_dir)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if not widen:
        return df
    floor = _MIN_CPU_WIDEN_BYTES if widen == "cpu" else _MIN_WIDEN_BYTES
    return _widen_scan(spark, df, path, floor=floor)


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view for spark.sql queries."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
