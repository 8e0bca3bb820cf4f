"""Spark 4 custom Python DataSource: the reference's event producer
(producer/producer.py — a loop emitting synthetic events to Kafka)
re-expressed as a first-class `spark.read.format(...)` source.

Unlike sources/synthetic.py (rand()-based, checked by domain-invariant
oracles), every field here is an md5-derived pure function of the
event id, so the WHOLE custom-datasource path — Python reader workers
→ Arrow batches → the JVM plan — is byte-comparable to a SQL oracle
computing the same md5 arithmetic.  What the hash check proves is the
data source contract itself: partition planning, per-partition reads,
type mapping (including timestamps), and completeness (no partition
dropped or double-read).

Parallelism: the reader splits [0, numRows) into `numPartitions`
contiguous ranges — each partition is an independent task, the same
scale shape as any range-partitioned scan.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
BASE_TS = dt.datetime(2024, 1, 1)
N_USERS = 1000


def _h32(s: str) -> int:
    """First 8 md5 hex digits as an int — the D_HASH32 idiom, so DuckDB
    can reproduce it as ('0x' || substr(md5(s), 1, 8))::BIGINT."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def synth_row(i: int):
    return (
        i,
        BASE_TS + dt.timedelta(seconds=i),
        _h32(f"{i}:u") % N_USERS,
        EVENT_TYPES[_h32(f"{i}:t") % len(EVENT_TYPES)],
        (_h32(f"{i}:v") % 10_000) / 100.0,
    )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double"
        )

    def reader(self, schema):
        return _Reader(
            int(self.options.get("numRows", 1000)),
            int(self.options.get("numPartitions", 8)),
        )

    def simpleStreamReader(self, schema):
        return _StreamReader(
            int(self.options.get("numRows", 1000)),
            int(self.options.get("rowsPerBatch", 100)),
        )


class _Reader(DataSourceReader):
    def __init__(self, num_rows: int, num_partitions: int):
        self.num_rows = num_rows
        self.num_partitions = max(1, min(num_partitions, num_rows or 1))

    def partitions(self):
        step = -(-self.num_rows // self.num_partitions)  # ceil div
        return [
            InputPartition((lo, min(lo + step, self.num_rows)))
            for lo in range(0, self.num_rows, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield synth_row(i)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


class _StreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same generator: each micro-batch advances
    the offset by `rowsPerBatch` ids, capped at `numRows` — the
    reference producer's rate-limited emit loop (producer/producer.py)
    as a Spark 4 streaming data source.  Offsets are plain dicts (the
    engine JSON-serializes them into the checkpoint), so restart
    resumes exactly where the last committed batch ended; replayed
    ranges regenerate identical rows because the generator is a pure
    function of the id."""

    def __init__(self, num_rows: int, rows_per_batch: int):
        self.num_rows = num_rows
        self.rows_per_batch = rows_per_batch

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.rows_per_batch, self.num_rows)
        return iter([synth_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start, end):
        return iter(
            [synth_row(i) for i in range(start["next"], end["next"])]
        )

    def commit(self, end):
        pass  # nothing to acknowledge — the generator is stateless
