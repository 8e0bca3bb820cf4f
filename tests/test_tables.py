"""Table-loader robustness (tables.load_events).

The round-3 testdata regeneration silently switched `events.ts` from
parquet TIMESTAMP(NANOS) (read as long ns under nanosAsLong) to
TIMESTAMP(MICROS) (read as a native timestamp), and the loader's
unconditional `ts div 1000` erred out every driver check that round.
These tests pin the contract: EITHER physical encoding must load to
the same TIMESTAMP_NTZ microsecond values.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from realtime_data_pipeline_spark.tables import load_events

# one exact microsecond instant + one with sub-microsecond nanos that
# must truncate identically in both readers
_US = [1704067200_000_000, 1704067200_123_456]
_NS = [u * 1000 for u in _US[:1]] + [_US[1] * 1000 + 789]


def _write(dirpath, ts_array):
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}']),
        }
    )
    pq.write_table(table, f"{dirpath}/events.parquet")
    return str(dirpath)


@pytest.fixture(scope="module")
def encodings(spark, tmp_path_factory):
    d_us = tmp_path_factory.mktemp("ev_us")
    d_ns = tmp_path_factory.mktemp("ev_ns")
    _write(d_us, pa.array(_US, pa.timestamp("us")))
    _write(d_ns, pa.array(_NS, pa.timestamp("ns")))
    return str(d_us), str(d_ns)


def test_both_encodings_yield_timestamp_ntz(spark, encodings):
    for d in encodings:
        df = load_events(spark, d)
        assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType), d


def test_both_encodings_yield_identical_values(spark, encodings):
    d_us, d_ns = encodings
    got_us = sorted((r.event_id, r.ts) for r in load_events(spark, d_us).collect())
    got_ns = sorted((r.event_id, r.ts) for r in load_events(spark, d_ns).collect())
    assert got_us == got_ns
    # and the values are the expected instants (µs precision, ns
    # truncated not rounded)
    assert [t.microsecond for _, t in got_us] == [0, 123456]


def test_other_columns_untouched(spark, encodings):
    df = load_events(spark, encodings[1])
    row = sorted(df.collect(), key=lambda r: r.event_id)[0]
    assert (row.user_id, row.event_type, row.value, row.props) == (
        10,
        "click",
        1.5,
        '{"k": 1}',
    )
