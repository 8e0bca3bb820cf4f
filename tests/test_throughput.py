"""Streaming throughput evidence against BASELINE.md: the reference's
default operating point is 1,000 events/s end-to-end (producer rate
default, producer/producer.py:100).  The full pipeline — file-replay
source → watermark → sliding-window agg → keyed-upsert sink — must
sustain well above that on the reference's resource envelope.
"""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from realtime_data_pipeline_spark.streaming.pipeline import (
    EVENT_SCHEMA,
    file_replay_stream,
    windowed_stream_counts,
)
from realtime_data_pipeline_spark.streaming.sinks import UpsertTable, start_upsert_query
from realtime_data_pipeline_spark.tables import load_events

SENTINEL = "__sentinel__"

# sf0.1 (100k events): micro-batch fixed costs (checkpoint writes, sink
# merges) amortize; at sf0.001 they dominate and the rate measures
# overhead, not throughput.
THROUGHPUT_SF_DIR = "/root/testdata/sf0.1"


def _run_pipeline(spark, events, workdir, name):
    """events → file replay → watermark → sliding-window agg → keyed
    upsert; returns elapsed seconds for the streaming query."""
    replay = str(workdir / "replay")
    events.coalesce(1).write.mode("overwrite").parquet(replay)
    max_ts = events.agg(F.max("timestamp")).collect()[0][0]
    spark.createDataFrame(
        [(SENTINEL, SENTINEL, "flush", max_ts + dt.timedelta(days=2))],
        schema=EVENT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(replay)

    stream = file_replay_stream(spark, replay, EVENT_SCHEMA, max_files_per_trigger=1)
    agg = windowed_stream_counts(stream, "user_id")
    table = UpsertTable(
        spark, str(workdir / "table"), ["window_start", "window_end", "user_id"]
    )
    t0 = time.perf_counter()
    q = start_upsert_query(
        agg, table, str(workdir / "ckpt"), name, trigger_available_now=True
    )
    q.awaitTermination(300)
    return table, time.perf_counter() - t0


def test_streaming_throughput_beats_baseline(spark, tmp_path):
    # The ONLY load-sensitive assertion in the suite (r12 verdict #2):
    # under a concurrent parity sweep this box measured 7.1k events/s
    # against the 8k floor, alone it measures ~19k.  Reuse bench.py's
    # loadavg gate (wait-or-annotate): wait for a quiet host, and if
    # the budget expires while still loaded, skip with the measured
    # loadavg rather than fail on a number that measured the host.
    import pytest

    from bench import _await_idle_host

    gate = _await_idle_host()
    if not gate["passed"]:
        pytest.skip(
            "host busy: 1-min loadavg "
            f"{gate['final_1min']} > {gate['threshold']} after "
            f"{gate['waited_sec']}s wait — throughput floor would "
            "measure the host, not the engine"
        )

    events = load_events(spark, THROUGHPUT_SF_DIR).select(
        F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias("user_id"),
        F.get_json_object("props", "$.k").alias("item_id"),
        F.col("event_type").alias("interaction_type"),
        F.col("ts").cast("timestamp").alias("timestamp"),
    ).where(F.col("user_id").isNotNull() & F.col("timestamp").isNotNull())
    n_events = events.count()

    # Steady-state measurement: one small untimed replay first so JIT /
    # codegen / state-store code paths are warm — the baseline number
    # this compares against (1,000 events/s producer rate) is itself a
    # steady-state operating point, not a cold start.
    warm = tmp_path / "warm"
    warm.mkdir()
    _run_pipeline(spark, events.limit(2000), warm, "throughput_warmup")

    timed = tmp_path / "timed"
    timed.mkdir()
    table, elapsed = _run_pipeline(spark, events, timed, "throughput")

    rate = n_events / elapsed
    print(f"\nstreaming throughput: {n_events} events in {elapsed:.2f}s "
          f"= {rate:.0f} events/s (baseline target: 1000/s)")
    assert table.read().count() > 0
    # Measured steady state: ~14k events/s (round 4), ~19k (round 6);
    # 8,000 keeps 2x+ headroom for CI noise while making a 2x streaming
    # regression fail loudly (floor history: 2k -> 6k -> 8k; still 8x
    # the reference's 1,000/s producer operating point).
    assert rate >= 8000, f"{rate:.0f} events/s below the 8k floor"
