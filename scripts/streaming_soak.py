"""Streaming-volume soak (VERDICT r12 #5): run the W1-W4 pipeline —
file replay → watermark → sliding-window agg → keyed-upsert sink —
end-to-end at 1x and 10x STREAM LENGTH (same event rate, 10x the
wall-clock span and micro-batch count) and record, per batch, the
state-store row count and the trigger/addBatch wall.

What "scales" means for a stateful stream is different from a batch
query: the cost axis is stream LENGTH, and the thing that must stay
flat is the per-batch footprint — watermark eviction must keep state
rows proportional to the windows in flight (rate x horizon), never to
total events seen.  The artifact records:

  * state_rows_max / _p50 per step — the bound the watermark enforces;
    the 10x/1x max ratio is the headline number (~1.0 = bounded);
  * per-batch wall medians for the first and last quarter of each run
    — flat means no per-batch cost grows with events seen.  addBatch
    (the upsert-sink merge) is recorded separately: the bucketed
    rewrite touches every bucket a batch's keys hash into, so its
    cost tracks TABLE size (a sink-compaction axis, deliberately
    separate from engine state);
  * a batch-parity check: the final upsert table must equal the batch
    engine's windowed counts over the same events (the W1-W4 contract
    at volume, not just at test size).

Each step runs in a FRESH subprocess (the r8 protocol: the
orchestrator never owns a JVM while a worker measures) and the runs
are sequential, never concurrent.

Usage:
    python scripts/streaming_soak.py --out SOAK_r13_streaming10x.json
    python scripts/streaming_soak.py --single 100000 --out step.json
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Stream shape: constant event rate; stream LENGTH is the scale axis.
EVENTS_PER_SLICE = 10_000          # one parquet file = one micro-batch
SLICE_SECS = 1800                  # 30 min of event time per slice
N_USERS = 5000
T0 = dt.datetime(2024, 3, 1, 0, 0, 0)
SENTINEL = "__sentinel__"

# Incremental-dedup stream shape (--query dedup): constant docs per
# micro-batch; the scale axis is again stream length, but the bounded
# resource is different — the SIGNATURE STORE grows O(seen docs) BY
# DESIGN (it must remember everything ever seen), so the probe's
# question is not "is state flat" but "is the per-batch cost curve
# the designed one": store bytes linear in seen docs, store DIRECTORY
# count bounded by compaction, and per-batch wall growing only with
# the store-side scan of the banded equi-join.
DOCS_PER_SLICE = 2500
DOC_TOKENS = 50
DUP_SHARED_TOKENS = 47             # near-dups share a 47-of-50 prefix
DOC_VOCAB = 1_000_000              # open vocab: shingle mass ~ corpus


def _gen_slice(spark, i: int):
    """Deterministic slice i: EVENTS_PER_SLICE events spread uniformly
    over [T0 + i*SLICE, T0 + (i+1)*SLICE), users drawn by hash."""
    from pyspark.sql import functions as F

    start_us = int((T0 + dt.timedelta(seconds=i * SLICE_SECS)).timestamp() * 1e6)
    step_us = SLICE_SECS * 1_000_000 // EVENTS_PER_SLICE
    return spark.range(EVENTS_PER_SLICE).select(
        F.concat(
            F.lit("user_"),
            F.pmod(F.hash((F.col("id") + i * EVENTS_PER_SLICE).cast("string")),
                   F.lit(N_USERS)).cast("string"),
        ).alias("user_id"),
        F.lit(None).cast("string").alias("item_id"),
        F.lit("click").alias("interaction_type"),
        F.timestamp_micros(
            F.lit(start_us) + F.col("id") * F.lit(step_us)
        ).alias("timestamp"),
    )


def _gen_doc_slice(spark, i: int):
    """Deterministic doc slice i: DOCS_PER_SLICE docs; in slices > 0,
    every 10th doc is a near-dup (47-of-50 shared tokens) of a
    hash-chosen EARLIER doc — cross-batch dups that only the
    persistent store can catch."""
    from pyspark.sql import functions as F

    start = i * DOCS_PER_SLICE
    df = spark.range(start, start + DOCS_PER_SLICE).select(
        F.col("id").alias("doc_id")
    )
    is_dup = (F.col("doc_id") % 10 == 3) & (F.col("doc_id") >= DOCS_PER_SLICE)
    raw_base = F.pmod(F.xxhash64("doc_id"), F.lit(start))
    # the base must be a NON-dup earlier doc: a dup's stored text is
    # its base's tokens, so copying a dup's token FORMULA would plant
    # a doc that near-matches nothing (the first smoke run measured
    # exactly this as phantom "surviving dups")
    base = F.when(
        is_dup,
        F.when(raw_base % 10 == 3, raw_base + 1).otherwise(raw_base),
    ).otherwise(F.col("doc_id"))
    return (
        df.withColumn("base", base)
        .withColumn("is_dup", is_dup)
        .select(
            "doc_id",
            "is_dup",
            F.expr(
                f"""array_join(transform(sequence(0, {DOC_TOKENS - 1}), j ->
                    concat('t', pmod(xxhash64(
                        (CASE WHEN is_dup AND j < {DUP_SHARED_TOKENS}
                              THEN base ELSE doc_id END) * 53 + j),
                        {DOC_VOCAB}))), ' ')"""
            ).alias("text"),
        )
    )


def _dir_stats(path: str) -> tuple[int, int]:
    """(total bytes, top-level entry count) of a store directory."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    try:
        n_dirs = len(os.listdir(path))
    except FileNotFoundError:
        n_dirs = 0
    return total, n_dirs


def run_dedup_step(docs: int, out_json: str) -> None:
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from realtime_data_pipeline_spark.session import get_spark
    from realtime_data_pipeline_spark.streaming import incremental_dedup as inc

    n_slices = docs // DOCS_PER_SLICE
    spark = get_spark(
        app_name="rdp-streaming-soak-dedup", master="local[8]",
        shuffle_partitions=8,
    )
    base = tempfile.mkdtemp(prefix="rdp_streaming_soak_")
    replay = os.path.join(base, "replay")
    store = os.path.join(base, "store")
    out = os.path.join(base, "out")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("is_dup", BooleanType()),
            StructField("text", StringType()),
        ]
    )
    try:
        for i in range(n_slices):
            _gen_doc_slice(spark, i).coalesce(1).write.mode(
                "append"
            ).parquet(replay)
        planted_dups = (
            spark.read.parquet(replay).where("is_dup").count()
        )

        batches: list[dict] = []

        # The public pieces (dedup_batch + compact_store) composed the
        # same way start_incremental_dedup does, with per-batch timing
        # and store sampling in between.
        def _process(batch, batch_id: int) -> None:
            t0 = time.perf_counter()
            accepted = inc.dedup_batch(batch, store, out, batch_id)
            compacted = bool(batch_id > 0 and batch_id % 10 == 0)
            if compacted:
                inc.compact_store(spark, store, keep_last=1)
            wall = time.perf_counter() - t0
            store_bytes, store_dirs = _dir_stats(store)
            batches.append(
                {
                    "batch_id": batch_id,
                    "docs": batch.count(),
                    "accepted": accepted,
                    "wall_sec": round(wall, 3),
                    "compacted": compacted,
                    "store_bytes": store_bytes,
                    "store_dirs": store_dirs,
                }
            )

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(replay)
        )
        t_start = time.perf_counter()
        q = (
            stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        while q.isActive:
            q.awaitTermination(10)
        wall = time.perf_counter() - t_start

        accepted_total = sum(b["accepted"] for b in batches)
        out_df = spark.read.parquet(out)
        out_count = out_df.count()
        # false drops: unique (non-planted-dup) docs that were dropped
        all_docs = spark.read.parquet(replay)
        false_drops = (
            all_docs.where(~F.col("is_dup"))
            .join(out_df.select("doc_id"), "doc_id", "left_anti")
            .count()
        )
        surviving_planted = (
            all_docs.where(F.col("is_dup"))
            .join(out_df.select("doc_id"), "doc_id", "left_semi")
            .count()
        )
        walls = [b["wall_sec"] for b in batches]
        quarter = max(1, len(batches) // 4)
        result = {
            "docs": docs,
            "batches": len(batches),
            "wall_sec": round(wall, 2),
            "planted_dups": planted_dups,
            "accepted_total": accepted_total,
            "out_rows": out_count,
            "false_drops_of_unique": false_drops,
            "planted_dups_surviving": surviving_planted,
            "store_bytes_final": batches[-1]["store_bytes"],
            "store_dirs_max": max(b["store_dirs"] for b in batches),
            "batch_wall_p50_first_quarter": round(
                statistics.median(walls[:quarter]), 3
            ),
            "batch_wall_p50_last_quarter": round(
                statistics.median(walls[-quarter:]), 3
            ),
            "loadavg_1min_at_end": round(os.getloadavg()[0], 2),
            "per_batch": batches,
        }
        with open(out_json, "w") as f:
            json.dump(result, f)
    finally:
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)


# Corpus-append stream shape (--query corpus): constant docs per
# micro-batch into the partitioned+sharded lake layout, with the
# tiered in-place fold (corpus_sink.fold_batches) every FOLD_PERIOD
# batches.  The bounded resource is the FILE COUNT: unfolded it grows
# O(batches x langs x shards); with the fold it is capped by
# (FOLD_PERIOD live batches + max_gens generations) x langs x shards.
# The probe records per-batch file counts, fold cadence/cost, and the
# per-batch sink wall trend — flat means the append cost never grows
# with table size (folds are the only table-sized work, and only the
# every-(FOLD_PERIOD x max_gens)th one touches the whole table).
CORPUS_DOCS_PER_SLICE = 2500
CORPUS_LANGS = 5
CORPUS_SHARDS = 4
FOLD_PERIOD = 10
FOLD_MAX_GENS = 8


def _gen_corpus_slice(spark, i: int):
    from pyspark.sql import functions as F

    start = i * CORPUS_DOCS_PER_SLICE
    return spark.range(start, start + CORPUS_DOCS_PER_SLICE).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("lang_"),
            F.pmod(F.xxhash64("id"), F.lit(CORPUS_LANGS)).cast("string"),
        ).alias("lang"),
        F.expr(
            "array_join(transform(sequence(0, 19), j -> "
            "concat('t', pmod(xxhash64(id * 31 + j), 50000))), ' ')"
        ).alias("text"),
    )


def _count_parquet_files(path: str) -> tuple[int, int]:
    """(parquet file count, top-level batch=* dir count)."""
    n_files = 0
    for root, _dirs, files in os.walk(path):
        n_files += sum(1 for f in files if f.endswith(".parquet"))
    try:
        n_dirs = sum(
            1 for e in os.listdir(path) if e.startswith("batch=")
        )
    except FileNotFoundError:
        n_dirs = 0
    return n_files, n_dirs


def run_corpus_step(docs: int, out_json: str) -> None:
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from realtime_data_pipeline_spark.session import get_spark
    from realtime_data_pipeline_spark.streaming import corpus_sink

    n_slices = docs // CORPUS_DOCS_PER_SLICE
    spark = get_spark(
        app_name="rdp-streaming-soak-corpus", master="local[8]",
        shuffle_partitions=8,
    )
    base = tempfile.mkdtemp(prefix="rdp_streaming_soak_")
    replay = os.path.join(base, "replay")
    out = os.path.join(base, "out")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("text", StringType()),
        ]
    )
    try:
        for i in range(n_slices):
            _gen_corpus_slice(spark, i).coalesce(1).write.mode(
                "append"
            ).parquet(replay)

        batches: list[dict] = []
        append = corpus_sink.corpus_append_sink(
            out, partition_cols=("lang",), n_shards=CORPUS_SHARDS
        )

        def _process(batch_df, batch_id: int) -> None:
            t0 = time.perf_counter()
            append(batch_df, batch_id)
            append_wall = time.perf_counter() - t0
            fold_wall, folded = 0.0, 0
            if batch_id > 0 and batch_id % FOLD_PERIOD == 0:
                # batch_id-1 and older are committed once this batch
                # runs (sequential execution) — the documented
                # fold_batches contract
                t1 = time.perf_counter()
                folded = corpus_sink.fold_batches(
                    spark, out, upto_batch=batch_id - 1,
                    n_shards=CORPUS_SHARDS, max_gens=FOLD_MAX_GENS,
                )
                fold_wall = time.perf_counter() - t1
            n_files, n_dirs = _count_parquet_files(out)
            batches.append(
                {
                    "batch_id": batch_id,
                    "append_wall_sec": round(append_wall, 3),
                    "folded_sources": folded,
                    "fold_wall_sec": round(fold_wall, 3),
                    "files": n_files,
                    "batch_dirs": n_dirs,
                }
            )

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(replay)
        )
        t_start = time.perf_counter()
        q = (
            stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        while q.isActive:
            q.awaitTermination(10)
        wall = time.perf_counter() - t_start

        out_df = spark.read.parquet(out)
        out_rows = out_df.count()
        out_distinct = out_df.select("doc_id").distinct().count()
        walls = [b["append_wall_sec"] for b in batches]
        quarter = max(1, len(batches) // 4)
        fold_walls = [
            b["fold_wall_sec"] for b in batches if b["folded_sources"]
        ]
        result = {
            "docs": docs,
            "batches": len(batches),
            "wall_sec": round(wall, 2),
            "out_rows": out_rows,
            "exactly_once": out_rows == docs == out_distinct,
            "files_max": max(b["files"] for b in batches),
            "files_final": batches[-1]["files"],
            "batch_dirs_max": max(b["batch_dirs"] for b in batches),
            "folds": len(fold_walls),
            "fold_wall_max_sec": max(fold_walls) if fold_walls else 0.0,
            "fold_wall_total_sec": round(sum(fold_walls), 2),
            "append_wall_p50_first_quarter": round(
                statistics.median(walls[:quarter]), 3
            ),
            "append_wall_p50_last_quarter": round(
                statistics.median(walls[-quarter:]), 3
            ),
            "loadavg_1min_at_end": round(os.getloadavg()[0], 2),
            "per_batch": batches,
        }
        with open(out_json, "w") as f:
            json.dump(result, f)
    finally:
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)


def run_corpus_soak(args) -> int:
    steps = {}
    for label, n in (("small", args.docs_small), ("large", args.docs_large)):
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            step_out = tf.name
        print(f"[{label}] {n} docs (corpus sink) ...", flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--query", "corpus",
             "--single", str(n), "--out", step_out],
            check=True,
        )
        with open(step_out) as f:
            steps[label] = json.load(f)
        os.unlink(step_out)
        summary = {k: v for k, v in steps[label].items() if k != "per_batch"}
        print(f"[{label}] {json.dumps(summary)}", flush=True)

    s, l = steps["small"], steps["large"]
    artifact = {
        "metric": "streaming_soak",
        "query": "file_replay -> corpus append sink (batch=<id> lake "
        f"layout) + tiered in-place fold every {FOLD_PERIOD} batches "
        f"(max_gens={FOLD_MAX_GENS})",
        "docs": [s["docs"], l["docs"]],
        "batches": [s["batches"], l["batches"]],
        "wall_sec": [s["wall_sec"], l["wall_sec"]],
        "exactly_once": [s["exactly_once"], l["exactly_once"]],
        "files_max": [s["files_max"], l["files_max"]],
        "files_final": [s["files_final"], l["files_final"]],
        "batch_dirs_max": [s["batch_dirs_max"], l["batch_dirs_max"]],
        "unfolded_files_would_be": [
            s["batches"] * CORPUS_LANGS * CORPUS_SHARDS,
            l["batches"] * CORPUS_LANGS * CORPUS_SHARDS,
        ],
        "folds": [s["folds"], l["folds"]],
        "fold_wall_max_sec": [s["fold_wall_max_sec"], l["fold_wall_max_sec"]],
        "append_wall_p50": {
            "small_first_q": s["append_wall_p50_first_quarter"],
            "small_last_q": s["append_wall_p50_last_quarter"],
            "large_first_q": l["append_wall_p50_first_quarter"],
            "large_last_q": l["append_wall_p50_last_quarter"],
        },
        "steps": steps,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items() if k != "steps"}))
    return 0


def run_step(events: int, out_json: str, sink: str = "classic") -> None:
    from pyspark.sql import functions as F

    from realtime_data_pipeline_spark.session import get_spark
    from realtime_data_pipeline_spark.streaming.pipeline import (
        EVENT_SCHEMA,
        file_replay_stream,
        windowed_stream_counts,
    )
    from realtime_data_pipeline_spark.streaming.sinks import (
        UpsertTable,
        start_upsert_query,
    )

    n_slices = events // EVENTS_PER_SLICE
    spark = get_spark(
        app_name="rdp-streaming-soak", master="local[8]", shuffle_partitions=8
    )
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "2000")
    base = tempfile.mkdtemp(prefix="rdp_streaming_soak_")
    replay = os.path.join(base, "replay")
    try:
        # One file per slice, written in event-time order so the file
        # source replays them in order and the watermark advances
        # monotonically (FileStreamSource orders by modification time).
        for i in range(n_slices):
            _gen_slice(spark, i).coalesce(1).write.mode(
                "append"
            ).parquet(replay)
        # far-future sentinel slice flushes every real window
        last = T0 + dt.timedelta(seconds=n_slices * SLICE_SECS + 10 * 86400)
        spark.createDataFrame(
            [(SENTINEL, SENTINEL, "flush", last)], schema=EVENT_SCHEMA
        ).coalesce(1).write.mode("append").parquet(replay)

        stream = file_replay_stream(
            spark, replay, EVENT_SCHEMA, max_files_per_trigger=1
        )
        agg = windowed_stream_counts(stream, "user_id")
        # --sink fast: finalized windows emit in watermark order, so
        # window_start is non-decreasing across merges — the exact
        # shape the fast-append high-water mark targets.
        table = UpsertTable(
            spark,
            os.path.join(base, "table"),
            ["window_start", "window_end", "user_id"],
            monotone_col="window_start" if sink == "fast" else None,
        )
        import time

        t_start = time.perf_counter()
        q = start_upsert_query(
            agg, table, os.path.join(base, "ckpt"), "soak", trigger_available_now=True
        )
        while q.isActive:
            q.awaitTermination(10)
        wall = time.perf_counter() - t_start

        prog = [
            json.loads(p if isinstance(p, str) else p.json)
            for p in q.recentProgress
        ]
        batches = [
            {
                "batch_id": p["batchId"],
                "input_rows": p["numInputRows"],
                "trigger_ms": p["durationMs"].get("triggerExecution", 0),
                "add_batch_ms": p["durationMs"].get("addBatch", 0),
                "state_rows": sum(
                    s["numRowsTotal"] for s in p.get("stateOperators", [])
                ),
            }
            for p in prog
            if p["numInputRows"] > 0
        ]

        # batch parity at volume: upsert table == batch engine's counts
        got = (
            table.read()
            .where(F.col("user_id") != SENTINEL)
            .groupBy()
            .agg(
                F.count("*").alias("rows"),
                F.sum("total_interactions").alias("events"),
            )
            .collect()[0]
        )
        all_events = spark.read.parquet(replay).where(
            F.col("user_id") != SENTINEL
        )
        want = (
            windowed_stream_counts(all_events, "user_id", watermark=None)
            .groupBy()
            .agg(
                F.count("*").alias("rows"),
                F.sum("total_interactions").alias("events"),
            )
            .collect()[0]
        )

        state_rows = [b["state_rows"] for b in batches]
        trig = [b["trigger_ms"] for b in batches]
        addb = [b["add_batch_ms"] for b in batches]
        quarter = max(1, len(batches) // 4)
        result = {
            "events": events,
            "batches": len(batches),
            "wall_sec": round(wall, 2),
            "rows_out": int(got["rows"]),
            # each event lands in window/slide = 2 sliding windows, so
            # the weighted sum is 2x the event count — compare the
            # stream result to the BATCH engine on both aggregates
            "batch_parity": (
                int(got["rows"]) == int(want["rows"])
                and int(got["events"]) == int(want["events"]) == 2 * events
            ),
            "loadavg_1min_at_end": round(os.getloadavg()[0], 2),
            "state_rows_max": max(state_rows),
            "state_rows_p50": int(statistics.median(state_rows)),
            "trigger_ms_p50_first_quarter": int(
                statistics.median(trig[:quarter])
            ),
            "trigger_ms_p50_last_quarter": int(
                statistics.median(trig[-quarter:])
            ),
            "add_batch_ms_p50_first_quarter": int(
                statistics.median(addb[:quarter])
            ),
            "add_batch_ms_p50_last_quarter": int(
                statistics.median(addb[-quarter:])
            ),
            "per_batch": batches,
        }
        with open(out_json, "w") as f:
            json.dump(result, f)
    finally:
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)


def run_dedup_soak(args) -> int:
    steps = {}
    for label, n in (("small", args.docs_small), ("large", args.docs_large)):
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            step_out = tf.name
        print(f"[{label}] {n} docs ...", flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--query", "dedup",
             "--single", str(n), "--out", step_out],
            check=True,
        )
        with open(step_out) as f:
            steps[label] = json.load(f)
        os.unlink(step_out)
        summary = {k: v for k, v in steps[label].items() if k != "per_batch"}
        print(f"[{label}] {json.dumps(summary)}", flush=True)

    s, l = steps["small"], steps["large"]
    artifact = {
        "metric": "streaming_soak",
        "query": "file_replay -> incremental minhash-LSH dedup "
        "(persistent signature store + per-10-batch compaction)",
        "docs": [s["docs"], l["docs"]],
        "batches": [s["batches"], l["batches"]],
        "wall_sec": [s["wall_sec"], l["wall_sec"]],
        "store_bytes_final": [s["store_bytes_final"], l["store_bytes_final"]],
        "store_bytes_ratio": round(
            l["store_bytes_final"] / max(1, s["store_bytes_final"]), 2
        ),
        "store_dirs_max": [s["store_dirs_max"], l["store_dirs_max"]],
        "batch_wall_p50": {
            "small_first_q": s["batch_wall_p50_first_quarter"],
            "small_last_q": s["batch_wall_p50_last_quarter"],
            "large_first_q": l["batch_wall_p50_first_quarter"],
            "large_last_q": l["batch_wall_p50_last_quarter"],
        },
        "planted_dups": [s["planted_dups"], l["planted_dups"]],
        "planted_dups_surviving": [
            s["planted_dups_surviving"], l["planted_dups_surviving"]
        ],
        "false_drops_of_unique": [
            s["false_drops_of_unique"], l["false_drops_of_unique"]
        ],
        "steps": steps,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items() if k != "steps"}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", default=None, help="event count (worker mode)")
    ap.add_argument(
        "--query", choices=("window", "dedup", "corpus"), default="window"
    )
    ap.add_argument("--events-small", type=int, default=100_000)
    ap.add_argument("--events-large", type=int, default=1_000_000)
    ap.add_argument("--docs-small", type=int, default=50_000)
    ap.add_argument("--docs-large", type=int, default=500_000)
    ap.add_argument(
        "--sink", choices=("classic", "fast"), default="classic",
        help="window query's upsert sink: classic bucket rewrites, or "
        "fast-append (monotone_col=window_start)",
    )
    ap.add_argument("--out", default="SOAK_streaming.json")
    args = ap.parse_args()

    if args.single:
        if args.query == "dedup":
            run_dedup_step(int(args.single), args.out)
        elif args.query == "corpus":
            run_corpus_step(int(args.single), args.out)
        else:
            run_step(int(args.single), args.out, sink=args.sink)
        return 0

    if args.query == "dedup":
        return run_dedup_soak(args)
    if args.query == "corpus":
        return run_corpus_soak(args)

    steps = {}
    for label, n in (("small", args.events_small), ("large", args.events_large)):
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            step_out = tf.name
        print(f"[{label}] {n} events ({args.sink} sink) ...", flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", str(n),
             "--sink", args.sink, "--out", step_out],
            check=True,
        )
        with open(step_out) as f:
            steps[label] = json.load(f)
        os.unlink(step_out)
        summary = {k: v for k, v in steps[label].items() if k != "per_batch"}
        print(f"[{label}] {json.dumps(summary)}", flush=True)

    s, l = steps["small"], steps["large"]
    artifact = {
        "metric": "streaming_soak",
        "query": "file_replay -> watermark -> sliding window -> keyed upsert",
        "sink": args.sink,
        "events": [s["events"], l["events"]],
        "batches": [s["batches"], l["batches"]],
        "wall_sec": [s["wall_sec"], l["wall_sec"]],
        "state_rows_max": [s["state_rows_max"], l["state_rows_max"]],
        "state_bound_ratio": round(
            l["state_rows_max"] / max(1, s["state_rows_max"]), 3
        ),
        "trigger_ms_p50": {
            "small_first_q": s["trigger_ms_p50_first_quarter"],
            "small_last_q": s["trigger_ms_p50_last_quarter"],
            "large_first_q": l["trigger_ms_p50_first_quarter"],
            "large_last_q": l["trigger_ms_p50_last_quarter"],
        },
        "add_batch_ms_p50": {
            "small_first_q": s["add_batch_ms_p50_first_quarter"],
            "small_last_q": s["add_batch_ms_p50_last_quarter"],
            "large_first_q": l["add_batch_ms_p50_first_quarter"],
            "large_last_q": l["add_batch_ms_p50_last_quarter"],
        },
        "batch_parity": [s["batch_parity"], l["batch_parity"]],
        "rows_out": [s["rows_out"], l["rows_out"]],
        "steps": steps,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items() if k != "steps"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
