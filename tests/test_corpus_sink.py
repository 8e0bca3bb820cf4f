"""Streaming corpus-append sink (streaming/corpus_sink.py): exactly-
once materialization into the partitioned lake layout.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from realtime_data_pipeline_spark.streaming.corpus_sink import (
    corpus_append_sink,
    read_corpus_stream_output,
    start_corpus_append_query,
)
from realtime_data_pipeline_spark.tables import load_table

from conftest import SF_DIR

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture()
def replayed(spark, tmp_path):
    """documents replayed through the streaming sink in 2 micro-batches."""
    import time

    docs = load_table(spark, SF_DIR, "documents")
    replay = str(tmp_path / "replay")
    half = docs.where(F.col("doc_id") % 2 == 0)
    half.coalesce(1).write.mode("overwrite").parquet(replay)
    time.sleep(1.1)  # distinct mtime → second file, second batch
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(replay)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    out = str(tmp_path / "corpus")
    q = start_corpus_append_query(
        stream, out, str(tmp_path / "ckpt"), "corpus_append",
        n_shards=4, trigger_available_now=True,
    )
    q.awaitTermination(180)
    return docs, out


def test_every_doc_lands_exactly_once(spark, replayed):
    docs, out = replayed
    got = read_corpus_stream_output(spark, out)
    assert got.count() == docs.count()
    assert got.select("doc_id").distinct().count() == docs.count()
    # content round-trips
    want = {(r.doc_id, r.text) for r in docs.collect()}
    have = {(r.doc_id, r.text) for r in got.select("doc_id", "text").collect()}
    assert have == want


def test_partition_pruning_survives_batch_level(spark, replayed):
    _, out = replayed
    q = read_corpus_stream_output(spark, out).where(F.col("lang") == "en")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan[:1500]


def test_batch_replay_is_idempotent(spark, replayed):
    """Re-delivering a batch id rewrites its subtree instead of
    duplicating documents (the crash-replay contract)."""
    docs, out = replayed
    sink = corpus_append_sink(out, n_shards=4)
    before = read_corpus_stream_output(spark, out).count()
    sink(load_table(spark, SF_DIR, "documents").where(F.col("doc_id") % 2 == 0), 0)
    after = read_corpus_stream_output(spark, out).count()
    assert after == before


def test_compaction_consolidates_without_loss(spark, replayed):
    import os

    from realtime_data_pipeline_spark.streaming.corpus_sink import compact_corpus

    docs, out = replayed
    compacted = out + "_compacted"
    compact_corpus(spark, out, compacted, n_shards=4)

    got = spark.read.parquet(compacted)
    assert got.count() == docs.count()
    assert got.select("doc_id").distinct().count() == docs.count()

    def _parts(root):
        return sum(
            1
            for r, _, fs in os.walk(root)
            for f in fs
            if f.startswith("part-") and f.endswith(".parquet")
        )

    # O(batches x shards) fragments fold into O(shards) files
    assert _parts(compacted) < _parts(out)
    # pruning layout intact (no batch level anymore)
    q = got.where(F.col("lang") == "en")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan[:1500]
