"""Streaming → corpus-layout materialization: append micro-batches of
curated documents into the partitioned + sharded + key-sorted lake
layout (`operators/writer.write_corpus`), idempotently.

Complements the keyed-upsert sink: `UpsertTable` maintains MUTABLE
aggregate state (last write wins per key); this sink materializes an
APPEND-ONLY corpus — each document lands exactly once, already laid
out for the 100 TB read side (partition pruning on lang/source, shard
dirs for bounded file counts, key-sorted row groups).

Idempotence: each micro-batch writes to its own `batch=<id>/` subtree
with overwrite semantics, so a checkpoint replay of batch N rewrites
`batch=N/` byte-for-byte instead of duplicating documents — the same
batch-keyed-overwrite contract as `streaming/incremental_dedup.py`.
The `batch` directory level is just another partition column to the
reader; filters on `lang`/`source` still prune directories underneath
it (asserted by tests/test_corpus_sink.py on PartitionFilters).

At scale the batch= level is ALSO what makes retention cheap: expiring
old data is `rm -r batch=<k>` for committed batch ranges — no rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from realtime_data_pipeline_spark.operators import writer


def corpus_append_sink(
    out_dir: str,
    partition_cols: tuple[str, ...] = ("lang",),
    key: str = "doc_id",
    n_shards: int = writer.DEFAULT_SHARDS,
):
    """foreachBatch hook: write each micro-batch into
    `<out_dir>/batch=<id>/` in the corpus layout (overwrite → replay-
    idempotent)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        writer.write_corpus(
            batch_df,
            f"{out_dir}/batch={batch_id}",
            partition_cols=partition_cols,
            key=key,
            n_shards=n_shards,
        )

    return _sink


def start_corpus_append_query(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str,
    partition_cols: tuple[str, ...] = ("lang",),
    key: str = "doc_id",
    n_shards: int = writer.DEFAULT_SHARDS,
    trigger_available_now: bool = False,
):
    wtr = (
        docs_stream.writeStream.outputMode("append")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            corpus_append_sink(out_dir, partition_cols, key, n_shards)
        )
    )
    if trigger_available_now:
        wtr = wtr.trigger(availableNow=True)
    return wtr.start()


def read_corpus_stream_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the materialized corpus back; `batch` appears as one more
    partition column and lang/source filters still prune directories."""
    return spark.read.parquet(out_dir)


def compact_corpus(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    partition_cols: tuple[str, ...] = ("lang",),
    key: str = "doc_id",
    n_shards: int = writer.DEFAULT_SHARDS,
) -> None:
    """Maintenance: fold the streaming output's `batch=<id>/` subtrees
    into one consolidated corpus layout (no batch level).

    Streaming appends optimize for ingest latency and replay safety;
    the read side wants few, large, key-sorted files.  Compaction is
    the standard background job that converts one into the other:
    read everything (the batch column is dropped), re-shard, rewrite —
    the same single-shuffle write as `write_corpus`, so file count
    drops from O(batches x shards) to O(shards) and row-group key
    sorting is restored across what were per-batch fragments.  At
    100 TB this runs per partition (e.g. per lang, or per day dir)
    rather than whole-corpus — the input path IS the unit of work.
    """
    docs = spark.read.parquet(in_dir).drop("batch", "shard")
    writer.write_corpus(
        docs,
        out_dir,
        partition_cols=partition_cols,
        key=key,
        n_shards=n_shards,
    )
